package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the embedding-model operators.
  *
  * The HOF composition (`aggregate(zip_with(...))`) these replace is
  * CodegenFallback — interpreted per element with a lambda frame and an
  * array allocation per row — which is the dominant constant factor in
  * the PQ/k-means assignment scans at scale. Each kernel here generates
  * one tight primitive loop inside whole-stage codegen, with semantics
  * (accumulation order, integer arithmetic, tie-breaks) IDENTICAL to
  * the HOF form so every oracle and replay spec is unaffected.
  *
  * Element domains: `long` (the cross-engine integer-grid discipline —
  * accumulation stays integer) and `float`/`double` (read as double).
  * Result element type is long iff BOTH inputs are long arrays.
  */
object VectorKernels {

  private def elemKind(t: DataType): Option[DataType] = t match {
    case ArrayType(LongType, _) => Some(LongType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(FloatType, _) => Some(FloatType)
    case _ => None
  }

  private def accType(l: DataType, r: DataType): DataType =
    if (l == LongType && r == LongType) LongType else DoubleType

  /** Shared scaffolding for the two scalar fold kernels. */
  abstract class PairFold extends BinaryExpression {
    /** java source for one step given element variables x, y, acc. */
    protected def stepJava(x: String, y: String, acc: String): String
    protected def stepEval(x: Double, y: Double): Double
    protected def stepEvalL(x: Long, y: Long): Long

    override def dataType: DataType =
      accType(
        elemKind(left.dataType).getOrElse(NullType),
        elemKind(right.dataType).getOrElse(NullType))

    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      (elemKind(left.dataType), elemKind(right.dataType)) match {
        case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
        case _ =>
          TypeCheckResult.TypeCheckFailure(
            s"${prettyName} expects array<long|float|double> inputs, got " +
              s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
      }

    private def isLong = dataType == LongType

    private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
      case LongType => a.getLong(i).toDouble
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      val lt = elemKind(left.dataType).get
      val rt = elemKind(right.dataType).get
      var i = 0
      if (isLong) {
        var acc = 0L
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          acc += stepEvalL(x.getLong(i), y.getLong(i))
          i += 1
        }
        acc
      } else {
        var acc = 0.0
        while (i < n) {
          if (x.isNullAt(i) || y.isNullAt(i)) return null
          acc += stepEval(get(x, i, lt), get(y, i, rt))
          i += 1
        }
        acc
      }
    }

    private def getJava(arr: String, i: String, t: DataType): String = t match {
      case LongType => s"$arr.getLong($i)"
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val jt = if (isLong) "long" else "double"
        val lt = elemKind(left.dataType).get
        val rt = elemKind(right.dataType).get
        val lGet = if (isLong) s"$x.getLong($i)" else getJava(x, i, lt)
        val rGet = if (isLong) s"$y.getLong($i)" else getJava(y, i, rt)
        s"""
           |int $n = $x.numElements();
           |if ($y.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  $jt $acc = 0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $jt $xv = $lGet;
           |    $jt $yv = $rGet;
           |    ${stepJava(xv, yv, acc)}
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $acc; }
           |}
         """.stripMargin
      })
  }

  /** Σ (x−y)² with integer accumulation on long inputs. */
  case class L2Squared(left: Expression, right: Expression) extends PairFold {
    override def prettyName: String = "l2_squared"
    protected def stepJava(x: String, y: String, acc: String): String =
      s"$acc += ($x - $y) * ($x - $y);"
    protected def stepEval(x: Double, y: Double): Double = (x - y) * (x - y)
    protected def stepEvalL(x: Long, y: Long): Long = (x - y) * (x - y)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Σ x·y with integer accumulation on long inputs. */
  case class DotProduct(left: Expression, right: Expression) extends PairFold {
    override def prettyName: String = "dot_product"
    protected def stepJava(x: String, y: String, acc: String): String =
      s"$acc += $x * $y;"
    protected def stepEval(x: Double, y: Double): Double = x * y
    protected def stepEvalL(x: Long, y: Long): Long = x * y
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** PQ assignment kernel: given a subvector and a packed codebook
    * (array of struct(cell: long, c: array<T>) rows, any order),
    * returns struct(d2: T, cell: long) of the nearest entry, with the
    * SMALLEST cell id winning equal-d2 ties — tracked explicitly
    * (`d2 < best || (d2 == best && cell < bestCell)`), so correctness
    * does not depend on the caller pre-sorting the codebook array. The
    * result order matches `ORDER BY d2, cell` / `min(struct(d2, cell))`,
    * so replacing either form preserves every oracle. Null on length
    * mismatch, null elements, or an empty codebook.
    */
  case class PqArgmin(left: Expression, right: Expression) extends BinaryExpression {
    override def prettyName: String = "pq_argmin"

    private def elem: DataType = elemKind(left.dataType).getOrElse(NullType)
    private def isLong = elem == LongType

    override def dataType: DataType = StructType(Seq(
      StructField("d2", if (isLong) LongType else DoubleType),
      StructField("cell", LongType)))

    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = {
      val okL = elemKind(left.dataType).isDefined
      val okR = right.dataType match {
        case ArrayType(StructType(Array(f0, f1)), _) =>
          f0.dataType == LongType &&
            elemKind(f1.dataType).contains(elemKind(left.dataType).getOrElse(NullType))
        case _ => false
      }
      if (okL && okR) TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"pq_argmin expects (array<T>, array<struct<long, array<T>>>) with matching T, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

    private def get(a: ArrayData, i: Int): Double = elem match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val sq = a.asInstanceOf[ArrayData]
      val cbs = b.asInstanceOf[ArrayData]
      val n = sq.numElements()
      val k = cbs.numElements()
      if (k == 0) return null
      var bestCell = 0L
      var found = false
      if (isLong) {
        var bestD2 = Long.MaxValue
        var j = 0
        while (j < k) {
          if (cbs.isNullAt(j)) return null
          val e = cbs.getStruct(j, 2)
          // a null FIELD inside the struct is a null element too: an
          // unchecked e.getArray(1) NPEs the task on a null codebook
          // vector, and e.getLong(0) silently reads a null cell as 0
          if (e.isNullAt(0) || e.isNullAt(1)) return null
          val c = e.getArray(1)
          if (c.numElements() != n) return null
          var d2 = 0L; var i = 0
          while (i < n) {
            if (sq.isNullAt(i) || c.isNullAt(i)) return null
            val dx = sq.getLong(i) - c.getLong(i)
            d2 += dx * dx; i += 1
          }
          val cell = e.getLong(0)
          if (!found || d2 < bestD2 || (d2 == bestD2 && cell < bestCell)) {
            found = true; bestD2 = d2; bestCell = cell
          }
          j += 1
        }
        new GenericInternalRow(Array[Any](bestD2, bestCell))
      } else {
        var bestD2 = Double.MaxValue
        var j = 0
        while (j < k) {
          if (cbs.isNullAt(j)) return null
          val e = cbs.getStruct(j, 2)
          // a null FIELD inside the struct is a null element too: an
          // unchecked e.getArray(1) NPEs the task on a null codebook
          // vector, and e.getLong(0) silently reads a null cell as 0
          if (e.isNullAt(0) || e.isNullAt(1)) return null
          val c = e.getArray(1)
          if (c.numElements() != n) return null
          var d2 = 0.0; var i = 0
          while (i < n) {
            if (sq.isNullAt(i) || c.isNullAt(i)) return null
            val dx = get(sq, i) - get(c, i)
            d2 += dx * dx; i += 1
          }
          val cell = e.getLong(0)
          if (!found || d2 < bestD2 || (d2 == bestD2 && cell < bestCell)) {
            found = true; bestD2 = d2; bestCell = cell
          }
          j += 1
        }
        new GenericInternalRow(Array[Any](bestD2, bestCell))
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val k = ctx.freshName("k")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val e = ctx.freshName("entry")
        val c = ctx.freshName("cvec")
        val d2 = ctx.freshName("d2")
        val dx = ctx.freshName("dx")
        val bestD2 = ctx.freshName("bestD2")
        val bestCell = ctx.freshName("bestCell")
        val found = ctx.freshName("found")
        val jt = if (isLong) "long" else "double"
        val maxV = if (isLong) "Long.MAX_VALUE" else "Double.MAX_VALUE"
        val sqGet = elem match {
          case LongType => s"$x.getLong($i)"
          case FloatType => s"(double) $x.getFloat($i)"
          case _ => s"$x.getDouble($i)"
        }
        val cGet = elem match {
          case LongType => s"$c.getLong($i)"
          case FloatType => s"(double) $c.getFloat($i)"
          case _ => s"$c.getDouble($i)"
        }
        s"""
           |int $n = $x.numElements();
           |int $k = $y.numElements();
           |if ($k == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  $jt $bestD2 = $maxV;
           |  long $bestCell = 0L;
           |  boolean $found = false;
           |  for (int $j = 0; $j < $k && !${ev.isNull}; $j++) {
           |    if ($y.isNullAt($j)) { ${ev.isNull} = true; break; }
           |    org.apache.spark.sql.catalyst.InternalRow $e = $y.getStruct($j, 2);
           |    if ($e.isNullAt(0) || $e.isNullAt(1)) { ${ev.isNull} = true; break; }
           |    org.apache.spark.sql.catalyst.util.ArrayData $c = $e.getArray(1);
           |    if ($c.numElements() != $n) { ${ev.isNull} = true; break; }
           |    $jt $d2 = 0;
           |    for (int $i = 0; $i < $n; $i++) {
           |      if ($x.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
           |      $jt $dx = $sqGet - $cGet;
           |      $d2 += $dx * $dx;
           |    }
           |    if (!${ev.isNull} && (!$found || $d2 < $bestD2 ||
           |        ($d2 == $bestD2 && $e.getLong(0) < $bestCell))) {
           |      $found = true; $bestD2 = $d2; $bestCell = $e.getLong(0);
           |    }
           |  }
           |  if (!${ev.isNull}) {
           |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
           |      new Object[] { $bestD2, $bestCell });
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** IVF assignment kernel: given a vector and a packed centroid table
    * (array of struct(cid: long, cemb: array<float|double>) rows, any
    * order), returns the cid of the HIGHEST-cosine entry — replicating
    * `max(struct(cosine_sim(emb, cemb), cid)).getField("cid")` ordering
    * bit for bit: per-entry cosine uses [[CosineSimilarity]]'s exact
    * accumulation (double, dims left-to-right, zero-norm pinned 0.0),
    * doubles compare like Spark's struct ordering (java.lang.Double
    * .compare: NaN greatest, −0.0 < +0.0), a NULL cosine (length
    * mismatch / null element) ranks below every non-null one, and
    * ties take the LARGER cid. Replaces the crossJoin(k centroids) +
    * groupBy(vec_id) argmax whose struct-typed buffer forces
    * SortAggregate — a k-fold row explosion, two corpus sorts and a
    * corpus-wide exchange per assignment pass. Null on null input or
    * an empty/null-element centroid table (a k-row model table with a
    * null row is constructed, never data).
    */
  case class CosArgmaxCid(left: Expression, right: Expression) extends BinaryExpression {
    override def prettyName: String = "cos_argmax_cid"

    private def elem: DataType = elemKind(left.dataType).getOrElse(NullType)

    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = {
      val okL = elem == DoubleType || elem == FloatType
      val okR = right.dataType match {
        case ArrayType(StructType(Array(f0, f1)), _) =>
          f0.dataType == LongType &&
            (elemKind(f1.dataType).contains(DoubleType) ||
              elemKind(f1.dataType).contains(FloatType))
        case _ => false
      }
      if (okL && okR) TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"cos_argmax_cid expects (array<float|double>, array<struct<long, array<float|double>>>), got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

    private def centElem: DataType = right.dataType match {
      case ArrayType(StructType(Array(_, f1)), _) => elemKind(f1.dataType).getOrElse(NullType)
      case _ => NullType
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val q = a.asInstanceOf[ArrayData]
      val cbs = b.asInstanceOf[ArrayData]
      val k = cbs.numElements()
      if (k == 0) return null
      val n = q.numElements()
      val qf = elem == FloatType
      val cf = centElem == FloatType
      var found = false
      var bestNull = true
      var bestSim = 0.0
      var bestCid = 0L
      var j = 0
      while (j < k) {
        if (cbs.isNullAt(j)) return null
        val e = cbs.getStruct(j, 2)
        if (e.isNullAt(0)) return null
        val cid = e.getLong(0)
        // csim of this entry under CosineSimilarity's exact rules;
        // simNull stands for the SQL NULL the expression would return
        var simNull = e.isNullAt(1)
        var sim = 0.0
        if (!simNull) {
          val c = e.getArray(1)
          if (c.numElements() != n) simNull = true
          else {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < n && !simNull) {
              if (q.isNullAt(i) || c.isNullAt(i)) simNull = true
              else {
                val xv = if (qf) q.getFloat(i).toDouble else q.getDouble(i)
                val yv = if (cf) c.getFloat(i).toDouble else c.getDouble(i)
                dot += xv * yv; na += xv * xv; nb += yv * yv
              }
              i += 1
            }
            if (!simNull) {
              val denom = math.sqrt(na) * math.sqrt(nb)
              sim = if (denom == 0.0) 0.0 else dot / denom
            }
          }
        }
        val better =
          if (!found) true
          else if (simNull != bestNull) bestNull // non-null beats null
          else if (simNull) cid > bestCid
          else {
            val cmp = java.lang.Double.compare(sim, bestSim)
            cmp > 0 || (cmp == 0 && cid > bestCid)
          }
        if (better) { found = true; bestNull = simNull; bestSim = sim; bestCid = cid }
        j += 1
      }
      bestCid
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val k = ctx.freshName("k")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val e = ctx.freshName("entry")
        val c = ctx.freshName("cvec")
        val cid = ctx.freshName("cid")
        val sim = ctx.freshName("sim")
        val simNull = ctx.freshName("simNull")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val denom = ctx.freshName("denom")
        val cmp = ctx.freshName("cmp")
        val better = ctx.freshName("better")
        val found = ctx.freshName("found")
        val bestNull = ctx.freshName("bestNull")
        val bestSim = ctx.freshName("bestSim")
        val bestCid = ctx.freshName("bestCid")
        val qGet = if (elem == FloatType) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
        val cGet = if (centElem == FloatType) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"
        s"""
           |int $n = $x.numElements();
           |int $k = $y.numElements();
           |if ($k == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  boolean $found = false;
           |  boolean $bestNull = true;
           |  double $bestSim = 0.0;
           |  long $bestCid = 0L;
           |  for (int $j = 0; $j < $k && !${ev.isNull}; $j++) {
           |    if ($y.isNullAt($j)) { ${ev.isNull} = true; break; }
           |    org.apache.spark.sql.catalyst.InternalRow $e = $y.getStruct($j, 2);
           |    if ($e.isNullAt(0)) { ${ev.isNull} = true; break; }
           |    long $cid = $e.getLong(0);
           |    boolean $simNull = $e.isNullAt(1);
           |    double $sim = 0.0;
           |    if (!$simNull) {
           |      org.apache.spark.sql.catalyst.util.ArrayData $c = $e.getArray(1);
           |      if ($c.numElements() != $n) { $simNull = true; } else {
           |        double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |        for (int $i = 0; $i < $n && !$simNull; $i++) {
           |          if ($x.isNullAt($i) || $c.isNullAt($i)) { $simNull = true; break; }
           |          double ${dot}x = $qGet;
           |          double ${dot}y = $cGet;
           |          $dot += ${dot}x * ${dot}y; $na += ${dot}x * ${dot}x; $nb += ${dot}y * ${dot}y;
           |        }
           |        if (!$simNull) {
           |          double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |          $sim = $denom == 0.0 ? 0.0 : $dot / $denom;
           |        }
           |      }
           |    }
           |    boolean $better;
           |    if (!$found) { $better = true; }
           |    else if ($simNull != $bestNull) { $better = $bestNull; }
           |    else if ($simNull) { $better = $cid > $bestCid; }
           |    else {
           |      int $cmp = java.lang.Double.compare($sim, $bestSim);
           |      $better = $cmp > 0 || ($cmp == 0 && $cid > $bestCid);
           |    }
           |    if ($better) { $found = true; $bestNull = $simNull; $bestSim = $sim; $bestCid = $cid; }
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $bestCid; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Squared(Bridge.expression(a), Bridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def pqArgmin(sq: Column, cbs: Column): Column =
    Bridge.column(PqArgmin(Bridge.expression(sq), Bridge.expression(cbs)))

  def cosArgmaxCid(emb: Column, cbs: Column): Column =
    Bridge.column(CosArgmaxCid(Bridge.expression(emb), Bridge.expression(cbs)))
}

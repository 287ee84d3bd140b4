package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst wrappers over the [[TextKernels]] JVM kernels, making the
  * dedup signature primitives a real SQL surface (registered by
  * [[graft.plans.GraftExtensions]]) instead of mapPartitions-only
  * internals. Each wrapper's codegen emits ONE static call into the
  * already-JIT-compiled kernel — the tight loop lives in the kernel
  * method, the expression stays inside the whole-stage codegen span,
  * and SQL-path results are bit-identical to the kernel-pipeline
  * results by construction (asserted by GraftSqlSpec).
  */
object TextExprs {

  /** `simhash64(text)`: the 64-bit SimHash signature of
    * [[TextKernels.simhashSig]] — xxhash64'd regex tokens,
    * majority-vote bits. The dedup_simhash pipeline computes exactly
    * this per document.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def prettyName: String = "simhash64"
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects a string column, got ${child.dataType.catalogString}")

    override def nullSafeEval(input: Any): Any =
      TextKernels.simhashSig(input.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextKernels.simhashSig($c.toString())")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `minhash_band(text, rows_per_band)`: the coarse LSH bucket of a
    * document — band 0 of its MinHash signature over word-5-shingles
    * ([[TextKernels.docBandKey]]). NULL for docs too short to shingle
    * (the same rows the kernel pipeline drops). `rows_per_band` must be
    * a foldable positive integer.
    */
  case class MinhashBand(left: Expression, right: Expression)
      extends BinaryExpression {
    override def prettyName: String = "minhash_band"
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"minhash_band expects (string, int), got ${left.dataType.catalogString}")
      else if (right.dataType != IntegerType || !right.foldable)
        TypeCheckResult.TypeCheckFailure(
          "minhash_band: rows_per_band must be a foldable integer literal")
      else {
        val r = right.eval(null)
        if (r == null || r.asInstanceOf[Int] <= 0)
          TypeCheckResult.TypeCheckFailure("minhash_band: rows_per_band must be > 0")
        else TypeCheckResult.TypeCheckSuccess
      }

    override def nullSafeEval(text: Any, rpb: Any): Any =
      TextKernels.docBandKeyBoxed(
        text.asInstanceOf[UTF8String].toString, ShingleWidth, rpb.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, r) => {
        val res = ctx.freshName("bandKey")
        s"""
           |java.lang.Long $res = graft.functions.TextKernels.docBandKeyBoxed(
           |  $t.toString(), ${ShingleWidth}, $r);
           |if ($res == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $res.longValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Word-shingle width used by the SQL surface — the SAME constant the
    * dedup pipelines shingle with, so SQL-path bands can never drift
    * from kernel-pipeline bands if the width is ever tuned.
    */
  val ShingleWidth: Int = graft.operators.LlmOps.ShingleK

  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  def minhashBand(text: Column, rowsPerBand: Column): Column =
    Bridge.column(MinhashBand(Bridge.expression(text), Bridge.expression(rowsPerBand)))
}

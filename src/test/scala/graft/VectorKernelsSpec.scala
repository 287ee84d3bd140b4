package graft

import graft.functions.VectorKernels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native vector kernels must be bit-identical to the HOF forms
  * they replace (aggregate/zip_with folds), across both element
  * domains, including the argmin tie-break and null/mismatch edges.
  */
class VectorKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("l2sq / dot equal the HOF folds on random long and double arrays") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextInt(2000001).toLong - 1000000L),
        Array.fill(64)(rnd.nextInt(2000001).toLong - 1000000L),
        Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "al", "bl", "ad", "bd")
    val out = df.select(
      VectorKernels.l2sq(col("al"), col("bl")).as("l2l"),
      aggregate(zip_with(col("al"), col("bl"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x).as("l2l_hof"),
      VectorKernels.dot(col("al"), col("bl")).as("dotl"),
      aggregate(zip_with(col("al"), col("bl"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).as("dotl_hof"),
      VectorKernels.l2sq(col("ad"), col("bd")).as("l2d"),
      aggregate(zip_with(col("ad"), col("bd"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("l2d_hof"),
      VectorKernels.dot(col("ad"), col("bd")).as("dotd"),
      aggregate(zip_with(col("ad"), col("bd"), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x).as("dotd_hof")
    ).as[(Long, Long, Long, Long, Double, Double, Double, Double)].collect()
    out.foreach { case (l2l, l2lH, dl, dlH, l2d, l2dH, dd, ddH) =>
      assert(l2l == l2lH); assert(dl == dlH)
      // double folds accumulate left-to-right in both forms: bit-equal
      assert(l2d == l2dH); assert(dd == ddH)
    }
  }

  test("pqArgmin equals sorted-fold argmin with the d2,cell tie-break; codegen'd plan") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    val k = 16
    // coarse value grid (multiples of 100) forces frequent exact d2
    // ties, exercising the smallest-cell tie-break for real
    val cb = Seq.tabulate(k)(c =>
      ((c + 1).toLong, Array.fill(8)(rnd.nextInt(5).toLong * 100)))
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, Array.fill(8)(rnd.nextInt(5).toLong * 100))
    }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(j => (a(j) - b(j)) * (a(j) - b(j))).sum
    val expect = rows.map { case (id, sq) =>
      val (cell, dd) = cb.map { case (c, cv) => (c, d2(sq, cv)) }
        .minBy { case (c, dist) => (dist, c) }
      id -> ((dd, cell))
    }.toMap
    val cbDf = cb.toDF("cell", "c")
      .groupBy(lit(1).as("one"))
      .agg(sort_array(collect_list(struct(col("cell"), col("c")))).as("cbs"))
    val q = rows.toDF("id", "sq")
      .crossJoin(broadcast(cbDf))
      .select(col("id"), VectorKernels.pqArgmin(col("sq"), col("cbs")).as("best"))
    val qq = q.select(col("id"), col("best.d2"), col("best.cell"))
    val got = qq.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // kernel must run inside whole-stage codegen, not as a fallback:
    // in the AQE-final plan a codegen'd stage prints as "*(n) Project"
    // — the pq_argmin projection must carry the star
    val plan = qq.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[[^\n]*pq_argmin""".r.findFirstIn(plan).isDefined, plan)
    got.foreach { case (id, dd, cell) =>
      assert((dd, cell) == expect(id), s"row $id: ($dd,$cell) vs ${expect(id)}")
    }
  }

  test("cosArgmaxCid equals max(struct(cosine_sim, cid)) incl. ties, zero vectors, NaN") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(13)
    val k = 8
    // coarse components force exact cosine ties between distinct
    // centroids (e.g. colinear vectors), exercising the max-cid
    // tie-break; a zero centroid exercises the 0.0 pin; a NaN
    // component exercises Spark's NaN-greatest double ordering
    def vec(): Array[Double] = Array.fill(6)(rnd.nextInt(3).toDouble - 1.0)
    val cents = Seq.tabulate(k) { c =>
      val v = if (c == 3) Array.fill(6)(0.0) else vec()
      ((c + 1).toLong, v)
    }
    val rows = Seq.tabulate(400) { i =>
      val v = vec()
      if (i == 7) v(0) = Double.NaN // NaN emb: csim NaN vs every centroid
      (i.toLong, v)
    }
    val centsDf = cents.toDF("cid", "cemb")
    // reference: the former crossJoin + max(struct(csim, cid)) plan
    val expect = rows.toDF("vec_id", "emb")
      .crossJoin(broadcast(centsDf))
      .withColumn("csim",
        graft.functions.CosineSimilarity.cosineSim(col("emb"), col("cemb")))
      .groupBy("vec_id")
      .agg(max(struct(col("csim"), col("cid"))).getField("cid").as("cluster"))
      .as[(Long, Long)].collect().toMap
    val packed = centsDf
      .agg(sort_array(collect_list(struct(col("cid"), col("cemb")))).as("cbs"))
    val gotDf = rows.toDF("vec_id", "emb")
      .crossJoin(broadcast(packed))
      .select(col("vec_id"),
        VectorKernels.cosArgmaxCid(col("emb"), col("cbs")).as("cluster"))
    val got = gotDf.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // must run inside whole-stage codegen, not as a fallback (read the
    // AQE-FINAL plan, after execution)
    val plan = gotDf.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[[^\n]*cos_argmax_cid""".r.findFirstIn(plan).isDefined, plan)
    assert(got.size == expect.size)
    expect.foreach { case (id, cl) =>
      assert(got(id) == cl, s"vec $id: kernel ${got(id)} vs struct-max $cl")
    }
    // empty centroid table -> NULL, matching "no assignment"
    val empty = rows.take(1).toDF("vec_id", "emb")
      .select(VectorKernels.cosArgmaxCid(
        col("emb"),
        array().cast("array<struct<cid:bigint,cemb:array<double>>>")).as("c"))
      .collect()
    assert(empty.head.isNullAt(0))
  }

  test("null and mismatch edges return null, never a wrong value") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Array(1L, 2L), Array(1L, 2L, 3L)), // length mismatch
      (2L, Array(1L, 2L), Array(4L, 5L))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), VectorKernels.l2sq(col("a"), col("b")).as("v"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(18L))
    val empty = Seq((1L, Array(1L, 2L)))
      .toDF("id", "sq")
      .select(VectorKernels.pqArgmin(
        col("sq"),
        array().cast("array<struct<cell:bigint,c:array<bigint>>>")).as("best"))
      .collect()
    assert(empty.head.isNullAt(0))
    // a null FIELD inside a codebook struct is a null element too:
    // unguarded, a null vector NPE'd the task and a null cell id was
    // silently read as cell 0 (a wrong competing argmin). pq_argmin is
    // a registered SQL function, so user input reaches this directly.
    val nullVec = spark.sql(
      "SELECT pq_argmin(array(1L, 2L), " +
        "array(named_struct('cell', 1L, 'c', CAST(NULL AS ARRAY<BIGINT>))))")
      .collect()
    assert(nullVec.head.isNullAt(0), "null codebook vector must yield NULL, not NPE")
    val nullCell = spark.sql(
      "SELECT pq_argmin(array(1L, 2L), " +
        "array(named_struct('cell', CAST(NULL AS BIGINT), 'c', array(1L, 2L))))")
      .collect()
    assert(nullCell.head.isNullAt(0), "null cell id must yield NULL, not compete as cell 0")
  }
}

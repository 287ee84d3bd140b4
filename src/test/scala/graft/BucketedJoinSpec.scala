package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Evidence for the co-located-join scale path: fact tables written
  * `bucketBy` the join key let Spark plan the join with NO shuffle
  * exchange on either side — at 100 TB that removes the dominant cost
  * of every fact-to-fact join onto the write path, paid once.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("bucketBy join key ⇒ join plans without a shuffle exchange") {
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val origBcast = spark.conf.get(bcastKey)
    val db = "graft_bucket_test"
    try {
      // small tables would broadcast and bypass bucketing — force the
      // shuffle-or-bucketed path so the assertion is about bucketing
      spark.conf.set(bcastKey, "-1")
      val loc = Files.createTempDirectory("graft-bucket").toString
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.li")
      Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.ord")

      val bucketed = spark.table(s"$db.li")
        .join(spark.table(s"$db.ord"), col("l_orderkey") === col("o_orderkey"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // same join over plain parquet DOES shuffle — the cost bucketing removes
      val flat = Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .join(
          Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
      val flatPlan = flat.queryExecution.executedPlan.toString
      assert(flatPlan.contains("Exchange hashpartitioning"))

      // and the results are identical
      assert(bucketed.count() == flat.count())
      assert(bucketed.exceptAll(flat).count() == 0)
    } finally {
      spark.conf.set(bcastKey, origBcast)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}

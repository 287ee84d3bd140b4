package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the embedding-model family (embed_pq_encode,
  * sim_ann_ivfpq, plus the earlier embed_kmeans/embed_pca/sim_ann_ivf
  * as controls): clones the embeddings table `factor`x with vec_id
  * offsets and a deterministic per-clone perturbation (a small rotation
  * of one dimension pair derived from the clone id), so cloned vectors
  * are distinct but the geometry — norms, cluster structure — is
  * preserved. vec_id 0 (the ANN probe) and the %100 query set scale
  * with the corpus exactly as they would in production.
  *
  * The property under test: every op's model side stays CONSTANT-sized
  * (codebooks, centroids, LUTs are broadcast), so wall time must grow
  * linearly-or-better in corpus rows — no model-size or driver-state
  * blowup at any factor.
  *
  * Run:  sbt "runMain graft.tools.StressEmbed /root/testdata/sf0.1 /tmp/stressembed 100"
  */
object StressEmbed {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/stressembed"
    val factor = if (args.length > 2) args(2).toInt else 100
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else Seq("embed_pq_encode", "sim_ann_ivfpq", "sim_ann_ivf", "embed_kmeans", "embed_pca")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val done = new java.io.File(s"$outDir/_built_$factor")
    if (!done.exists()) {
      val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val n = src.count()
      val clones = spark.range(factor).select(col("id").cast("int").as("clone"))
      // perturb dim (clone % 64): v' = v * (1 + clone/(1000*factor)) on
      // that single dimension — tiny, deterministic, keeps norms ~equal
      val cloned = src.crossJoin(clones).select(
        (col("vec_id") + col("clone").cast("long") * n).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("clone"), lit(64)),
            x * (lit(1.0f) + col("clone").cast("float") / lit(1000.0f * factor)))
            .otherwise(x)).as("embedding"),
        col("label")
      )
      cloned.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      // the doc tables are untouched by this family; pass through the
      // small ones some query helpers open eagerly
      Seq("documents").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      }
      done.getParentFile.mkdirs()
      done.createNewFile()
      println(s"[embed] fixture built at $outDir (${factor}x, ${n * factor} vectors)")
    } else println(s"[embed] fixture $outDir exists, reusing")

    def time(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    try time(names.head, sfDir) catch { case e: Throwable => println(s"warmup: $e") }
    names.foreach { q =>
      val t1 = try time(q, sfDir) catch { case e: Throwable => println(s"$q 1x: $e"); -1.0 }
      val tf = try time(q, outDir) catch { case e: Throwable => println(s"$q ${factor}x: $e"); -1.0 }
      println(f"[embed] $q%-18s 1x=$t1%8.2fs ${factor}x=$tf%8.2fs growth=${tf / t1}%6.1fx")
    }
  }
}

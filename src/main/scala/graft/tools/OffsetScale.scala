package graft.tools

object OffsetScale {
  def main(args: Array[String]): Unit = {
    val files = (0 until 100000).map(i =>
      f"s3a://bucket/store/items/EVENTS/__bucket=2024-${i % 12 + 1}%02d/part-$i%05d-0000-c000.snappy.parquet")
    val t0 = System.nanoTime()
    val o = new graft.sources.v2.GraftFilesOffset(files)
    val json = o.json()
    val t1 = System.nanoTime()
    val back = graft.sources.v2.GraftFilesOffset.parse(json)
    val t2 = System.nanoTime()
    require(back.files == files)
    val seen = files.take(99000).toSet
    val t3 = System.nanoTime()
    val fresh = files.filterNot(seen)
    val t4 = System.nanoTime()
    require(fresh.size == 1000)
    println(f"100k-file offset: json ${json.length / 1024 / 1024.0}%.1f MiB, " +
      f"serialize ${(t1 - t0) / 1e6}%.0f ms, parse ${(t2 - t1) / 1e6}%.0f ms, " +
      f"delta-diff ${(t4 - t3) / 1e6}%.0f ms")
  }
}

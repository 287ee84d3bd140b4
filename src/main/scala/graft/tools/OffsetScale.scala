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
    println(f"100k-file LEGACY cumulative offset: json ${json.length / 1024 / 1024.0}%.1f MiB, " +
      f"serialize ${(t1 - t0) / 1e6}%.0f ms, parse ${(t2 - t1) / 1e6}%.0f ms, " +
      f"delta-diff ${(t4 - t3) / 1e6}%.0f ms")
    // the current shape: same 1000-file micro-batch, offset carries
    // only the delta — checkpoint write cost no longer scales with
    // stream age (the seen-set lives in the source's own snapshot log)
    val v2 = new graft.sources.v2.GraftSeqOffset(100L, fresh)
    val v2json = v2.json()
    val v2back = graft.sources.v2.GraftSeqOffset.parse(v2json)
    require(v2back.seq == 100L && v2back.delta == fresh)
    println(f"same batch as a v2 seq+delta offset: json ${v2json.length / 1024.0}%.1f KiB " +
      f"(${json.length / v2json.length}x smaller at 100k tracked files)")
  }
}

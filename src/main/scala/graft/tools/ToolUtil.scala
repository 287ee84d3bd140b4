package graft.tools

/** Shared plumbing for the receipt/demo tools. */
object ToolUtil {

  /** Recursively delete a LOCAL fixture directory so re-runs start
    * clean — the one owner of the deepest-first walk the bench tools
    * previously each carried a copy of. Guarded to the system temp
    * roots ONLY (normalized, so `/data/../tmp` tricks don't slip by
    * and `/tmpX` doesn't match): these tools wipe and rebuild their
    * own stores, and a mistyped argument must not silently erase a
    * real data directory. The earlier guard also accepted any path
    * merely CONTAINING "bench"/"demo" — which would have let a typo'd
    * `/data/benchmarks` through; fixtures that want to live elsewhere
    * must be cleaned by their owner explicitly.
    */
  def wipeDir(dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir).toAbsolutePath.normalize()
    val tmpRoots = Seq(
      java.nio.file.Paths.get("/tmp"),
      java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")).toAbsolutePath.normalize())
    require(
      tmpRoots.exists(r => d.startsWith(r) && d.getNameCount > r.getNameCount),
      s"refusing to wipe '$dir': tool fixtures live strictly under a temp root " +
        s"(${tmpRoots.distinct.mkString(", ")}), never the root itself or elsewhere")
    if (java.nio.file.Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}

package graft.tools

/** Shared plumbing for the receipt/demo tools. */
object ToolUtil {

  /** Recursively delete a LOCAL fixture directory so re-runs start
    * clean — the one owner of the deepest-first walk the bench tools
    * previously each carried a copy of. Guarded to temp-style fixture
    * paths: these tools wipe and rebuild their own stores, and a
    * mistyped argument must not silently erase a real data directory.
    */
  def wipeDir(dir: String): Unit = {
    val d = java.nio.file.Paths.get(dir)
    require(
      dir.startsWith("/tmp/") || dir.contains("bench") || dir.contains("demo"),
      s"refusing to wipe '$dir': tool fixtures live under /tmp or a *bench*/*demo* path")
    if (java.nio.file.Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}

package graft.tools

/** Best-effort recursive delete for dev-tool temp directories (the
  * blown-corpus parquet copies are gigabytes at f=10 and used to accrete
  * across runs). Dev tools only — never called from operator code.
  */
object Cleanup {
  def deleteRecursively(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        // Files.walk holds open directory handles until closed
        val stream = java.nio.file.Files.walk(root)
        val all =
          try stream.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          finally stream.close()
        all.foreach(p =>
          try java.nio.file.Files.deleteIfExists(p) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () }
}

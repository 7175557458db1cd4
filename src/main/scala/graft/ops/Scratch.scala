package graft.ops

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Temp scratch directories for queries that exercise on-disk index
  * lifecycles (q321/q333/q366/q376 write real IVF generations):
  * created per call and registered for recursive deletion at JVM
  * exit, so repeated Verify/Bench sweeps no longer accumulate full
  * corpora under /tmp (r19 advice). Deletion happens at exit rather
  * than after the query's action because the returned frame is LAZY —
  * the parquet scan must stay readable until the harness's action
  * (and any re-collect of the same frame) completes, and the query
  * builder cannot know when that is.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  @volatile private var hooked = false

  /** A fresh temp directory, removed recursively at JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    if (!hooked) synchronized {
      if (!hooked) {
        Runtime.getRuntime.addShutdownHook(new Thread(() => drain()))
        hooked = true
      }
    }
    p.toString
  }

  private def drain(): Unit = {
    var p = dirs.poll()
    while (p != null) {
      try {
        val walk = Files.walk(p)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(f => Files.deleteIfExists(f))
        finally walk.close()
      } catch { case _: Exception => () } // exit-time best effort
      p = dirs.poll()
    }
  }
}

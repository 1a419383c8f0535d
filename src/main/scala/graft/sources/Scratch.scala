package graft.sources

import java.nio.file.{Files, Path}

/** Per-JVM scratch space for the sink/scan round-trip queries.
  *
  * One temp root per JVM, deleted by a shutdown hook; each query reuses
  * a NAMED subdirectory (the writes are overwrite-mode), so repeated
  * invocations — a Bench loop, a long-lived session re-running the
  * battery — create zero new top-level temp dirs instead of leaking one
  * `/tmp/graft-*` per call.
  */
object Scratch {

  private lazy val root: Path = {
    val p = Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p
  }

  /** A stable scratch subdirectory for `name` (created on first use). */
  def dir(name: String): String =
    Files.createDirectories(root.resolve(name)).toString

  /** Recursive delete; the walk stream is closed (Files.walk holds open
    * directory handles until closed). Best-effort: exceptions in a
    * shutdown hook would mask the real exit status. */
  def deleteTree(p: Path): Unit =
    try {
      scala.util.Using.resource(Files.walk(p)) { st =>
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toSeq.reverse
          .foreach(f => Files.deleteIfExists(f))
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}

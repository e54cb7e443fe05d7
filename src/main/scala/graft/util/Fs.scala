package graft.util

import java.nio.file.{Files, Path}

/** The one shared recursive-delete helper — the walk stream holds a
  * directory handle and MUST be closed; keeping a single spelling stops
  * the leak from reappearing in copies (it did, three times).
  */
object Fs {

  /** Delete `p` and everything under it. Missing paths are a no-op;
    * under `tolerant = true` a concurrent external sweep racing ANY stage
    * (the walk itself, iteration, or individual deletions) is tolerated —
    * the goal state, "gone", was reached either way; with `false` (the
    * default) every failure propagates — a cleanup of a directory this
    * JVM owns should fail loudly when it can't.
    */
  def deleteRecursively(p: Path, tolerant: Boolean = false): Unit =
    try {
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(p)
        try walk.iterator().asScala.toSeq.reverse.foreach { f =>
          if (tolerant) { try Files.delete(f) catch { case _: java.io.IOException => () } }
          else Files.delete(f)
        }
        finally walk.close()
      }
    } catch {
      // the walk/iteration stages surface a vanished tree as these two
      case _: java.nio.file.NoSuchFileException if tolerant => ()
      case e: java.io.UncheckedIOException if tolerant &&
        e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => ()
    }
}

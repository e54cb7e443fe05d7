package graft.util

import java.nio.file.{Files, Path}

/** The one shared recursive-delete helper — the walk stream holds a
  * directory handle and MUST be closed; keeping a single spelling stops
  * the leak from reappearing in copies (it did, three times).
  */
object Fs {

  /** Delete `p` and everything under it. Missing paths are a no-op;
    * individual deletions racing an external writer are tolerated
    * (`tolerant = true`) or propagated (`false`, the default — a cleanup
    * of a directory this JVM owns should fail loudly when it can't).
    */
  def deleteRecursively(p: Path, tolerant: Boolean = false): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach { f =>
        if (tolerant) { try Files.delete(f) catch { case _: java.io.IOException => () } }
        else Files.delete(f)
      }
      finally walk.close()
    }
}

package graft.sources.testing

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Closed-stream directory listing. `Files.list` returns a
  * DirectoryStream-backed java Stream that holds a file handle until
  * closed; fixture builders and specs list directories often enough in
  * long test runs for the leak to matter (ADVICE r8). */
object DirWalk {

  /** Apply `f` to each direct child of `dir`, closing the stream. */
  def eachChild(dir: Path)(f: Path => Unit): Unit = {
    val s = Files.list(dir)
    try s.forEach(p => f(p)) finally s.close()
  }

  /** Materialized child list (stream closed before returning). */
  def children(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }
}

package graft.text

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Caption MRU store (reference auxiliary subsystem,
  * `/root/reference/modules/caption_manager.py:1-26`): a tiny text file of
  * captions, one per line, most-recently-used first.
  *
  * This is a UI affordance, not dataflow — the store is a few hundred lines
  * at most, so it stays driver-side Scala (SURVEY.md §2.5 O1). The pure
  * functions are separated from the file I/O so they unit-test without a
  * filesystem; Tiling attaches the chosen caption to tiles as a literal
  * column (the broadcast-join degenerate case of one caption).
  */
object CaptionStore {

  /** Parse store content: strip blank/whitespace-only lines, keep order
    * (reference load, `caption_manager.py:5-12`). */
  def parse(lines: Seq[String]): Seq[String] =
    lines.map(_.trim).filter(_.nonEmpty)

  /** MRU update: dedup the caption, insert at the front
    * (reference save, `caption_manager.py:14-26`). */
  def mruUpdate(captions: Seq[String], caption: String): Seq[String] = {
    val c = caption.trim
    if (c.isEmpty) captions else c +: captions.filterNot(_ == c)
  }

  def load(path: String): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else parse(Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq)
  }

  def save(path: String, captions: Seq[String]): Unit = {
    val p: Path = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, captions.asJava, StandardCharsets.UTF_8)
  }

  /** load → mruUpdate → save, returning the new list (the reference's
    * save_caption flow). */
  def recordUse(path: String, caption: String): Seq[String] = {
    val updated = mruUpdate(load(path), caption)
    save(path, updated)
    updated
  }
}

package graft.streaming

import java.nio.file.{Files, Path}
import java.util.Comparator
import graft.SparkSpec
import org.apache.spark.sql.types.StructType

/** Streaming CDC apply ([[Streaming.applyCdcStream]]): a real parquet
  * change-feed source upserted into the landed hash-partitioned snapshot,
  * with the three invariants the batch tier (q128 apply, q181 recover)
  * cannot cover:
  *  - stream ≡ batch: the landed table after the feed drains equals a
  *    sequential apply of every change in seq order;
  *  - restart durability: the query stopped mid-feed and restarted on the
  *    same checkpoint resumes without losing or re-corrupting state
  *    (the merge is idempotent, so at-least-once redelivery is
  *    exactly-once on the table);
  *  - partition hygiene: a batch touching one pid does not rewrite the
  *    other partitions' files.
  */
class CdcStreamSpec extends SparkSpec {

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))

  private val schema = StructType.fromDDL(
    "seq BIGINT, op STRING, doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT")

  private def model(changes: Seq[(Long, String, Long, String, String, Long)])
  : Map[Long, (String, String, Long)] =
    changes.sortBy(_._1).foldLeft(Map.empty[Long, (String, String, Long)]) {
      case (m, (_, op, id, lang, src, nc)) =>
        if (op == "D") m - id else m + (id -> (lang, src, nc))
    }

  private def readSnapshot(path: String): Map[Long, (String, String, Long)] =
    spark.read.parquet(path)
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap

  test("CDC apply stream: restart-durable, idempotent, equals sequential batch apply") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cdc")
    val in = s"$base/in"; val snap = s"$base/snap"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    try {
      def startQuery() = Streaming.applyCdcStream(
        spark.readStream.schema(schema).parquet(in), snap, ckpt, nParts = 4)

      // feed 1: inserts for docs 1-8, then an in-batch update+delete whose
      // LAST-seq-wins reduction the merge must honor (doc 3 updated twice,
      // doc 4 inserted then deleted in the same batch)
      val feed1 = (1L to 8L).map(i => (i, "I", i, "en", s"src${i % 2}", 100L + i)) ++
        Seq((9L, "U", 3L, "fr", "src1", 300L), (10L, "U", 3L, "de", "src1", 301L),
          (11L, "D", 4L, null, null, 0L))
      feed1.toDF("seq", "op", "doc_id", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(in)
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop(); q1.awaitTermination()
      assert(readSnapshot(snap) == model(feed1))

      // while the query is DOWN: more updates, a delete of an existing doc,
      // a re-insert of the deleted doc 4
      val feed2 = Seq((12L, "U", 1L, "es", "src1", 500L), (13L, "D", 7L, null, null, 0L),
        (14L, "I", 4L, "zh", "src0", 900L), (15L, "I", 20L, "en", "src0", 42L))
      feed2.toDF("seq", "op", "doc_id", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(in)
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop(); q2.awaitTermination()
      val expected = model(feed1 ++ feed2)
      assert(readSnapshot(snap) == expected)

      // idempotence (the exactly-once argument): re-applying feed2's batch
      // to the already-merged snapshot changes nothing
      Streaming.applyCdcBatch(
        feed2.toDF("seq", "op", "doc_id", "lang", "source", "n_chars"),
        snap, batchId = 99L, nParts = 4)
      assert(readSnapshot(snap) == expected)

      // partition hygiene: a batch touching only pid 2 (doc 2, 4 % 4 = 0 —
      // use doc 2: 2 % 4 = 2) leaves other partition dirs untouched
      val pid1Dir = new java.io.File(s"$snap/pid=1")
      val before = pid1Dir.listFiles().map(f => f.getName -> f.lastModified).toMap
      Streaming.applyCdcBatch(
        Seq((16L, "U", 2L, "fr", "src0", 777L))
          .toDF("seq", "op", "doc_id", "lang", "source", "n_chars"),
        snap, batchId = 100L, nParts = 4)
      val after = pid1Dir.listFiles().map(f => f.getName -> f.lastModified).toMap
      assert(after == before, "untouched partition was rewritten")
      assert(readSnapshot(snap) ==
        model(feed1 ++ feed2 :+ ((16L, "U", 2L, "fr", "src0", 777L))))
    } finally deleteRecursively(base)
  }
}

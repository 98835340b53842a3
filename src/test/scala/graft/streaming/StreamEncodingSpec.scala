package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 regression lock for the STREAMING ingest path: the batch
  * events loader was fixed for the harness's re-encoded `timestamp[us]`
  * files, but `readEventStream` declared the NORMALIZED schema against
  * the raw files — a parquet reader type mismatch on an NTZ-encoded
  * landing zone. It now declares the raw footer schema and applies the
  * shared `normalizeEventTs`; this spec streams the same events from an
  * LTZ-encoded and an NTZ-encoded landing zone and asserts identical
  * windowed output. */
class StreamEncodingSpec extends SparkSpec {

  test("readEventStream produces identical windows from LTZ and NTZ landing zones") {
    val base = java.nio.file.Files.createTempDirectory("graft-senc").toString
    val ev = graft.Tables.events(spark, sfDir)
    Seq(
      ("ltz", ev),
      ("ntz", ev.withColumn("ts", col("ts").cast("timestamp_ntz")))
    ).foreach { case (enc, df) =>
      df.coalesce(1).write.parquet(s"$base/$enc")
    }
    def run(enc: String): Seq[String] = {
      val q = Streaming.tumbling(Streaming.readEventStream(spark, s"$base/$enc"))
        .writeStream.format("memory").queryName(s"senc_$enc")
        .option("checkpointLocation", s"$base/ckpt_$enc")
        .start()
      try q.processAllAvailable() finally q.stop()
      spark.table(s"senc_$enc").collect().map(_.toString).sorted.toSeq
    }
    val ltz = run("ltz")
    val ntz = run("ntz")
    assert(ltz.nonEmpty, "append-mode watermark should have finalized windows")
    assert(ntz == ltz, "NTZ landing zone must stream identically to LTZ")
  }
}

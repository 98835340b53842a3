package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Harness-data-drift lock (round-5 regression): the harness regenerated
  * `events.parquet` once — TIMESTAMP(NANOS) became plain `timestamp[us]`
  * (no timezone → TIMESTAMP_NTZ in Spark 4) — and every event query
  * failed ANALYSIS for a full round because `Tables.events` only
  * normalized the old encoding. The loader now handles every plausible
  * physical encoding of `ts`; this spec locks that by rewriting the
  * sf0.001 events table in each encoding and running EVERY registered
  * `Events.defs` query against each, asserting row-identical results —
  * so the next regeneration is a no-op instead of a red round. */
class EventsEncodingSpec extends SparkSpec {

  test("every events query runs row-identically on all plausible ts encodings") {
    val base = java.nio.file.Files.createTempDirectory("graft-enc").toString
    // Canonical frame through the loader (ts normalized to session-TZ
    // TIMESTAMP) — each encoding below is a lossless re-write of it, so
    // value-identical results are the correct expectation.
    val ev = graft.Tables.events(spark, sfDir)
    val encodings: Seq[(String, DataFrame)] = Seq(
      "ltz" -> ev, // timestamp[us] adjusted-to-UTC → TIMESTAMP
      "ntz" -> ev.withColumn("ts", col("ts").cast("timestamp_ntz")),
      "long_nanos" -> ev.withColumn("ts", unix_micros(col("ts")) * 1000L))
    val others = new java.io.File(sfDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.getName != "events.parquet")
    val dirs = encodings.map { case (enc, df) =>
      val d = s"$base/$enc"
      new java.io.File(d).mkdirs()
      // non-events tables: straight file copies, queries may join them
      others.foreach(f => java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(d, f.getName)))
      df.coalesce(1).write.parquet(s"$d/events.parquet")
      enc -> d
    }
    for (qd <- Events.defs) {
      val results = dirs.map { case (enc, d) =>
        val rows =
          try qd.build(spark, d).collect().map(_.toString).sorted.toSeq
          catch { case e: Throwable =>
            fail(s"${qd.name} failed on encoding '$enc': ${e.getMessage}")
          }
        enc -> rows
      }
      val (refEnc, ref) = results.head
      assert(ref.nonEmpty, s"${qd.name}: empty result on $refEnc")
      for ((enc, rows) <- results.tail)
        assert(rows == ref,
          s"${qd.name}: '$enc' result differs from '$refEnc'")
    }
  }
}

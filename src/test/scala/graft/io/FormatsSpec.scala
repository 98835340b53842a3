package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL/CSV round-trips must be LOSSLESS for adversarial document text —
  * quoting/escaping bugs are the classic corpus-interchange failure. */
class FormatsSpec extends SparkSpec {

  private def adversarial = {
    import spark.implicits._
    Seq(
      (1L, "plain text"),
      (2L, "comma, separated, values"),
      (3L, "a \"quoted\" word and a lone \" quote"),
      (4L, "line one\nline two\r\nline three"),
      (5L, "unicode: café 中文 ǟ and a tab\there"),
      (6L, ""),
      (7L, "trailing backslash \\ and \\\" escaped-quote lookalike"),
      (8L, "null-ish strings: null NULL \\N"))
      .toDF("doc_id", "text")
  }

  test("JSONL round-trip is byte-lossless for adversarial text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/docs"
    val in = adversarial
    Formats.writeJsonl(in, dir)
    val back = Formats.readJsonl(spark, dir, in.schema)
    val a = in.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b == a, s"JSONL round-trip mutated text: ${b.toSet -- a.toSet}")
  }

  test("CSV round-trip with quoteAll/escape/multiLine is lossless for adversarial text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/docs"
    val in = adversarial
    Formats.writeCsv(in, dir)
    val back = Formats.readCsv(spark, dir, in.schema)
    val a = in.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b == a, s"CSV round-trip mutated text: ${b.toSet -- a.toSet}")
  }

  test("ORC round-trip is lossless; filter pushdown reaches the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/docs"
    val in = adversarial
    Formats.writeOrc(in, dir)
    val back = Formats.readOrc(spark, dir, in.schema)
    val a = in.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b == a, s"ORC round-trip mutated text: ${b.toSet -- a.toSet}")
    // the scale contract: a filtered projection must reach the scan as
    // PushedFilters + a pruned read schema, exactly like parquet
    val q = Formats.readOrc(spark, dir, in.schema)
      .filter(col("doc_id") > 3L).select("doc_id")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,3)]"),
      s"ORC scan lost the pushed filter:\n$scan")
    assert(scan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"ORC scan did not prune to the projected column:\n$scan")
  }

  test("gzip/zstd JSONL shards round-trip losslessly with the right extensions") {
    Formats.ensureZstdReadable(spark)
    val in = adversarial
    val a = in.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((codec, ext) <- Seq("gzip" -> ".json.gz",
                             Formats.ZstdCodecClass -> ".json.zst")) {
      val dir = java.nio.file.Files.createTempDirectory("graft-jsonlc").toString + "/docs"
      Formats.writeJsonlCompressed(in, dir, codec)
      val shards = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
      assert(shards.nonEmpty && shards.forall(_.getName.endsWith(ext)),
        s"$codec shards must carry $ext (extension drives read-side codec " +
          s"resolution): ${shards.map(_.getName).toSeq}")
      // read back with NO codec option: extension-resolved decompressor
      val back = Formats.readJsonl(spark, dir, in.schema)
      val b = back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(b == a, s"$codec JSONL round-trip mutated text: ${b.toSet -- a.toSet}")
    }
  }

  test("splittability contract: plain JSONL splits within a file, gzip/zstd are file-per-split") {
    Formats.ensureZstdReadable(spark)
    import spark.implicits._
    // one ~4 MB single-file shard per layout; a 256 KB split target then
    // yields many partitions IFF the source can split inside the file
    val in = (1L to 20000L).map(i => (i, ("token%06d ".format(i)) * 20))
      .toDF("doc_id", "text").coalesce(1)
    val roots = Seq("plain" -> None, "gz" -> Some("gzip"),
      "zst" -> Some(Formats.ZstdCodecClass)).map { case (name, codec) =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-split-$name")
        .toString + "/docs"
      codec match {
        case None    => Formats.writeJsonl(in, dir)
        case Some(c) => Formats.writeJsonlCompressed(in, dir, c)
      }
      name -> dir
    }.toMap
    val savedMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val savedCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      def parts(dir: String): Int =
        Formats.readJsonl(spark, dir, in.schema).rdd.getNumPartitions
      assert(parts(roots("plain")) > 1,
        "plain JSONL must split inside a file (line-splittable)")
      // the WARC lesson: a compressed text shard is ONE task no matter
      // its size — shard size, set at write time, is the parallelism knob
      assert(parts(roots("gz")) == 1, "a gzip shard must plan exactly one split")
      assert(parts(roots("zst")) == 1, "a zstd shard must plan exactly one split")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", savedMax)
      spark.conf.set("spark.sql.files.openCostInBytes", savedCost)
    }
  }

  test("JSONL round-trips the real documents table unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-corpus").toString + "/docs"
    val in = graft.Tables.documents(spark, sfDir)
    Formats.writeJsonl(in, dir)
    val back = Formats.readJsonl(spark, dir, in.schema)
    assert(back.count() == in.count())
    val diff = in.exceptAll(back).count() + back.exceptAll(in).count()
    assert(diff == 0, s"$diff corpus rows mutated by JSONL round-trip")
  }
}

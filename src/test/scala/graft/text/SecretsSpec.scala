package graft.text

import graft.SparkSpec

/** q231 secret scanning: planted classes detect and redact; near-miss
  * strings (wrong length, wrong charset) never match. */
class SecretsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sec").toString
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Secrets.secretScan(spark, dir).collect().map(r => r.getString(0) -> r).toMap
  }

  test("planted residue classes detect, one per class, others clean") {
    val docs = (0L until 70L).map(i => (i, "s", s"doc $i"))
    val r = run(docs)("s")
    assert(r.getLong(1) == 70) // n_docs
    assert(r.getLong(2) == 10) // n_aws  (doc_id % 7 == 1)
    assert(r.getLong(3) == 10) // n_ghp  (doc_id % 7 == 3)
    assert(r.getLong(4) == 10) // n_hex  (doc_id % 7 == 5)
    assert(r.getLong(5) == 30) // n_docs_hit
  }

  test("near-misses never match: wrong length or charset") {
    // 15-char AKIA tail, 35-char ghp tail, 63-hex, uppercase hex-64
    val nearMiss = "AKIA" + "A" * 15 + " ghp_" + "a" * 35 + " " +
      "a" * 63 + " " + "A" * 64
    val docs = Seq((0L, "s", nearMiss)) // doc_id 0: no plant
    val r = run(docs)("s")
    assert(r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0)
    assert(r.getLong(5) == 0)
  }
}

package graft.web

import graft.SparkSpec

/** q225 crawl-trap detection: the three planted trap families flag, the
  * clean article family never does, and the census arithmetic holds —
  * on a corpus sized so every family is clearly past the thresholds. */
class TrapsSpec extends SparkSpec {

  private lazy val byDomain = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("traps").toString
    (0L until 1200L).map(i => (i, "s", s"doc$i"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Traps.crawlTraps(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
  }

  test("every domain sees 4 templates, 3 of them traps") {
    assert(byDomain.keySet ==
      Set("example.com", "sample.co.uk", "data.gov.uk"))
    for ((_, r) <- byDomain) {
      assert(r.getLong(1) == 4) // n_templates
      assert(r.getLong(2) == 3) // calendar + session + pagination
    }
  }

  test("trapped volume excludes exactly the clean article family") {
    for ((_, r) <- byDomain) {
      val (nUrls, nTrapped) = (r.getLong(3), r.getLong(4))
      // 4 families share the domain's URLs evenly; only 1 is clean
      assert(nTrapped > 0 && nTrapped < nUrls)
      assert(nUrls - nTrapped >= 90 && nUrls - nTrapped <= 110)
    }
  }

  test("template fingerprint binds WHICH templates flagged") {
    // all three domains flag the same three path shapes, but the
    // template string embeds the host, so fingerprints must differ
    assert(byDomain.values.map(_.getLong(5)).toSet.size == 3)
  }

  test("small corpora fall below the volume threshold: no traps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("traps2").toString
    (0L until 48L).map(i => (i, "s", s"doc$i"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Traps.crawlTraps(spark, dir).collect()
    assert(rows.forall(_.getLong(2) == 0L))
  }
}

package graft.text

import graft.SparkSpec

/** q227 Unicode hygiene: the repair kernel's detection/repair
  * semantics, idempotence, and the planted-class census. */
class UnicodeNormSpec extends SparkSpec {

  test("kernel: NFD detects and repairs to the composed twin") {
    val (nonNfc, zw, rep) = UnicodeNorm.repair("x" + UnicodeNorm.SufNFD)
    assert(nonNfc && !zw)
    assert(rep == "x" + UnicodeNorm.SufNFC)
  }

  test("kernel: zero-widths detect and strip; result is the clean twin") {
    val (nonNfc, zw, rep) = UnicodeNorm.repair("x" + UnicodeNorm.SufZW)
    assert(!nonNfc && zw)
    assert(rep == "x" + UnicodeNorm.SufNFC)
  }

  test("kernel: clean NFC text passes through unchanged (idempotence)") {
    val clean = "plain ascii" + UnicodeNorm.SufNFC
    val (nonNfc, zw, rep) = UnicodeNorm.repair(clean)
    assert(!nonNfc && !zw && rep == clean)
    assert(UnicodeNorm.repair(rep)._3 == rep)
  }

  test("the NFC/NFD spellings differ byte-wise but repair identically") {
    assert(UnicodeNorm.SufNFC != UnicodeNorm.SufNFD)
    assert(UnicodeNorm.SufNFC.length < UnicodeNorm.SufNFD.length)
    assert(UnicodeNorm.repair(UnicodeNorm.SufNFD)._3 == UnicodeNorm.SufNFC)
  }

  test("census: planted residue classes land in the right counters") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("unorm").toString
    (0L until 100L).map(i => (i, "s", s"doc $i"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = UnicodeNorm.unicodeNormalize(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 100) // n_docs
    assert(row.getLong(2) == 20) // doc_id % 5 == 1
    assert(row.getLong(3) == 20) // doc_id % 5 == 3
    assert(row.getLong(4) == 100) // every repair lands on the clean twin
  }
}

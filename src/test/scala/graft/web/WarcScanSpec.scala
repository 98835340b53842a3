package graft.web

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The splittable WARC read path: gzip member index correctness
  * (including full RFC 1952 optional-field headers), slice grouping
  * under an inflated-size budget, and the Spark pipeline's two scale
  * claims — within-file parallelism beyond #files, and slim (no
  * payload bytes) rows through the distribution exchange. */
class WarcScanSpec extends SparkSpec {

  private val files = Web.fixtureFiles().toMap

  // ---------------------------------------------------- member indexing

  test("member index: every member re-parses independently from its range") {
    for (name <- Seq("crawl_a.warc.gz", "crawl_b.warc.gz", "crawl_d.warc.gz")) {
      val bytes = files(name)
      val idx = Warc.memberIndex(new java.io.ByteArrayInputStream(bytes))
      assert(idx.nonEmpty, name)
      // ranges are contiguous from 0 and per-member slices parse clean
      assert(idx.head.offset == 0L)
      for (Seq(a, b) <- idx.sliding(2) if idx.length > 1)
        assert(a.offset + a.clen == b.offset)
      val whole = Warc.parseFile(bytes)
      val perMember = idx.flatMap { m =>
        val slice = java.util.Arrays.copyOfRange(
          bytes, m.offset.toInt, (m.offset + m.clen).toInt)
        val (inflated, trunc) = Warc.gunzipAll(slice)
        assert(!trunc, s"$name member at ${m.offset}")
        assert(inflated.length == m.ilen)
        Warc.parseRecords(inflated)
      }
      assert(perMember.map(_.warcType) == whole.map(_.warcType), name)
      assert(perMember.map(_.payload.toSeq) == whole.map(_.payload.toSeq), name)
    }
  }

  test("member index: corrupt tail keeps complete members; junk/plain empty") {
    val d = Warc.memberIndex(
      new java.io.ByteArrayInputStream(files("crawl_d.warc.gz")))
    assert(d.length == 2) // third member header is corrupt
    assert(Warc.memberIndex(
      new java.io.ByteArrayInputStream(files("junk_w.warc"))).isEmpty)
    assert(Warc.memberIndex(
      new java.io.ByteArrayInputStream(files("crawl_c.warc"))).isEmpty)
    assert(Warc.memberIndex(
      new java.io.ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
  }

  test("member index: FEXTRA/FNAME/FCOMMENT headers are skipped correctly") {
    // splice an optional-field header onto a real member's deflate body
    val plain = Warc.renderGzMembers(
      Warc.renderRecord("metadata", None, "application/warc-fields",
        "k: v".getBytes("ISO-8859-1")))
    val body = plain.drop(10) // strip the JDK's 10-byte header
    val hdr = Array[Byte](0x1f.toByte, 0x8b.toByte, 8,
      (4 | 8 | 16).toByte, // FEXTRA | FNAME | FCOMMENT
      0, 0, 0, 0, 0, 0) ++
      Array[Byte](3, 0, 1, 2, 3) ++ // FEXTRA: XLEN=3 LE + 3 bytes
      ("name.warc".getBytes("ISO-8859-1") :+ 0.toByte) ++ // FNAME NUL-terminated
      ("a comment".getBytes("ISO-8859-1") :+ 0.toByte)   // FCOMMENT NUL-terminated
    val spliced = hdr ++ body ++ plain // second member: plain JDK layout
    val idx = Warc.memberIndex(new java.io.ByteArrayInputStream(spliced))
    assert(idx.length == 2)
    assert(idx(0).offset == 0 && idx(0).clen == (hdr ++ body).length)
    assert(idx(1).offset == (hdr ++ body).length && idx(1).clen == plain.length)
    assert(idx(0).ilen == idx(1).ilen)
  }

  // ---------------------------------------------------- slice grouping

  test("slice grouping respects the inflated budget; oversized members are solo") {
    def m(off: Long, cl: Long, il: Long) = Warc.GzMember(off, cl, il)
    val idx = Seq(m(0, 5, 10), m(5, 5, 20), m(10, 5, 30), m(15, 5, 40))
    val slices = WarcScan.slicesOf(idx, 20, 35)
    assert(slices == Seq((0L, 10L, 30L, false), (10L, 5L, 30L, false),
      (15L, 5L, 40L, false)))
    // a member bigger than the budget still gets (exactly) one slice
    assert(WarcScan.slicesOf(Seq(m(0, 9, 100)), 9, 35)
      == Seq((0L, 9L, 100L, false)))
    // non-gzip file: one identity slice spanning the file
    assert(WarcScan.slicesOf(Seq.empty, 123, 35) == Seq((0L, 123L, 123L, true)))
  }

  test("slice cuts are record-aligned: a record split across members stays whole") {
    // ONE record compressed as TWO gzip members — legal, though off the
    // ISO 28500 record-per-member convention (e.g. chunked recompression)
    val rec = Warc.renderRecord("metadata", None, "application/warc-fields",
      ("k: " + "v" * 200).getBytes("ISO-8859-1"))
    val (h1, h2) = rec.splitAt(rec.length / 2)
    val bytes = Warc.renderGzMembers(h1, h2)
    val idx = Warc.memberIndex(new java.io.ByteArrayInputStream(bytes))
    assert(idx.length == 2)
    assert(idx(0).recStart && !idx(1).recStart)
    // a 1-byte budget would love to cut between the members; the
    // non-aligned continuation must stay glued to its predecessor
    val slices = WarcScan.slicesOf(idx, bytes.length, 1)
    assert(slices.length == 1)
    assert(Warc.parseRecords(Warc.gunzipAll(bytes)._1).length == 1)
    // aligned members still split under the same budget
    val aligned = Warc.renderGzMembers(rec, rec)
    val idx2 = Warc.memberIndex(new java.io.ByteArrayInputStream(aligned))
    assert(idx2.forall(_.recStart))
    assert(WarcScan.slicesOf(idx2, aligned.length, 1).length == 2)
  }

  // ------------------------------------------------- the Spark pipeline

  test("within-file parallelism: slices exceed files; per-slice input bounded") {
    val folder = Web.warcFolder(spark, sfDir)
    val nFiles = WarcScan.fileListing(spark, folder).count()
    // budget 1 byte → every member is its own slice
    val slices = WarcScan.sliceIndex(spark, folder, sliceBudget = 1L).collect()
    assert(slices.length > nFiles,
      s"${slices.length} slices should exceed $nFiles files")
    // crawl_a has three members → three slices of one file
    assert(slices.count(_.getString(0).endsWith("crawl_a.warc.gz")) == 3)
    // bounded per-task input: budget 1 forces one member per slice, so
    // every gz slice's inflated size must equal exactly one member of
    // the direct byte-level index (max-MEMBER contract, never max-file)
    val memberIlens = files.view.mapValues(b =>
      Warc.memberIndex(new java.io.ByteArrayInputStream(b)).map(_.ilen)).toMap
    val gz = slices.filter(!_.getBoolean(5))
    assert(gz.nonEmpty)
    for (r <- gz) {
      val fname = r.getString(0).split('/').last
      assert(memberIlens(fname).contains(r.getLong(4)),
        s"$fname slice ilen ${r.getLong(4)} is not a single member")
    }
    assert(gz.length == memberIlens.values.map(_.length).sum)
    // compressed range never spans beyond the file
    for (r <- slices) assert(r.getLong(2) >= 0 && r.getLong(3) > 0)
  }

  test("sliced records equal the whole-file parse, and the distribution " +
    "exchange carries no payload bytes") {
    val folder = Web.warcFolder(spark, sfDir)
    val recs = WarcScan.records(spark, folder, sliceBudget = 1L)
      .select(col("file"), col("r.warc_type"), col("r.target_uri"),
        md5(col("r.payload")).as("pm"))
    val got = recs.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3))).toSet
    val want = Web.fixtureFiles().flatMap { case (name, bytes) =>
      Warc.parseFile(bytes).map { w =>
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(w.payload).map("%02x".format(_)).mkString
        (name, w.warcType, w.targetUri.orNull, dig)
      }
    }.toSet
    assert(got == want)
    // scale claim: every shuffle in this plan moves slim descriptor
    // rows — no BinaryType column crosses an exchange
    for (ex <- shuffleExchanges(recs);
         attr <- ex.children.flatMap(_.output))
      assert(attr.dataType != org.apache.spark.sql.types.BinaryType,
        s"payload column ${attr.name} crossed an exchange")
  }

  test("recordsNumbered restores the per-file ordinal across slices") {
    val folder = Web.warcFolder(spark, sfDir)
    val rows = WarcScan.recordsNumbered(spark, folder, sliceBudget = 1L)
      .select(col("file"), col("rec"), col("r.warc_type"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val want = Web.fixtureFiles().flatMap { case (name, bytes) =>
      Warc.parseFile(bytes).zipWithIndex.map { case (w, i) =>
        (name, i, w.warcType)
      }
    }
    assert(rows.sorted.toSeq == want.sorted.toSeq)
  }

  test("landed sidecar index: recordsFromIndex ≡ records, no re-indexing") {
    val folder = Web.warcFolder(spark, sfDir)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-warc-idx").toString + "/index"
    WarcScan.landIndex(spark, folder, idx, sliceBudget = 1L)
    def census(df: org.apache.spark.sql.DataFrame) = df
      .select(col("file"), col("r.warc_type"), md5(col("r.payload")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(census(WarcScan.recordsFromIndex(spark, idx)) ==
      census(WarcScan.records(spark, folder, sliceBudget = 1L)))
  }

  test("oversized-inflation guard: gunzipAll truncates instead of throwing") {
    // 600 MB of zeros compresses to ~600 KB; inflating with a tiny cap
    // must return a truncation flag, not throw (contract check uses the
    // real constant path indirectly — here we only verify the flag
    // semantics on a multi-member stream cut mid-member)
    val big = Warc.renderGzMembers(new Array[Byte](1 << 20))
    val (out, trunc) = Warc.gunzipAll(big)
    assert(!trunc && out.length == (1 << 20))
    val (pre, trunc2) = Warc.gunzipAll(big.dropRight(9))
    assert(trunc2 && pre.length <= (1 << 20))
  }
}

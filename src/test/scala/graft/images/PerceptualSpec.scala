package graft.images

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual dHash tier: the decoded-pixel hash must equal the
  * block-formula hash (the oracle derives from the formula; this spec
  * closes the loop on the PIXEL side), and the fixture cohorts must show
  * exactly the designed relationships. */
class PerceptualSpec extends SparkSpec {

  private def formulaHash(i: Int): Long = {
    var h = 0L
    for (by <- 0 until Perceptual.BlocksY; bx <- 0 until Perceptual.BlocksX - 1)
      if (Perceptual.blockGray(bx, by, i) < Perceptual.blockGray(bx + 1, by, i))
        h |= 1L << (by * 8 + bx)
    h
  }

  test("dhashOf(imageBytes(i)) equals the block-formula hash for every fixture image") {
    (0 until Perceptual.NumImages).foreach { i =>
      assert(Perceptual.dhashOf(Perceptual.imageBytes(i)).contains(formulaHash(i)),
        s"pixel-derived hash diverged from formula for image $i")
    }
  }

  test("cohort design: byte twins collide, retouched cohort is hamming 3, bases spread") {
    val hs = (0 until Perceptual.NumImages).map(formulaHash)
    (16 to 19).foreach(i => assert(hs(i) == hs(i - 16), s"twin $i must collide"))
    (20 to 23).foreach { i =>
      val d = java.lang.Long.bitCount(hs(i) ^ hs(i - 20))
      assert(d == 3, s"retouched $i expected hamming 3, got $d")
    }
    for (a <- 0 until 16; b <- (a + 1) until 16)
      assert(java.lang.Long.bitCount(hs(a) ^ hs(b)) > Perceptual.HammingMax,
        s"base patterns $a,$b too close — near-pair query would mix them in")
    // bytes really differ where hashes collide (dedup that content hash misses)
    (16 to 19).foreach { i =>
      assert(!java.util.Arrays.equals(Perceptual.imageBytes(i),
        Perceptual.imageBytes(i - 16)), s"twin $i must differ at byte level")
    }
  }

  test("q152 ingest: cohort verdicts exact, matched family and distance from formula model") {
    val corpus = (0 until Perceptual.NumImages).map(i => i.toLong -> formulaHash(i))
    val model = Perceptual.ProbeIds.map { p =>
      val hp = formulaHash(p)
      val close = corpus.map { case (g, c) =>
        (java.lang.Long.bitCount(hp ^ c).toLong, g)
      }.filter(_._1 <= Perceptual.HammingMax).sorted.headOption
      val (ham, gid) = close.getOrElse((-1L, -1L))
      val verdict = if (ham == 0) "exact_dup" else if (ham > 0) "near_dup" else "novel"
      (p.toLong, hp, gid, ham, verdict)
    }
    val got = Perceptual.dhashIngest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == model)
    // the designed cohort story: 2 near-dups, 2 novels, 2 exact dups
    assert(got.map(_._5) == Seq("near_dup", "near_dup", "novel", "novel",
      "exact_dup", "exact_dup"))
    assert(got.filter(_._5 == "exact_dup").map(_._3) == Seq(6L, 7L))
  }

  test("non-grid-divisible and undecodable inputs quarantine as None") {
    assert(Perceptual.dhashOf(null).isEmpty)
    assert(Perceptual.dhashOf("not an image".getBytes).isEmpty)
    val odd = new java.awt.image.BufferedImage(35, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(odd, "png", baos)
    assert(Perceptual.dhashOf(baos.toByteArray).isEmpty)
  }

  private def formulaPhash(i: Int): Long = {
    // independent re-derivation: BigInt DCT over the formula's block
    // values with the shared literal cosine tables, median cut, bits
    val acs = for { u <- 0 until 8; v <- 0 until 8; if u != 0 || v != 0 } yield {
      val s = (for {
        bx <- 0 until Perceptual.BlocksX; by <- 0 until Perceptual.BlocksY
      } yield BigInt(Perceptual.blockGray(bx, by, i)) *
        Perceptual.DctCx(u)(bx) * Perceptual.DctCy(v)(by)).sum
      ((u, v), s)
    }
    val med = acs.map(_._2).sorted.apply(31)
    acs.foldLeft(0L) { case (h, ((u, v), p)) =>
      if (p > med) h | (1L << (v * 8 + u)) else h
    }
  }

  test("q198 phashOf(imageBytes(i)) equals the BigInt formula model; cohorts behave") {
    val hs = (0 until Perceptual.NumImages).map(formulaPhash)
    (0 until Perceptual.NumImages).foreach { i =>
      assert(Perceptual.phashOf(Perceptual.imageBytes(i)).contains(hs(i)),
        s"pixel-derived pHash diverged from formula model for image $i")
    }
    // byte twins preserve block means → identical pHash
    (16 to 19).foreach(i => assert(hs(i) == hs(i - 16), s"twin $i must collide"))
    // the 16 base patterns stay distinct under pHash too
    assert(hs.take(16).distinct.size == 16, "base patterns must have distinct pHashes")
    // retouch robustness: two flipped blocks move the low-frequency
    // spectrum LESS than they move local gradients — pHash distance for
    // the retouched cohort stays below dHash's designed hamming of 3 + a
    // couple of median-shift bits (it must NOT explode to half the bits)
    (20 to 23).foreach { i =>
      val d = java.lang.Long.bitCount(hs(i) ^ hs(i - 20))
      assert(d <= 16, s"retouched $i pHash distance $d unexpectedly large")
    }
    // integer-exactness headroom: every coefficient must fit int64
    for (i <- 0 until Perceptual.NumImages; u <- 0 until 8; v <- 0 until 8) {
      val s = (for {
        bx <- 0 until Perceptual.BlocksX; by <- 0 until Perceptual.BlocksY
      } yield BigInt(Perceptual.blockGray(bx, by, i)) *
        Perceptual.DctCx(u)(bx) * Perceptual.DctCy(v)(by)).sum
      assert(s.isValidLong, s"coefficient overflow at i=$i u=$u v=$v")
    }
  }

  test("q140/q141: families and near pairs match the formula-level model") {
    val hs = (0 until Perceptual.NumImages).map(formulaHash)
    val gotFams = Perceptual.imageDhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val famModel = (0 until Perceptual.NumImages).map { i =>
      val fam = hs.zipWithIndex.filter(_._1 == hs(i)).map(_._2)
      (i.toLong, hs(i), fam.min.toLong, fam.size.toLong)
    }
    assert(gotFams == famModel)
    // twins share their base family; each such family has exactly 2 members
    (16 to 19).foreach(i => assert(gotFams(i)._3 == i - 16 && gotFams(i)._4 == 2))
    val gotPairs = Perceptual.dhashNearPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val pairModel = (for {
      a <- 0 until Perceptual.NumImages
      b <- (a + 1) until Perceptual.NumImages
      d = java.lang.Long.bitCount(hs(a) ^ hs(b))
      if d <= Perceptual.HammingMax
    } yield (a.toLong, b.toLong, d.toLong)).sortBy(t => (t._1, t._2))
    assert(gotPairs == pairModel)
    // expected census: 4 twin pairs at 0, and the retouched cohort at 3
    assert(gotPairs.count(_._3 == 0L) == 4)
    assert(gotPairs.count(_._3 == 3L) == 8,
      "each base 0..3 pairs with its retouch at 3 AND its twin pairs with the retouch")
  }
}

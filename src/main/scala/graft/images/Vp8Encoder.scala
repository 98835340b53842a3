package graft.images

import java.awt.image.BufferedImage

/** Pure-JVM VP8 (lossy WebP) KEYFRAME encoder — the write side of the
  * conversion matrix's lossy cell, paired with [[Vp8]] (decode). With
  * [[Vp8l]] (lossless encode+decode) this makes the WebP story
  * byte-complete in both directions without any native codec.
  *
  * Reference behavior this backs: the reference's WebP conversion cell
  * (modules/other_tasks.py:59-60 saves via PIL, which writes lossy VP8
  * by default). Architecture is NOT ported from anywhere: it is the
  * RFC 6386 decode pipeline run in reverse, reusing this package's own
  * decoder primitives for the in-loop reconstruction so the encoder's
  * idea of the decoded image is BIT-IDENTICAL to what any conformant
  * decoder produces (`Vp8EncoderSpec` asserts recon == [[Vp8.decodeYuv]]
  * exactly; tools/check_webp_encoder.py --lossy cross-checks libwebp).
  *
  * Deliberate simplifications (all stream-legal, none observable by a
  * decoder as nonconformance):
  *  - keyframes only (still WebP carries exactly one);
  *  - 16x16 intra modes only (DC/V/H/TM chosen per-MB by SAD against
  *    the reconstructed neighbors; no 4x4 B-mode search);
  *  - one segment, one token partition, default coefficient
  *    probabilities (the 1056 update flags are written as 0);
  *  - loop filter level 0: reconstruction needs no encoder-side filter
  *    and stays pixel-exact against the decoder by construction;
  *  - flat quantizer from the quality knob (all five deltas 0),
  *    round-to-nearest quantization, no trellis/RDO.
  *
  * The rate cost of fixed probabilities is real but bounded (default
  * tables are tuned for typical photographic residual statistics); the
  * goal is a CORRECT, validated writer, not parity with libwebp's
  * rate-distortion machinery.
  */
object Vp8Encoder {

  // ------------------------------------------------ boolean encoder

  /** RFC 6386 §7 arithmetic encoder — the exact inverse of [[Vp8.Bool]]:
    * same split arithmetic, renormalization when range < 128, carry
    * propagated into already-emitted bytes. `Vp8EncoderSpec` round-trips
    * random (prob, bit) sequences through [[Vp8.Bool]]. */
  private[images] final class BoolEnc {
    private var buf = new Array[Byte](1 << 12)
    private var n = 0
    private var range = 255
    private var bottom = 0L // low edge of the interval, 32-bit window
    private var bitCount = 24 // shifts until the window's top byte is full

    private def emit(b: Int): Unit = {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(n) = b.toByte; n += 1
    }
    private def carry(): Unit = {
      var i = n - 1
      while (i >= 0 && buf(i) == -1) { buf(i) = 0; i -= 1 }
      if (i >= 0) buf(i) = ((buf(i) & 0xff) + 1).toByte
    }
    def put(prob: Int, bit: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & 0x80000000L) != 0) carry()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          emit(((bottom >> 24) & 0xff).toInt)
          bottom &= 0xffffffL
          bitCount = 8
        }
      }
    }
    /** n fixed-prob-128 bits, MSB first (inverse of Bool.literal). */
    def literal(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { put(128, (v >> i) & 1); i -= 1 }
    }
    def bytes(): Array[Byte] = {
      // flush: the window still holds `bitCount` pending shifts; align to
      // a bit boundary (checking the carry that alignment can produce),
      // then drain the 32-bit window as four bytes
      var v = bottom
      if ((v & (1L << (32 - bitCount))) != 0) carry()
      v = (v << (bitCount & 7)) & 0xffffffffL
      var k = bitCount >> 3
      while (k > 0) { v = (v << 8) & 0xffffffffL; k -= 1 }
      k = 4
      while (k > 0) {
        emit(((v >> 24) & 0xff).toInt)
        v = (v << 8) & 0xffffffffL
        k -= 1
      }
      java.util.Arrays.copyOf(buf, n)
    }
  }

  // ------------------------------------------------ forward transforms

  /** Forward 4x4 DCT matched to [[Vp8.idct4x4]] (classic VP8 integer
    * lifting: 2217/5352 ~ 4*sqrt(2)cos,sin(pi/8) << 9-scaled); spec
    * asserts idct(fdct(r)) == r within ±1 per sample. In/out row-major. */
  private[images] def fdct4x4(src: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val d0 = src(4 * i); val d1 = src(4 * i + 1)
      val d2 = src(4 * i + 2); val d3 = src(4 * i + 3)
      val a0 = d0 + d3; val a1 = d1 + d2
      val a2 = d1 - d2; val a3 = d0 - d3
      tmp(4 * i) = (a0 + a1) * 8
      tmp(4 * i + 2) = (a0 - a1) * 8
      tmp(4 * i + 1) = (a2 * 2217 + a3 * 5352 + 1812) >> 9
      tmp(4 * i + 3) = (a3 * 2217 - a2 * 5352 + 937) >> 9
      i += 1
    }
    var j = 0
    while (j < 4) {
      val a0 = tmp(j) + tmp(12 + j); val a1 = tmp(4 + j) + tmp(8 + j)
      val a2 = tmp(4 + j) - tmp(8 + j); val a3 = tmp(j) - tmp(12 + j)
      out(j) = (a0 + a1 + 7) >> 4
      out(8 + j) = (a0 - a1 + 7) >> 4
      out(4 + j) = ((a2 * 2217 + a3 * 5352 + 12000) >> 16) + (if (a3 != 0) 1 else 0)
      out(12 + j) = (a3 * 2217 - a2 * 5352 + 51000) >> 16
      j += 1
    }
  }

  /** Forward Walsh-Hadamard for the Y2 DC plane. Derived from
    * [[Vp8.inverseWht]]: the 1-D stage there is the symmetric Hadamard H
    * with H*H = 4I and a final /8, so the forward is (H x H) >> 1 — same
    * butterfly pairing, half-scale output. iwht(fwht(x)) == x exactly for
    * even sums (±1 otherwise), asserted in spec. */
  private[images] def fwht(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a0 = in(4 * i) + in(4 * i + 3); val a1 = in(4 * i + 1) + in(4 * i + 2)
      val a2 = in(4 * i + 1) - in(4 * i + 2); val a3 = in(4 * i) - in(4 * i + 3)
      tmp(4 * i) = a0 + a1; tmp(4 * i + 1) = a3 + a2
      tmp(4 * i + 2) = a0 - a1; tmp(4 * i + 3) = a3 - a2
      i += 1
    }
    i = 0
    while (i < 4) {
      val a0 = tmp(i) + tmp(12 + i); val a1 = tmp(4 + i) + tmp(8 + i)
      val a2 = tmp(4 + i) - tmp(8 + i); val a3 = tmp(i) - tmp(12 + i)
      out(i) = (a0 + a1) >> 1
      out(4 + i) = (a3 + a2) >> 1
      out(8 + i) = (a0 - a1) >> 1
      out(12 + i) = (a3 - a2) >> 1
      i += 1
    }
  }

  // ------------------------------------------------ token writing

  private def writeLarge(be: BoolEnc, p: Array[Int], v: Int): Unit = {
    if (v <= 4) {
      be.put(p(3), 0)
      if (v == 2) be.put(p(4), 0)
      else { be.put(p(4), 1); be.put(p(5), v - 3) }
    } else if (v <= 10) {
      be.put(p(3), 1); be.put(p(6), 0)
      if (v <= 6) { be.put(p(7), 0); be.put(Vp8Tables.Cat1(0), v - 5) }
      else {
        be.put(p(7), 1)
        val d = v - 7
        be.put(Vp8Tables.Cat2(0), (d >> 1) & 1)
        be.put(Vp8Tables.Cat2(1), d & 1)
      }
    } else {
      be.put(p(3), 1); be.put(p(6), 1)
      val cat = if (v <= 18) 0 else if (v <= 34) 1 else if (v <= 66) 2 else 3
      val bit1 = cat >> 1
      be.put(p(8), bit1)
      be.put(p(9 + bit1), cat & 1)
      val tab = cat match {
        case 0 => Vp8Tables.Cat3
        case 1 => Vp8Tables.Cat4
        case 2 => Vp8Tables.Cat5
        case _ => Vp8Tables.Cat6
      }
      val res = v - (3 + (8 << cat))
      var i = 0
      while (i < tab.length) {
        be.put(tab(i), (res >> (tab.length - 1 - i)) & 1)
        i += 1
      }
    }
  }

  /** Write one block's coefficient tokens — the exact inverse of
    * [[Vp8.getCoeffs]] with the default probability tables. `levels` is
    * zigzag-scan-order quantized levels (signed). Returns the nnz flag
    * the decoder's context bookkeeping would record. */
  private def writeCoeffs(be: BoolEnc, probas: Array[Array[Array[Int]]],
                          ctx0: Int, first: Int, levels: Array[Int]): Int = {
    val bands = Vp8Tables.Bands
    var last = -1
    var i = first
    while (i < 16) { if (levels(i) != 0) last = i; i += 1 }
    if (last < 0) {
      be.put(probas(bands(first))(ctx0)(0), 0) // immediate end-of-block
      return 0
    }
    var n = first
    var p = probas(bands(n))(ctx0)
    var done = false
    while (!done) {
      be.put(p(0), 1) // not EOB: a (possibly zero-run-prefixed) coeff follows
      while (levels(n) == 0) {
        be.put(p(1), 0); n += 1; p = probas(bands(n))(0)
      }
      be.put(p(1), 1)
      val v = levels(n)
      val av = if (v < 0) -v else v
      val nextBand = bands(n + 1)
      var nextCtx = 1
      if (av == 1) be.put(p(2), 0)
      else { be.put(p(2), 1); writeLarge(be, p, av); nextCtx = 2 }
      be.put(128, if (v < 0) 1 else 0)
      n += 1
      if (n == 16) done = true
      else {
        p = probas(nextBand)(nextCtx)
        if (n > last) { be.put(p(0), 0); done = true }
      }
    }
    1
  }

  // ------------------------------------------------ quantization

  /** Mirror of the decoder's parseQuant with all five deltas 0. */
  private def dequantTables(q: Int): (Array[Int], Array[Int], Array[Int]) = {
    val dc = Vp8Tables.DcTable; val ac = Vp8Tables.AcTable
    val y1 = Array(dc(Vp8.clip(q, 127)), ac(Vp8.clip(q, 127)))
    val y2 = Array(dc(Vp8.clip(q, 127)) * 2,
      math.max(8, (ac(Vp8.clip(q, 127)) * 101581) >> 16))
    val uv = Array(dc(Vp8.clip(q, 117)), ac(Vp8.clip(q, 127)))
    (y1, y2, uv)
  }

  private def quantize(coeff: Int, dq: Int): Int = {
    val av = if (coeff < 0) -coeff else coeff
    val lv0 = (av + (dq >> 1)) / dq
    val lv = if (lv0 > 2047) 2047 else lv0 // token ceiling (Cat6 max)
    if (coeff < 0) -lv else lv
  }

  // ------------------------------------------------ color conversion

  // BT.601 limited-range, the inverse of the decoder's yuvToR/G/B matrix
  private def rgbToY(r: Int, g: Int, b: Int): Int =
    (16839 * r + 33059 * g + 6420 * b + (16 << 16) + (1 << 15)) >> 16
  private def rgbToU(r: Int, g: Int, b: Int): Int =
    (-9719 * r - 19081 * g + 28800 * b + (128 << 16) + (1 << 15)) >> 16
  private def rgbToV(r: Int, g: Int, b: Int): Int =
    (28800 * r - 24116 * g - 4684 * b + (128 << 16) + (1 << 15)) >> 16

  // ------------------------------------------------ encode

  /** Encode ARGB pixels as lossy WebP (VP8 keyframe in a RIFF container).
    * `quality` 0..100 maps linearly onto the spec's 127..0 quantizer
    * index. Alpha is composited over black (VP8 carries no alpha). */
  def encode(img: BufferedImage, quality: Int = 75): Array[Byte] =
    encodeWithRecon(img, quality)._1

  /** Test hook: also returns the encoder's in-loop reconstruction, which
    * must equal [[Vp8.decodeYuv]] of the returned bytes EXACTLY. */
  private[images] def encodeWithRecon(img: BufferedImage,
                                      quality: Int): (Array[Byte], Vp8.Yuv) = {
    val w = img.getWidth; val h = img.getHeight
    require(w >= 1 && h >= 1 && w <= 16383 && h <= 16383,
      s"VP8 dims out of range: ${w}x$h")
    val q = Vp8.clip(127 - (quality * 127) / 100, 127)
    val (y1dq, y2dq, uvdq) = dequantTables(q)
    val probas: Array[Array[Array[Array[Int]]]] =
      Array.tabulate(4, 8, 3, 11) { (t, b, c, p) =>
        Vp8Tables.CoeffsProba0(((t * 8 + b) * 3 + c) * 11 + p)
      }

    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val pw = mbW * 16; val ph = mbH * 16
    val cw = pw >> 1; val chh = ph >> 1

    // --- source planes, edge-replicated to whole macroblocks
    val srcY = new Array[Int](pw * ph)
    val srcU = new Array[Int](cw * chh)
    val srcV = new Array[Int](cw * chh)
    val argb = img.getRGB(0, 0, w, h, null, 0, w)
    run2d(ph, pw) { (yy, xx) =>
      val sx = if (xx < w) xx else w - 1
      val sy = if (yy < h) yy else h - 1
      val p = argb(sy * w + sx)
      val a = (p >>> 24) & 0xff
      val r = (((p >>> 16) & 0xff) * a) / 255
      val g = (((p >>> 8) & 0xff) * a) / 255
      val b = ((p & 0xff) * a) / 255
      srcY(yy * pw + xx) = rgbToY(r, g, b)
    }
    run2d(chh, cw) { (cy, cx) =>
      var sr = 0; var sg = 0; var sb = 0
      var dy = 0
      while (dy < 2) {
        var dx = 0
        while (dx < 2) {
          val sx = math.min(cx * 2 + dx, w - 1)
          val sy = math.min(cy * 2 + dy, h - 1)
          val p = argb(sy * w + sx)
          val a = (p >>> 24) & 0xff
          sr += (((p >>> 16) & 0xff) * a) / 255
          sg += (((p >>> 8) & 0xff) * a) / 255
          sb += ((p & 0xff) * a) / 255
          dx += 1
        }
        dy += 1
      }
      srcU(cy * cw + cx) = rgbToU((sr + 2) >> 2, (sg + 2) >> 2, (sb + 2) >> 2)
      srcV(cy * cw + cx) = rgbToV((sr + 2) >> 2, (sg + 2) >> 2, (sb + 2) >> 2)
    }

    // --- reconstruction planes with the decoder's virtual borders
    val yStride = 1 + pw; val cStride = 1 + cw
    val yPlane = new Array[Byte](yStride * (1 + ph))
    val uPlane = new Array[Byte](cStride * (1 + chh))
    val vPlane = new Array[Byte](cStride * (1 + chh))
    Vp8.initBorders(yPlane, yStride, uPlane, vPlane, cStride)

    // --- per-MB analysis in raster order (predictions read recon pixels)
    val nMb = mbW * mbH
    val ymodes = new Array[Int](nMb)
    val uvmodes = new Array[Int](nMb)
    val skip = new Array[Boolean](nMb)
    // zigzag-order levels: [mb][25 blocks x 16] — 0..15 luma AC, 16..19 U,
    // 20..23 V, 24 = Y2; plus the token ctx captured per block
    val levels = new Array[Array[Short]](nMb)
    val ctxs = new Array[Array[Byte]](nMb)

    val topY = new Array[Int](4 * mbW); val topU = new Array[Int](2 * mbW)
    val topV = new Array[Int](2 * mbW); val topY2 = new Array[Int](mbW)
    val leftY = new Array[Int](4); val leftU = new Array[Int](2)
    val leftV = new Array[Int](2); var leftY2 = 0

    val blk = new Array[Int](16)
    val fout = new Array[Int](16)
    val dcs = new Array[Int](16)
    val whtOut = new Array[Int](16)
    val coeffs = new Array[Int](384)
    val y2deq = new Array[Int](16)

    var mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftY, 0); java.util.Arrays.fill(leftU, 0)
      java.util.Arrays.fill(leftV, 0); leftY2 = 0
      var mbX = 0
      while (mbX < mbW) {
        val i = mbY * mbW + mbX
        val x0 = mbX * 16; val y0 = mbY * 16
        val cx0 = mbX * 8; val cy0 = mbY * 8
        val hasTop = mbY > 0; val hasLeft = mbX > 0

        // mode search by SAD over trial predictions (neighbors are recon)
        var bestY = Vp8.BDc; var bestYSad = Int.MaxValue
        var m = 0
        while (m < 4) {
          Vp8.predictBlock(yPlane, yStride, x0, y0, 16, m, hasTop, hasLeft)
          val s = sad(yPlane, yStride, x0, y0, 16, srcY, pw)
          if (s < bestYSad) { bestYSad = s; bestY = m }
          m += 1
        }
        var bestUv = Vp8.BDc; var bestUvSad = Int.MaxValue
        m = 0
        while (m < 4) {
          Vp8.predictBlock(uPlane, cStride, cx0, cy0, 8, m, hasTop, hasLeft)
          Vp8.predictBlock(vPlane, cStride, cx0, cy0, 8, m, hasTop, hasLeft)
          val s = sad(uPlane, cStride, cx0, cy0, 8, srcU, cw) +
            sad(vPlane, cStride, cx0, cy0, 8, srcV, cw)
          if (s < bestUvSad) { bestUvSad = s; bestUv = m }
          m += 1
        }
        ymodes(i) = bestY; uvmodes(i) = bestUv

        // re-predict the winners, then transform + quantize the residual
        Vp8.predictBlock(yPlane, yStride, x0, y0, 16, bestY, hasTop, hasLeft)
        Vp8.predictBlock(uPlane, cStride, cx0, cy0, 8, bestUv, hasTop, hasLeft)
        Vp8.predictBlock(vPlane, cStride, cx0, cy0, 8, bestUv, hasTop, hasLeft)

        val lv = new Array[Short](25 * 16)
        val cx = new Array[Byte](25)
        java.util.Arrays.fill(coeffs, 0)

        var b = 0
        while (b < 16) {
          val bx = x0 + (b % 4) * 4; val by = y0 + (b / 4) * 4
          residual(yPlane, yStride, bx, by, srcY, pw, blk)
          fdct4x4(blk, fout)
          dcs(b) = fout(0)
          var n = 1
          while (n < 16) {
            val l = quantize(fout(Vp8Tables.Zigzag(n)), y1dq(1))
            lv(b * 16 + n) = l.toShort
            coeffs(b * 16 + Vp8Tables.Zigzag(n)) = l * y1dq(1)
            n += 1
          }
          b += 1
        }
        fwht(dcs, whtOut)
        var n = 0
        while (n < 16) {
          val zz = Vp8Tables.Zigzag(n)
          val l = quantize(whtOut(zz), if (n == 0) y2dq(0) else y2dq(1))
          lv(24 * 16 + n) = l.toShort
          y2deq(zz) = l * (if (n == 0) y2dq(0) else y2dq(1))
          n += 1
        }
        b = 0
        while (b < 8) {
          val plane = if (b < 4) uPlane else vPlane
          val srcC = if (b < 4) srcU else srcV
          val k = b % 4
          val bx = cx0 + (k % 2) * 4; val by = cy0 + (k / 2) * 4
          residual(plane, cStride, bx, by, srcC, cw, blk)
          fdct4x4(blk, fout)
          n = 0
          while (n < 16) {
            val l = quantize(fout(Vp8Tables.Zigzag(n)), if (n == 0) uvdq(0) else uvdq(1))
            lv((16 + b) * 16 + n) = l.toShort
            coeffs((16 + b) * 16 + Vp8Tables.Zigzag(n)) =
              l * (if (n == 0) uvdq(0) else uvdq(1))
            n += 1
          }
          b += 1
        }

        var any = false
        var k = 0
        while (k < lv.length) { if (lv(k) != 0) any = true; k += 1 }
        skip(i) = !any
        levels(i) = lv

        // token contexts + nnz bookkeeping, mirroring parseResiduals
        if (!any) {
          var j = 0
          while (j < 4) { leftY(j) = 0; topY(4 * mbX + j) = 0; j += 1 }
          j = 0
          while (j < 2) {
            leftU(j) = 0; topU(2 * mbX + j) = 0
            leftV(j) = 0; topV(2 * mbX + j) = 0
            j += 1
          }
          leftY2 = 0; topY2(mbX) = 0
          ctxs(i) = cx
        } else {
          cx(24) = (leftY2 + topY2(mbX)).toByte
          val y2nz = if (nonzero(lv, 24, 0)) 1 else 0
          leftY2 = y2nz; topY2(mbX) = y2nz
          var by = 0
          while (by < 4) {
            var l = leftY(by)
            var bx = 0
            while (bx < 4) {
              val bi = by * 4 + bx
              cx(bi) = (l + topY(4 * mbX + bx)).toByte
              l = if (nonzero(lv, bi, 1)) 1 else 0
              topY(4 * mbX + bx) = l
              bx += 1
            }
            leftY(by) = l
            by += 1
          }
          var ch = 0
          while (ch < 2) {
            val topC = if (ch == 0) topU else topV
            val leftC = if (ch == 0) leftU else leftV
            val base = if (ch == 0) 16 else 20
            var cy = 0
            while (cy < 2) {
              var l = leftC(cy)
              var cxx = 0
              while (cxx < 2) {
                val bi = base + cy * 2 + cxx
                cx(bi) = (l + topC(2 * mbX + cxx)).toByte
                l = if (nonzero(lv, bi, 0)) 1 else 0
                topC(2 * mbX + cxx) = l
                cxx += 1
              }
              leftC(cy) = l
              cy += 1
            }
            ch += 1
          }
          ctxs(i) = cx
        }

        // in-loop reconstruction via the DECODER's own path
        inverseWhtInto(y2deq, coeffs)
        Vp8.reconstructMb(mbX, mbY, mbW, i4 = false, ymodes(i), uvmodes(i),
          null, coeffs, yPlane, yStride, uPlane, vPlane, cStride)
        mbX += 1
      }
      mbY += 1
    }

    // --- serialize: part 0 (header + modes)
    var skipped = 0
    var i = 0
    while (i < nMb) { if (skip(i)) skipped += 1; i += 1 }
    val skipProb =
      Vp8.clip(((nMb - skipped) * 255 + nMb / 2) / nMb, 254) match {
        case 0 => 1
        case p => p
      }

    val be0 = new BoolEnc
    be0.put(128, 0) // color space
    be0.put(128, 0) // clamping
    be0.put(128, 0) // no segmentation
    be0.put(128, 0) // normal (not simple) loop filter
    be0.literal(0, 6) // filter level 0 → decoder skips filtering entirely
    be0.literal(0, 3) // sharpness
    be0.put(128, 0) // no lf deltas
    be0.literal(0, 2) // log2(token partitions) = 0 → one partition
    be0.literal(q, 7) // base quantizer index
    var d = 0
    while (d < 5) { be0.put(128, 0); d += 1 } // y1dc/y2dc/y2ac/uvdc/uvac deltas
    be0.put(128, 0) // refresh entropy probs (no-op for a still)
    var t = 0
    while (t < 4 * 8 * 3 * 11) { // keep every default coefficient prob
      be0.put(Vp8Tables.CoeffsUpdateProba(t), 0)
      t += 1
    }
    be0.put(128, 1) // mb_no_skip_coeff enabled
    be0.literal(skipProb, 8)
    i = 0
    while (i < nMb) {
      be0.put(skipProb, if (skip(i)) 1 else 0)
      be0.put(145, 1) // not B_PRED (16x16 mode)
      ymodes(i) match { // inverse of the decoder's kf y-mode tree
        case Vp8.BDc => be0.put(156, 0); be0.put(163, 0)
        case Vp8.BVe => be0.put(156, 0); be0.put(163, 1)
        case Vp8.BHe => be0.put(156, 1); be0.put(128, 0)
        case _ => be0.put(156, 1); be0.put(128, 1) // TM
      }
      uvmodes(i) match { // inverse of the uv-mode tree
        case Vp8.BDc => be0.put(142, 0)
        case Vp8.BVe => be0.put(142, 1); be0.put(114, 0)
        case Vp8.BTm => be0.put(142, 1); be0.put(114, 1); be0.put(183, 1)
        case _ => be0.put(142, 1); be0.put(114, 1); be0.put(183, 0) // HE
      }
      i += 1
    }
    val part0 = be0.bytes()
    require(part0.length < (1 << 19), "VP8 first-partition size field is 19 bits")

    // --- serialize: token partition
    val be1 = new BoolEnc
    val lvInt = new Array[Int](16)
    i = 0
    while (i < nMb) {
      if (!skip(i)) {
        val lv = levels(i); val cx = ctxs(i)
        copyLv(lv, 24, lvInt)
        writeCoeffs(be1, probas(1), cx(24), 0, lvInt) // Y2
        var b = 0
        while (b < 16) {
          copyLv(lv, b, lvInt)
          writeCoeffs(be1, probas(0), cx(b), 1, lvInt) // luma AC (type 0)
          b += 1
        }
        b = 16
        while (b < 24) {
          copyLv(lv, b, lvInt)
          writeCoeffs(be1, probas(2), cx(b), 0, lvInt) // chroma
          b += 1
        }
      }
      i += 1
    }
    val part1 = be1.bytes()

    // --- frame + container assembly
    val tag = (part0.length << 5) | (1 << 4) // keyframe(0), version 0, shown
    val head = Array[Byte](
      (tag & 0xff).toByte, ((tag >> 8) & 0xff).toByte, ((tag >> 16) & 0xff).toByte,
      0x9d.toByte, 0x01.toByte, 0x2a.toByte,
      (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte, // scale 0
      (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte)
    val payload = head ++ part0 ++ part1
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val pad = if ((payload.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
    val file = "RIFF".getBytes("ISO-8859-1") ++
      le32(4 + 8 + payload.length + pad.length) ++
      "WEBP".getBytes("ISO-8859-1") ++ "VP8 ".getBytes("ISO-8859-1") ++
      le32(payload.length) ++ payload ++ pad

    // crop the recon planes to the real dimensions (decoder-identical)
    val ccw = (w + 1) / 2; val cch = (h + 1) / 2
    val yOut = new Array[Byte](w * h)
    val uOut = new Array[Byte](ccw * cch)
    val vOut = new Array[Byte](ccw * cch)
    var r = 0
    while (r < h) {
      System.arraycopy(yPlane, (r + 1) * yStride + 1, yOut, r * w, w)
      r += 1
    }
    r = 0
    while (r < cch) {
      System.arraycopy(uPlane, (r + 1) * cStride + 1, uOut, r * ccw, ccw)
      System.arraycopy(vPlane, (r + 1) * cStride + 1, vOut, r * ccw, ccw)
      r += 1
    }
    (file, Vp8.Yuv(w, h, yOut, uOut, vOut))
  }

  // ------------------------------------------------ small helpers

  private def run2d(rows: Int, cols: Int)(f: (Int, Int) => Unit): Unit = {
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < cols) { f(y, x); x += 1 }
      y += 1
    }
  }

  private def sad(p: Array[Byte], stride: Int, x0: Int, y0: Int, n: Int,
                  src: Array[Int], sw: Int): Int = {
    var s = 0
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val dpx = Vp8.px(p, stride, x0 + x, y0 + y) - src((y0 + y) * sw + (x0 + x))
        s += (if (dpx < 0) -dpx else dpx)
        x += 1
      }
      y += 1
    }
    s
  }

  /** 4x4 residual = source - prediction (prediction sits in the plane). */
  private def residual(p: Array[Byte], stride: Int, x0: Int, y0: Int,
                       src: Array[Int], sw: Int, out: Array[Int]): Unit = {
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        out(y * 4 + x) =
          src((y0 + y) * sw + (x0 + x)) - Vp8.px(p, stride, x0 + x, y0 + y)
        x += 1
      }
      y += 1
    }
  }

  private def nonzero(lv: Array[Short], block: Int, first: Int): Boolean = {
    var n = first
    while (n < 16) { if (lv(block * 16 + n) != 0) return true; n += 1 }
    false
  }

  private def copyLv(lv: Array[Short], block: Int, out: Array[Int]): Unit = {
    var n = 0
    while (n < 16) { out(n) = lv(block * 16 + n); n += 1 }
  }

  private def inverseWhtInto(y2deq: Array[Int], coeffs: Array[Int]): Unit =
    Vp8.inverseWht(y2deq, coeffs)
}

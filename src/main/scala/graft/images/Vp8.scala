package graft.images

import java.awt.image.BufferedImage

/** Pure-JVM VP8 (lossy WebP) KEYFRAME decoder, written to RFC 6386 — the
  * other half of the WebP conversion matrix beside [[Vp8l]] (lossless).
  * Still-image WebP files carry exactly one VP8 keyframe, so the
  * inter-frame machinery (motion vectors, reference buffers, probability
  * persistence) is out of scope by format construction.
  *
  * Decode pipeline (all integer, per the spec):
  *  1. boolean arithmetic decoder over the header/mode partition and the
  *     1-8 token partitions;
  *  2. keyframe header: segmentation, loop-filter config, quantizers,
  *     coefficient-probability updates (against
  *     [[Vp8Tables.CoeffsUpdateProba]]);
  *  3. per-MB intra modes (16x16 DC/V/H/TM or 16 4x4 B-modes with
  *     above/left context trees), chroma modes;
  *  4. DCT/WHT coefficient tokens (band+context probabilities),
  *     dequantization, 4x4 inverse DCT and Walsh-Hadamard for Y2;
  *  5. intra prediction + residual reconstruction (UNFILTERED pixels feed
  *     later predictions, per the spec);
  *  6. in-place loop filter (simple or normal) over MBs in raster order.
  *
  * Validated byte-exactly against libwebp's own YUV output over the
  * committed fixtures (`Vp8Spec`); the RGBA conversion mirrors libwebp's
  * fancy upsampler (src/test resources hold its RGBA as golden too).
  * Coefficient/probability constant tables are RFC 6386 normative values
  * (see [[Vp8Tables]]).
  */
object Vp8 {

  final case class Yuv(width: Int, height: Int,
                       y: Array[Byte], u: Array[Byte], v: Array[Byte]) {
    val chromaW: Int = (width + 1) / 2
    val chromaH: Int = (height + 1) / 2
  }

  /** Decode a WebP file (or bare VP8 payload) to cropped YUV420 planes.
    * None when the bytes are not a lossy-WebP keyframe or are corrupt. */
  def decodeYuv(bytes: Array[Byte]): Option[Yuv] =
    try vp8Payload(bytes).flatMap(decodeFrame)
    catch { case _: Exception => None }

  /** Decode to RGBA pixels (libwebp fancy-upsampler arithmetic). */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    decodeYuv(bytes).map { f =>
      val argb = upsampleArgb(f)
      val img = new BufferedImage(f.width, f.height, BufferedImage.TYPE_INT_ARGB)
      img.setRGB(0, 0, f.width, f.height, argb, 0, f.width)
      img
    }

  /** The 'VP8 ' chunk payload out of a RIFF/WEBP container; bare VP8
    * keyframe payloads (frame tag + 9d012a start code) pass through. */
  private[images] def vp8Payload(b: Array[Byte]): Option[Array[Byte]] = {
    def tag(off: Int, t: String): Boolean =
      b.length >= off + 4 && t.indices.forall(i => (b(off + i) & 0xff) == t.charAt(i))
    def startCode(off: Int): Boolean =
      b.length >= off + 6 && (b(off + 3) & 0xff) == 0x9d &&
        (b(off + 4) & 0xff) == 0x01 && (b(off + 5) & 0xff) == 0x2a
    if (!tag(0, "RIFF") && startCode(0)) return Some(b)
    if (!tag(0, "RIFF") || !tag(8, "WEBP")) return None
    var i = 12
    while (i + 8 <= b.length) {
      val size = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
        ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
      if (tag(i, "VP8 ")) {
        val start = i + 8
        val end = math.min(b.length, start + size)
        return Some(java.util.Arrays.copyOfRange(b, start, end))
      }
      i += 8 + size + (size & 1)
    }
    None
  }

  // ------------------------------------------------ boolean decoder

  /** RFC 6386 §7 boolean arithmetic decoder. */
  private[images] final class Bool(buf: Array[Byte], var pos: Int, end: Int) {
    private var range = 255
    private var value = (next() << 8) | next()
    private var bitCount = 0

    private def next(): Int = {
      val b = if (pos < end) buf(pos) & 0xff else 0
      pos += 1
      b
    }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= next() }
      }
      ret
    }

    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** literal(n) then sign bit. */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }

    /** magnitude with its own sign bit (coefficient sign). */
    def signed(v: Int): Int = if (bool(128) == 1) -v else v
  }

  // ------------------------------------------------ parsed header state

  private val NumSegments = 4

  private final class Header {
    var useSegment = false
    var updateMap = false
    var absoluteDelta = false
    val segQuant = new Array[Int](NumSegments)
    val segFilter = new Array[Int](NumSegments)
    val segTreeProbs = Array(255, 255, 255)
    var simpleFilter = false
    var filterLevel = 0
    var sharpness = 0
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    var useSkipProba = false
    var skipProba = 0
    // probas[type][band][ctx][tokenProb]
    val probas: Array[Array[Array[Array[Int]]]] =
      Array.tabulate(4, 8, 3, 11) { (t, b, c, p) =>
        Vp8Tables.CoeffsProba0(((t * 8 + b) * 3 + c) * 11 + p)
      }
    // per-segment dequant pairs
    val y1dq = Array.ofDim[Int](NumSegments, 2)
    val y2dq = Array.ofDim[Int](NumSegments, 2)
    val uvdq = Array.ofDim[Int](NumSegments, 2)
  }

  private[images] def clip(v: Int, max: Int): Int = if (v < 0) 0 else if (v > max) max else v

  // ------------------------------------------------ frame decode

  private[images] def decodeFrame(d: Array[Byte]): Option[Yuv] = {
    if (d.length < 10) return None
    val tag = (d(0) & 0xff) | ((d(1) & 0xff) << 8) | ((d(2) & 0xff) << 16)
    val keyframe = (tag & 1) == 0
    val part0Size = tag >> 5
    if (!keyframe) return None
    if ((d(3) & 0xff) != 0x9d || (d(4) & 0xff) != 0x01 || (d(5) & 0xff) != 0x2a) return None
    val width = ((d(6) & 0xff) | ((d(7) & 0xff) << 8)) & 0x3fff
    val height = ((d(8) & 0xff) | ((d(9) & 0xff) << 8)) & 0x3fff
    if (width == 0 || height == 0) return None
    if (10 + part0Size > d.length) return None

    val br = new Bool(d, 10, 10 + part0Size)
    val hdr = new Header

    br.bool(128) // color space (must be 0 for valid streams; tolerated)
    br.bool(128) // clamping type
    hdr.useSegment = br.bool(128) == 1
    if (hdr.useSegment) parseSegmentHeader(br, hdr)
    hdr.simpleFilter = br.bool(128) == 1
    hdr.filterLevel = br.literal(6)
    hdr.sharpness = br.literal(3)
    hdr.lfDeltaEnabled = br.bool(128) == 1
    if (hdr.lfDeltaEnabled && br.bool(128) == 1) {
      var i = 0
      while (i < 4) {
        if (br.bool(128) == 1) hdr.refLfDelta(i) = br.signedLiteral(6)
        i += 1
      }
      i = 0
      while (i < 4) {
        if (br.bool(128) == 1) hdr.modeLfDelta(i) = br.signedLiteral(6)
        i += 1
      }
    }
    val numParts = 1 << br.literal(2)

    // token partitions: sizes trail the first partition
    val partArea = 10 + part0Size
    val sizesEnd = partArea + 3 * (numParts - 1)
    if (sizesEnd > d.length) return None
    val partBr = new Array[Bool](numParts)
    var off = sizesEnd
    var p = 0
    while (p < numParts) {
      val size =
        if (p < numParts - 1) {
          val s = partArea + 3 * p
          (d(s) & 0xff) | ((d(s + 1) & 0xff) << 8) | ((d(s + 2) & 0xff) << 16)
        } else d.length - off
      if (off + size > d.length || size < 0) return None
      partBr(p) = new Bool(d, off, off + size)
      off += size
      p += 1
    }

    parseQuant(br, hdr)
    br.bool(128) // refresh entropy probs (keyframe: no-op for a still)
    parseProbaUpdates(br, hdr)
    hdr.useSkipProba = br.bool(128) == 1
    if (hdr.useSkipProba) hdr.skipProba = br.literal(8)

    val mbW = (width + 15) >> 4
    val mbH = (height + 15) >> 4

    // --- per-MB mode parse (continues in partition 0, raster order)
    val segment = new Array[Int](mbW * mbH)
    val skip = new Array[Boolean](mbW * mbH)
    val isI4 = new Array[Boolean](mbW * mbH)
    val ymode = new Array[Int](mbW * mbH)
    val uvmode = new Array[Int](mbW * mbH)
    val bmodes = new Array[Array[Int]](mbW * mbH)
    val topCtx = Array.fill(4 * mbW)(BDc) // b-mode contexts
    var mbY = 0
    while (mbY < mbH) {
      val leftCtx = Array.fill(4)(BDc)
      var mbX = 0
      while (mbX < mbW) {
        val i = mbY * mbW + mbX
        if (hdr.updateMap)
          segment(i) =
            if (br.bool(hdr.segTreeProbs(0)) == 0) br.bool(hdr.segTreeProbs(1))
            else 2 + br.bool(hdr.segTreeProbs(2))
        if (hdr.useSkipProba) skip(i) = br.bool(hdr.skipProba) == 1
        isI4(i) = br.bool(145) == 0
        if (!isI4(i)) {
          val m =
            if (br.bool(156) == 1) { if (br.bool(128) == 1) BTm else BHe }
            else { if (br.bool(163) == 1) BVe else BDc }
          ymode(i) = m
          var j = 0
          while (j < 4) { topCtx(4 * mbX + j) = m; leftCtx(j) = m; j += 1 }
        } else {
          val bm = new Array[Int](16)
          var y = 0
          while (y < 4) {
            var left = leftCtx(y)
            var x = 0
            while (x < 4) {
              val top = topCtx(4 * mbX + x)
              val m = decodeBMode(br, top, left)
              bm(y * 4 + x) = m
              left = m
              topCtx(4 * mbX + x) = m
              x += 1
            }
            leftCtx(y) = left
            y += 1
          }
          bmodes(i) = bm
        }
        uvmode(i) =
          if (br.bool(142) == 0) BDc
          else if (br.bool(114) == 0) BVe
          else if (br.bool(183) == 1) BTm
          else BHe
        mbX += 1
      }
      mbY += 1
    }

    // --- reconstruction (unfiltered; predictions read unfiltered pixels)
    val yStride = 1 + mbW * 16
    val cStride = 1 + mbW * 8
    val yPlane = new Array[Byte](yStride * (1 + mbH * 16))
    val uPlane = new Array[Byte](cStride * (1 + mbH * 8))
    val vPlane = new Array[Byte](cStride * (1 + mbH * 8))
    initBorders(yPlane, yStride, uPlane, vPlane, cStride)

    val coeffs = new Array[Int](384) // 24 blocks x 16
    val y2 = new Array[Int](16)
    // nnz contexts
    val topY = new Array[Int](4 * mbW); val topU = new Array[Int](2 * mbW)
    val topV = new Array[Int](2 * mbW); val topY2 = new Array[Int](mbW)
    val leftY = new Array[Int](4); val leftU = new Array[Int](2)
    val leftV = new Array[Int](2); var leftY2 = 0
    val mbNz = new Array[Boolean](mbW * mbH) // any non-zero coeff (filter rule)

    mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftY, 0); java.util.Arrays.fill(leftU, 0)
      java.util.Arrays.fill(leftV, 0); leftY2 = 0
      val tbr = partBr(mbY % numParts)
      var mbX = 0
      while (mbX < mbW) {
        val i = mbY * mbW + mbX
        val seg = segment(i)
        var nzAny = false
        java.util.Arrays.fill(coeffs, 0)
        if (!skip(i)) {
          nzAny = parseResiduals(tbr, hdr, seg, isI4(i), mbX,
            topY, topU, topV, topY2, leftY, leftU, leftV, leftY2,
            coeffs, y2, setLeftY2 = v => leftY2 = v)
        } else {
          var j = 0
          while (j < 4) { leftY(j) = 0; topY(4 * mbX + j) = 0; j += 1 }
          j = 0
          while (j < 2) {
            leftU(j) = 0; topU(2 * mbX + j) = 0
            leftV(j) = 0; topV(2 * mbX + j) = 0
            j += 1
          }
          if (!isI4(i)) { leftY2 = 0; topY2(mbX) = 0 }
        }
        skip(i) = skip(i) || !nzAny
        mbNz(i) = nzAny
        reconstructMb(mbX, mbY, mbW, isI4(i), ymode(i), uvmode(i), bmodes(i),
          coeffs, yPlane, yStride, uPlane, vPlane, cStride)
        mbX += 1
      }
      mbY += 1
    }

    // --- loop filter, raster order in-place
    if (hdr.filterLevel > 0)
      loopFilter(hdr, segment, isI4, skip, mbW, mbH,
        yPlane, yStride, uPlane, vPlane, cStride)

    // --- crop
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    val yOut = new Array[Byte](width * height)
    val uOut = new Array[Byte](cw * ch)
    val vOut = new Array[Byte](cw * ch)
    var r = 0
    while (r < height) {
      System.arraycopy(yPlane, (r + 1) * yStride + 1, yOut, r * width, width)
      r += 1
    }
    r = 0
    while (r < ch) {
      System.arraycopy(uPlane, (r + 1) * cStride + 1, uOut, r * cw, cw)
      System.arraycopy(vPlane, (r + 1) * cStride + 1, vOut, r * cw, cw)
      r += 1
    }
    Some(Yuv(width, height, yOut, uOut, vOut))
  }

  private def parseSegmentHeader(br: Bool, hdr: Header): Unit = {
    hdr.updateMap = br.bool(128) == 1
    val updateData = br.bool(128) == 1
    if (updateData) {
      hdr.absoluteDelta = br.bool(128) == 1
      var i = 0
      while (i < NumSegments) {
        if (br.bool(128) == 1) hdr.segQuant(i) = br.signedLiteral(7)
        i += 1
      }
      i = 0
      while (i < NumSegments) {
        if (br.bool(128) == 1) hdr.segFilter(i) = br.signedLiteral(6)
        i += 1
      }
    }
    if (hdr.updateMap) {
      var i = 0
      while (i < 3) {
        hdr.segTreeProbs(i) = if (br.bool(128) == 1) br.literal(8) else 255
        i += 1
      }
    }
  }

  private def parseQuant(br: Bool, hdr: Header): Unit = {
    val baseQ = br.literal(7)
    def delta(): Int = if (br.bool(128) == 1) br.signedLiteral(4) else 0
    val y1dc = delta(); val y2dc = delta(); val y2ac = delta()
    val uvdc = delta(); val uvac = delta()
    var s = 0
    while (s < NumSegments) {
      val q =
        if (hdr.useSegment) {
          if (hdr.absoluteDelta) hdr.segQuant(s) else baseQ + hdr.segQuant(s)
        } else baseQ
      hdr.y1dq(s)(0) = Vp8Tables.DcTable(clip(q + y1dc, 127))
      hdr.y1dq(s)(1) = Vp8Tables.AcTable(clip(q, 127))
      hdr.y2dq(s)(0) = Vp8Tables.DcTable(clip(q + y2dc, 127)) * 2
      hdr.y2dq(s)(1) = {
        val v = (Vp8Tables.AcTable(clip(q + y2ac, 127)) * 101581) >> 16
        if (v < 8) 8 else v // RFC 6386 §14.1: y2 AC scaled by 155/100, min 8
      }
      hdr.uvdq(s)(0) = Vp8Tables.DcTable(clip(q + uvdc, 117))
      hdr.uvdq(s)(1) = Vp8Tables.AcTable(clip(q + uvac, 127))
      s += 1
    }
  }

  private def parseProbaUpdates(br: Bool, hdr: Header): Unit = {
    var t = 0
    while (t < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var p = 0
          while (p < 11) {
            val up = Vp8Tables.CoeffsUpdateProba(((t * 8 + b) * 3 + c) * 11 + p)
            if (br.bool(up) == 1) hdr.probas(t)(b)(c)(p) = br.literal(8)
            p += 1
          }
          c += 1
        }
        b += 1
      }
      t += 1
    }
  }

  // ------------------------------------------------ intra modes

  // libwebp enum order (context + tree leaves use this numbering; the
  // extracted KfBModesProba rows are laid out for it)
  private[images] val BDc = 0; private[images] val BTm = 1; private[images] val BVe = 2
  private[images] val BHe = 3; private val BRd = 4; private val BVr = 5
  private val BLd = 6; private val BVl = 7; private val BHd = 8
  private val BHu = 9

  private def decodeBMode(br: Bool, top: Int, left: Int): Int = {
    val off = (top * 10 + left) * 9
    val pr = Vp8Tables.KfBModesProba
    if (br.bool(pr(off)) == 0) BDc
    else if (br.bool(pr(off + 1)) == 0) BTm
    else if (br.bool(pr(off + 2)) == 0) BVe
    else if (br.bool(pr(off + 3)) == 0) {
      if (br.bool(pr(off + 4)) == 0) BHe
      else if (br.bool(pr(off + 5)) == 0) BRd
      else BVr
    } else {
      if (br.bool(pr(off + 6)) == 0) BLd
      else if (br.bool(pr(off + 7)) == 0) BVl
      else if (br.bool(pr(off + 8)) == 0) BHd
      else BHu
    }
  }

  // ------------------------------------------------ residuals

  /** RFC 6386 §13: coefficient token decode for one 4x4 block. Returns
    * the position after the last decoded coefficient (0 = empty). */
  private def getCoeffs(br: Bool, probas: Array[Array[Array[Int]]], ctx0: Int,
                        dc: Int, ac: Int, first: Int, out: Array[Int],
                        outOff: Int): Int = {
    val bands = Vp8Tables.Bands
    var n = first
    var p = probas(bands(n))(ctx0)
    var done = false
    while (!done && n < 16) {
      if (br.bool(p(0)) == 0) done = true // end of block
      else {
        var zero = true
        while (zero && !done) {
          if (br.bool(p(1)) == 1) zero = false
          else {
            n += 1
            if (n == 16) done = true
            else p = probas(bands(n))(0)
          }
        }
        if (!done) {
          val pCtxBand = bands(n + 1)
          var v = 0
          var nextCtx = 0
          if (br.bool(p(2)) == 0) { v = 1; nextCtx = 1 }
          else { v = getLargeValue(br, p); nextCtx = 2 }
          out(outOff + Vp8Tables.Zigzag(n)) =
            br.signed(v) * (if (n > 0) ac else dc)
          n += 1
          if (n == 16) done = true
          else p = probas(pCtxBand)(nextCtx)
        }
      }
    }
    n
  }

  private def getLargeValue(br: Bool, p: Array[Int]): Int = {
    if (br.bool(p(3)) == 0) {
      if (br.bool(p(4)) == 0) 2
      else 3 + br.bool(p(5))
    } else if (br.bool(p(6)) == 0) {
      if (br.bool(p(7)) == 0) 5 + boolP(br, Vp8Tables.Cat1)
      else 7 + 2 * br.bool(165) + br.bool(145)
    } else {
      val bit1 = br.bool(p(8))
      val bit0 = br.bool(p(9 + bit1))
      val cat = 2 * bit1 + bit0
      val tab = cat match {
        case 0 => Vp8Tables.Cat3
        case 1 => Vp8Tables.Cat4
        case 2 => Vp8Tables.Cat5
        case _ => Vp8Tables.Cat6
      }
      var v = 0
      var i = 0
      while (i < tab.length) { v += v + br.bool(tab(i)); i += 1 }
      v + 3 + (8 << cat)
    }
  }

  private def boolP(br: Bool, tab: Array[Int]): Int = br.bool(tab(0))

  /** Parse all residual blocks of one MB; fills `coeffs` (24 blocks of
    * 16, dequantized, zigzag-undone) and updates the nnz contexts.
    * Returns whether ANY coefficient is non-zero. */
  private def parseResiduals(br: Bool, hdr: Header, seg: Int, i4: Boolean,
                             mbX: Int, topY: Array[Int], topU: Array[Int],
                             topV: Array[Int], topY2: Array[Int],
                             leftY: Array[Int], leftU: Array[Int],
                             leftV: Array[Int], leftY2In: Int,
                             coeffs: Array[Int], y2: Array[Int],
                             setLeftY2: Int => Unit): Boolean = {
    var nzAny = false
    var first = 0
    var lumaType = 3
    java.util.Arrays.fill(y2, 0)
    if (!i4) {
      // Y2 block: the WHT-coded DC plane
      val ctx = leftY2In + topY2(mbX)
      val nz = getCoeffs(br, hdr.probas(1), ctx, hdr.y2dq(seg)(0),
        hdr.y2dq(seg)(1), 0, y2, 0)
      val f = if (nz > 0) 1 else 0
      setLeftY2(f); topY2(mbX) = f
      if (nz > 0) nzAny = true
      first = 1
      lumaType = 0
    }
    // 16 luma blocks
    var by = 0
    while (by < 4) {
      var l = leftY(by)
      var bx = 0
      while (bx < 4) {
        val ctx = l + topY(4 * mbX + bx)
        val nz = getCoeffs(br, hdr.probas(lumaType), ctx, hdr.y1dq(seg)(0),
          hdr.y1dq(seg)(1), first, coeffs, (by * 4 + bx) * 16)
        l = if (nz > first) 1 else 0
        topY(4 * mbX + bx) = l
        if (l == 1) nzAny = true
        bx += 1
      }
      leftY(by) = l
      by += 1
    }
    // 4 + 4 chroma blocks
    var ch = 0
    while (ch < 2) {
      val topC = if (ch == 0) topU else topV
      val leftC = if (ch == 0) leftU else leftV
      val base = if (ch == 0) 16 else 20
      var cy = 0
      while (cy < 2) {
        var l = leftC(cy)
        var cx = 0
        while (cx < 2) {
          val ctx = l + topC(2 * mbX + cx)
          val nz = getCoeffs(br, hdr.probas(2), ctx, hdr.uvdq(seg)(0),
            hdr.uvdq(seg)(1), 0, coeffs, (base + cy * 2 + cx) * 16)
          l = if (nz > 0) 1 else 0
          topC(2 * mbX + cx) = l
          if (l == 1) nzAny = true
          cx += 1
        }
        leftC(cy) = l
        cy += 1
      }
      ch += 1
    }
    if (!i4) {
      // inverse WHT scatters the DC plane into the luma blocks
      inverseWht(y2, coeffs)
    }
    nzAny
  }

  // ------------------------------------------------ transforms

  /** RFC 6386 §14.3 inverse 4x4 DCT, adding into nothing (coeffs buffer
    * in/out as residual values). in/out at `off`, row-major 4x4. */
  private[images] def idct4x4(c: Array[Int], off: Int, res: Array[Int]): Unit = {
    def mul1(a: Int): Int = ((a * 20091) >> 16) + a
    def mul2(a: Int): Int = (a * 35468) >> 16
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a = c(off + i) + c(off + 8 + i)
      val b = c(off + i) - c(off + 8 + i)
      val cc = mul2(c(off + 4 + i)) - mul1(c(off + 12 + i))
      val d = mul1(c(off + 4 + i)) + mul2(c(off + 12 + i))
      tmp(i) = a + d; tmp(4 + i) = b + cc
      tmp(8 + i) = b - cc; tmp(12 + i) = a - d
      i += 1
    }
    i = 0
    while (i < 4) {
      val dc = tmp(4 * i) + 4
      val a = dc + tmp(4 * i + 2)
      val b = dc - tmp(4 * i + 2)
      val cc = mul2(tmp(4 * i + 1)) - mul1(tmp(4 * i + 3))
      val d = mul1(tmp(4 * i + 1)) + mul2(tmp(4 * i + 3))
      res(4 * i) = (a + d) >> 3; res(4 * i + 1) = (b + cc) >> 3
      res(4 * i + 2) = (b - cc) >> 3; res(4 * i + 3) = (a - d) >> 3
      i += 1
    }
  }

  /** RFC 6386 §14.3 inverse Walsh-Hadamard; scatters each output into
    * the DC slot of the corresponding luma block. */
  private[images] def inverseWht(in: Array[Int], coeffs: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a0 = in(i) + in(12 + i); val a1 = in(4 + i) + in(8 + i)
      val a2 = in(4 + i) - in(8 + i); val a3 = in(i) - in(12 + i)
      tmp(i) = a0 + a1; tmp(8 + i) = a0 - a1
      tmp(4 + i) = a3 + a2; tmp(12 + i) = a3 - a2
      i += 1
    }
    i = 0
    while (i < 4) {
      val dc = tmp(4 * i) + 3
      val a0 = dc + tmp(4 * i + 3); val a1 = tmp(4 * i + 1) + tmp(4 * i + 2)
      val a2 = tmp(4 * i + 1) - tmp(4 * i + 2); val a3 = dc - tmp(4 * i + 3)
      coeffs((4 * i + 0) * 16) = (a0 + a1) >> 3
      coeffs((4 * i + 1) * 16) = (a3 + a2) >> 3
      coeffs((4 * i + 2) * 16) = (a0 - a1) >> 3
      coeffs((4 * i + 3) * 16) = (a3 - a2) >> 3
      i += 1
    }
  }

  // ------------------------------------------------ reconstruction

  private[images] def initBorders(y: Array[Byte], ys: Int, u: Array[Byte],
                          v: Array[Byte], cs: Int): Unit = {
    // virtual above row = 127 (incl. corner); virtual left column = 129
    java.util.Arrays.fill(y, 0, ys, 127.toByte)
    java.util.Arrays.fill(u, 0, cs, 127.toByte)
    java.util.Arrays.fill(v, 0, cs, 127.toByte)
    var r = 1
    while (r * ys < y.length) { y(r * ys) = 129.toByte; r += 1 }
    r = 1
    while (r * cs < u.length) { u(r * cs) = 129.toByte; v(r * cs) = 129.toByte; r += 1 }
  }

  private[images] def px(p: Array[Byte], s: Int, x: Int, y: Int): Int =
    p((y + 1) * s + (x + 1)) & 0xff

  private[images] def setPx(p: Array[Byte], s: Int, x: Int, y: Int, v: Int): Unit =
    p((y + 1) * s + (x + 1)) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Add residual block to prediction in-place. */
  private def addResidual(p: Array[Byte], s: Int, x0: Int, y0: Int,
                          res: Array[Int]): Unit = {
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        setPx(p, s, x0 + c, y0 + r, px(p, s, x0 + c, y0 + r) + res(r * 4 + c))
        c += 1
      }
      r += 1
    }
  }

  /** Block-size-generic DC/V/H/TM predictors (n = 16 luma or 8 chroma). */
  private[images] def predictBlock(p: Array[Byte], s: Int, x0: Int, y0: Int, n: Int,
                           mode: Int, hasTop: Boolean, hasLeft: Boolean): Unit = {
    mode match {
      case BDc =>
        var sum = 0
        var cnt = 0
        if (hasTop) { var i = 0; while (i < n) { sum += px(p, s, x0 + i, y0 - 1); i += 1 }; cnt += n }
        if (hasLeft) { var i = 0; while (i < n) { sum += px(p, s, x0 - 1, y0 + i); i += 1 }; cnt += n }
        val dc = if (cnt == 0) 0x80 else (sum + cnt / 2) / cnt
        var r = 0
        while (r < n) { var c = 0; while (c < n) { setPx(p, s, x0 + c, y0 + r, dc); c += 1 }; r += 1 }
      case BVe =>
        var r = 0
        while (r < n) {
          var c = 0
          while (c < n) { setPx(p, s, x0 + c, y0 + r, px(p, s, x0 + c, y0 - 1)); c += 1 }
          r += 1
        }
      case BHe =>
        var r = 0
        while (r < n) {
          val v = px(p, s, x0 - 1, y0 + r)
          var c = 0
          while (c < n) { setPx(p, s, x0 + c, y0 + r, v); c += 1 }
          r += 1
        }
      case _ => // TM
        val tl = px(p, s, x0 - 1, y0 - 1)
        var r = 0
        while (r < n) {
          val l = px(p, s, x0 - 1, y0 + r)
          var c = 0
          while (c < n) {
            setPx(p, s, x0 + c, y0 + r, clamp255(l + px(p, s, x0 + c, y0 - 1) - tl))
            c += 1
          }
          r += 1
        }
    }
  }

  /** RFC 6386 §12.3 4x4 luma predictors. `tr` = the MB-fixed above-right
    * four samples used by the right-column subblocks. */
  private def predict4(p: Array[Byte], s: Int, x0: Int, y0: Int, mode: Int,
                       rightCol: Boolean, tr: Array[Int]): Unit = {
    def avg2(a: Int, b: Int) = (a + b + 1) >> 1
    def avg3(a: Int, b: Int, c: Int) = (a + 2 * b + c + 2) >> 2
    val X = px(p, s, x0 - 1, y0 - 1)
    val I = px(p, s, x0 - 1, y0); val J = px(p, s, x0 - 1, y0 + 1)
    val K = px(p, s, x0 - 1, y0 + 2); val L = px(p, s, x0 - 1, y0 + 3)
    val A = px(p, s, x0, y0 - 1); val B = px(p, s, x0 + 1, y0 - 1)
    val C = px(p, s, x0 + 2, y0 - 1); val D = px(p, s, x0 + 3, y0 - 1)
    val E = if (rightCol) tr(0) else px(p, s, x0 + 4, y0 - 1)
    val F = if (rightCol) tr(1) else px(p, s, x0 + 5, y0 - 1)
    val G = if (rightCol) tr(2) else px(p, s, x0 + 6, y0 - 1)
    val H = if (rightCol) tr(3) else px(p, s, x0 + 7, y0 - 1)
    def set(c: Int, r: Int, v: Int): Unit = setPx(p, s, x0 + c, y0 + r, v)
    mode match {
      case BDc =>
        val dc = (I + J + K + L + A + B + C + D + 4) >> 3
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { set(c, r, dc); c += 1 }; r += 1 }
      case BTm =>
        var r = 0
        while (r < 4) {
          val l = px(p, s, x0 - 1, y0 + r)
          var c = 0
          while (c < 4) { set(c, r, clamp255(l + px(p, s, x0 + c, y0 - 1) - X)); c += 1 }
          r += 1
        }
      case BVe =>
        val v0 = avg3(X, A, B); val v1 = avg3(A, B, C)
        val v2 = avg3(B, C, D); val v3 = avg3(C, D, E)
        var r = 0
        while (r < 4) { set(0, r, v0); set(1, r, v1); set(2, r, v2); set(3, r, v3); r += 1 }
      case BHe =>
        val h0 = avg3(X, I, J); val h1 = avg3(I, J, K)
        val h2 = avg3(J, K, L); val h3 = avg3(K, L, L)
        var c = 0
        while (c < 4) { set(c, 0, h0); set(c, 1, h1); set(c, 2, h2); set(c, 3, h3); c += 1 }
      case BLd =>
        set(0, 0, avg3(A, B, C))
        set(1, 0, avg3(B, C, D)); set(0, 1, avg3(B, C, D))
        set(2, 0, avg3(C, D, E)); set(1, 1, avg3(C, D, E)); set(0, 2, avg3(C, D, E))
        set(3, 0, avg3(D, E, F)); set(2, 1, avg3(D, E, F)); set(1, 2, avg3(D, E, F)); set(0, 3, avg3(D, E, F))
        set(3, 1, avg3(E, F, G)); set(2, 2, avg3(E, F, G)); set(1, 3, avg3(E, F, G))
        set(3, 2, avg3(F, G, H)); set(2, 3, avg3(F, G, H))
        set(3, 3, avg3(G, H, H))
      case BRd =>
        set(0, 3, avg3(J, K, L))
        set(0, 2, avg3(I, J, K)); set(1, 3, avg3(I, J, K))
        set(0, 1, avg3(X, I, J)); set(1, 2, avg3(X, I, J)); set(2, 3, avg3(X, I, J))
        set(0, 0, avg3(A, X, I)); set(1, 1, avg3(A, X, I)); set(2, 2, avg3(A, X, I)); set(3, 3, avg3(A, X, I))
        set(1, 0, avg3(B, A, X)); set(2, 1, avg3(B, A, X)); set(3, 2, avg3(B, A, X))
        set(2, 0, avg3(C, B, A)); set(3, 1, avg3(C, B, A))
        set(3, 0, avg3(D, C, B))
      case BVr =>
        set(0, 0, avg2(X, A)); set(1, 2, avg2(X, A))
        set(1, 0, avg2(A, B)); set(2, 2, avg2(A, B))
        set(2, 0, avg2(B, C)); set(3, 2, avg2(B, C))
        set(3, 0, avg2(C, D))
        set(0, 3, avg3(K, J, I))
        set(0, 2, avg3(J, I, X))
        set(0, 1, avg3(I, X, A)); set(1, 3, avg3(I, X, A))
        set(1, 1, avg3(X, A, B)); set(2, 3, avg3(X, A, B))
        set(2, 1, avg3(A, B, C)); set(3, 3, avg3(A, B, C))
        set(3, 1, avg3(B, C, D))
      case BVl =>
        set(0, 0, avg2(A, B))
        set(1, 0, avg2(B, C)); set(0, 2, avg2(B, C))
        set(2, 0, avg2(C, D)); set(1, 2, avg2(C, D))
        set(3, 0, avg2(D, E)); set(2, 2, avg2(D, E))
        set(0, 1, avg3(A, B, C))
        set(1, 1, avg3(B, C, D)); set(0, 3, avg3(B, C, D))
        set(2, 1, avg3(C, D, E)); set(1, 3, avg3(C, D, E))
        set(3, 1, avg3(D, E, F)); set(2, 3, avg3(D, E, F))
        set(3, 2, avg3(E, F, G))
        set(3, 3, avg3(F, G, H))
      case BHd =>
        set(0, 0, avg2(I, X)); set(2, 1, avg2(I, X))
        set(0, 1, avg2(J, I)); set(2, 2, avg2(J, I))
        set(0, 2, avg2(K, J)); set(2, 3, avg2(K, J))
        set(0, 3, avg2(L, K))
        set(3, 0, avg3(A, B, C))
        set(2, 0, avg3(X, A, B))
        set(1, 0, avg3(I, X, A)); set(3, 1, avg3(I, X, A))
        set(1, 1, avg3(X, I, J)); set(3, 2, avg3(X, I, J))
        set(1, 2, avg3(I, J, K)); set(3, 3, avg3(I, J, K))
        set(1, 3, avg3(J, K, L))
      case _ => // BHu
        set(0, 0, avg2(I, J))
        set(2, 0, avg2(J, K)); set(0, 1, avg2(J, K))
        set(2, 1, avg2(K, L)); set(0, 2, avg2(K, L))
        set(1, 0, avg3(I, J, K))
        set(3, 0, avg3(J, K, L)); set(1, 1, avg3(J, K, L))
        set(3, 1, avg3(K, L, L)); set(1, 2, avg3(K, L, L))
        set(3, 2, L); set(2, 2, L); set(0, 3, L)
        set(1, 3, L); set(2, 3, L); set(3, 3, L)
    }
  }

  private[images] def reconstructMb(mbX: Int, mbY: Int, mbW: Int, i4: Boolean,
                            ymode: Int, uvmode: Int, bmodes: Array[Int],
                            coeffs: Array[Int], yP: Array[Byte], ys: Int,
                            uP: Array[Byte], vP: Array[Byte], cs: Int): Unit = {
    val x0 = mbX * 16; val y0 = mbY * 16
    val res = new Array[Int](16)
    val hasTop = mbY > 0; val hasLeft = mbX > 0
    // note: virtual borders (127 above / 129 left) are pre-initialized, so
    // V/H/TM read them directly; only DC needs the has-neighbor variants
    if (!i4) {
      predictBlock(yP, ys, x0, y0, 16, ymode, hasTop, hasLeft)
      var b = 0
      while (b < 16) {
        idct4x4(coeffs, b * 16, res)
        addResidual(yP, ys, x0 + (b % 4) * 4, y0 + (b / 4) * 4, res)
        b += 1
      }
    } else {
      // fixed above-right samples for the right-column subblocks
      val tr = new Array[Int](4)
      if (mbY == 0) { var i = 0; while (i < 4) { tr(i) = 127; i += 1 } }
      else if (mbX >= mbW - 1) {
        val v = px(yP, ys, mbW * 16 - 1, y0 - 1)
        var i = 0
        while (i < 4) { tr(i) = v; i += 1 }
      } else {
        var i = 0
        while (i < 4) { tr(i) = px(yP, ys, x0 + 16 + i, y0 - 1); i += 1 }
      }
      var b = 0
      while (b < 16) {
        val bx = b % 4; val by = b / 4
        predict4(yP, ys, x0 + bx * 4, y0 + by * 4, bmodes(b),
          rightCol = bx == 3, tr)
        idct4x4(coeffs, b * 16, res)
        addResidual(yP, ys, x0 + bx * 4, y0 + by * 4, res)
        b += 1
      }
    }
    val cx0 = mbX * 8; val cy0 = mbY * 8
    predictBlock(uP, cs, cx0, cy0, 8, uvmode, hasTop, hasLeft)
    predictBlock(vP, cs, cx0, cy0, 8, uvmode, hasTop, hasLeft)
    var b = 0
    while (b < 4) {
      idct4x4(coeffs, (16 + b) * 16, res)
      addResidual(uP, cs, cx0 + (b % 2) * 4, cy0 + (b / 2) * 4, res)
      idct4x4(coeffs, (20 + b) * 16, res)
      addResidual(vP, cs, cx0 + (b % 2) * 4, cy0 + (b / 2) * 4, res)
      b += 1
    }
  }

  // ------------------------------------------------ loop filter

  private def loopFilter(hdr: Header, segment: Array[Int], isI4: Array[Boolean],
                         skip: Array[Boolean], mbW: Int, mbH: Int,
                         yP: Array[Byte], ys: Int, uP: Array[Byte],
                         vP: Array[Byte], cs: Int): Unit = {
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val i = mbY * mbW + mbX
        val seg = segment(i)
        var level =
          if (hdr.useSegment) {
            if (hdr.absoluteDelta) hdr.segFilter(seg)
            else hdr.filterLevel + hdr.segFilter(seg)
          } else hdr.filterLevel
        if (hdr.lfDeltaEnabled) {
          level += hdr.refLfDelta(0) // intra frame
          if (isI4(i)) level += hdr.modeLfDelta(0) // B_PRED
        }
        level = clip(level, 63)
        if (level > 0) {
          var ilevel = level
          if (hdr.sharpness > 0) {
            ilevel = if (hdr.sharpness > 4) level >> 2 else level >> 1
            if (ilevel > 9 - hdr.sharpness) ilevel = 9 - hdr.sharpness
          }
          if (ilevel < 1) ilevel = 1
          val limit = 2 * level + ilevel
          val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
          val inner = isI4(i) || !skip(i)
          val x0 = mbX * 16 + 1; val y0 = mbY * 16 + 1 // padded coords
          val cx0 = mbX * 8 + 1; val cy0 = mbY * 8 + 1
          if (hdr.simpleFilter) {
            if (mbX > 0) simpleHEdge(yP, ys, x0, y0, 16, limit + 4)
            if (inner) {
              simpleHEdge(yP, ys, x0 + 4, y0, 16, limit)
              simpleHEdge(yP, ys, x0 + 8, y0, 16, limit)
              simpleHEdge(yP, ys, x0 + 12, y0, 16, limit)
            }
            if (mbY > 0) simpleVEdge(yP, ys, x0, y0, 16, limit + 4)
            if (inner) {
              simpleVEdge(yP, ys, x0, y0 + 4, 16, limit)
              simpleVEdge(yP, ys, x0, y0 + 8, 16, limit)
              simpleVEdge(yP, ys, x0, y0 + 12, 16, limit)
            }
          } else {
            if (mbX > 0) {
              normalHEdge(yP, ys, x0, y0, 16, limit + 4, ilevel, hevT, mbEdge = true)
              normalHEdge(uP, cs, cx0, cy0, 8, limit + 4, ilevel, hevT, mbEdge = true)
              normalHEdge(vP, cs, cx0, cy0, 8, limit + 4, ilevel, hevT, mbEdge = true)
            }
            if (inner) {
              var k = 4
              while (k < 16) {
                normalHEdge(yP, ys, x0 + k, y0, 16, limit, ilevel, hevT, mbEdge = false)
                k += 4
              }
              normalHEdge(uP, cs, cx0 + 4, cy0, 8, limit, ilevel, hevT, mbEdge = false)
              normalHEdge(vP, cs, cx0 + 4, cy0, 8, limit, ilevel, hevT, mbEdge = false)
            }
            if (mbY > 0) {
              normalVEdge(yP, ys, x0, y0, 16, limit + 4, ilevel, hevT, mbEdge = true)
              normalVEdge(uP, cs, cx0, cy0, 8, limit + 4, ilevel, hevT, mbEdge = true)
              normalVEdge(vP, cs, cx0, cy0, 8, limit + 4, ilevel, hevT, mbEdge = true)
            }
            if (inner) {
              var k = 4
              while (k < 16) {
                normalVEdge(yP, ys, x0, y0 + k, 16, limit, ilevel, hevT, mbEdge = false)
                k += 4
              }
              normalVEdge(uP, cs, cx0, cy0 + 4, 8, limit, ilevel, hevT, mbEdge = false)
              normalVEdge(vP, cs, cx0, cy0 + 4, 8, limit, ilevel, hevT, mbEdge = false)
            }
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  private def sclip(v: Int, m: Int): Int = if (v < -m - 1) -m - 1 else if (v > m) m else v
  private def sclip128(v: Int): Int = sclip(v, 127)
  private def sclip16(v: Int): Int = sclip(v, 15)
  private def abs0(v: Int): Int = if (v < 0) -v else v

  /** filter 2 pixels around the edge at p (offset of q0), step towards q1. */
  private def doFilter2(p: Array[Byte], i: Int, step: Int): Unit = {
    val p1 = p(i - 2 * step) & 0xff; val p0 = p(i - step) & 0xff
    val q0 = p(i) & 0xff; val q1 = p(i + step) & 0xff
    val a = 3 * (q0 - p0) + sclip128(p1 - q1)
    val a1 = sclip16((a + 4) >> 3)
    val a2 = sclip16((a + 3) >> 3)
    p(i - step) = clamp255(p0 + a2).toByte
    p(i) = clamp255(q0 - a1).toByte
  }

  private def doFilter4(p: Array[Byte], i: Int, step: Int): Unit = {
    val p1 = p(i - 2 * step) & 0xff; val p0 = p(i - step) & 0xff
    val q0 = p(i) & 0xff; val q1 = p(i + step) & 0xff
    val a = 3 * (q0 - p0)
    val a1 = sclip16((a + 4) >> 3)
    val a2 = sclip16((a + 3) >> 3)
    val a3 = (a1 + 1) >> 1
    p(i - 2 * step) = clamp255(p1 + a3).toByte
    p(i - step) = clamp255(p0 + a2).toByte
    p(i) = clamp255(q0 - a1).toByte
    p(i + step) = clamp255(q1 - a3).toByte
  }

  private def doFilter6(p: Array[Byte], i: Int, step: Int): Unit = {
    val p2 = p(i - 3 * step) & 0xff; val p1 = p(i - 2 * step) & 0xff
    val p0 = p(i - step) & 0xff; val q0 = p(i) & 0xff
    val q1 = p(i + step) & 0xff; val q2 = p(i + 2 * step) & 0xff
    val a = sclip128(3 * (q0 - p0) + sclip128(p1 - q1))
    val a1 = (27 * a + 63) >> 7
    val a2 = (18 * a + 63) >> 7
    val a3 = (9 * a + 63) >> 7
    p(i - 3 * step) = clamp255(p2 + a3).toByte
    p(i - 2 * step) = clamp255(p1 + a2).toByte
    p(i - step) = clamp255(p0 + a1).toByte
    p(i) = clamp255(q0 - a1).toByte
    p(i + step) = clamp255(q1 - a2).toByte
    p(i + 2 * step) = clamp255(q2 - a3).toByte
  }

  private def needsFilter(p: Array[Byte], i: Int, step: Int, t: Int): Boolean = {
    val p1 = p(i - 2 * step) & 0xff; val p0 = p(i - step) & 0xff
    val q0 = p(i) & 0xff; val q1 = p(i + step) & 0xff
    4 * abs0(p0 - q0) + abs0(p1 - q1) <= t
  }

  private def needsFilter2(p: Array[Byte], i: Int, step: Int, t: Int, it: Int): Boolean = {
    val p3 = p(i - 4 * step) & 0xff; val p2 = p(i - 3 * step) & 0xff
    val p1 = p(i - 2 * step) & 0xff; val p0 = p(i - step) & 0xff
    val q0 = p(i) & 0xff; val q1 = p(i + step) & 0xff
    val q2 = p(i + 2 * step) & 0xff; val q3 = p(i + 3 * step) & 0xff
    if (4 * abs0(p0 - q0) + abs0(p1 - q1) > t) false
    else abs0(p3 - p2) <= it && abs0(p2 - p1) <= it && abs0(p1 - p0) <= it &&
      abs0(q3 - q2) <= it && abs0(q2 - q1) <= it && abs0(q1 - q0) <= it
  }

  private def hev(p: Array[Byte], i: Int, step: Int, t: Int): Boolean = {
    val p1 = p(i - 2 * step) & 0xff; val p0 = p(i - step) & 0xff
    val q0 = p(i) & 0xff; val q1 = p(i + step) & 0xff
    abs0(p1 - p0) > t || abs0(q1 - q0) > t
  }

  /** vertical edge at column x (q-side), filtering horizontally. */
  private def simpleHEdge(p: Array[Byte], s: Int, x: Int, y: Int, n: Int, limit: Int): Unit = {
    val t = 2 * limit + 1
    var r = 0
    while (r < n) {
      val i = (y + r) * s + x
      if (needsFilter(p, i, 1, t)) doFilter2(p, i, 1)
      r += 1
    }
  }

  private def simpleVEdge(p: Array[Byte], s: Int, x: Int, y: Int, n: Int, limit: Int): Unit = {
    val t = 2 * limit + 1
    var c = 0
    while (c < n) {
      val i = y * s + x + c
      if (needsFilter(p, i, s, t)) doFilter2(p, i, s)
      c += 1
    }
  }

  private def normalHEdge(p: Array[Byte], s: Int, x: Int, y: Int, n: Int,
                          limit: Int, ilevel: Int, hevT: Int, mbEdge: Boolean): Unit = {
    val t = 2 * limit + 1
    var r = 0
    while (r < n) {
      val i = (y + r) * s + x
      if (needsFilter2(p, i, 1, t, ilevel)) {
        if (hev(p, i, 1, hevT)) doFilter2(p, i, 1)
        else if (mbEdge) doFilter6(p, i, 1)
        else doFilter4(p, i, 1)
      }
      r += 1
    }
  }

  private def normalVEdge(p: Array[Byte], s: Int, x: Int, y: Int, n: Int,
                          limit: Int, ilevel: Int, hevT: Int, mbEdge: Boolean): Unit = {
    val t = 2 * limit + 1
    var c = 0
    while (c < n) {
      val i = y * s + x + c
      if (needsFilter2(p, i, s, t, ilevel)) {
        if (hev(p, i, s, hevT)) doFilter2(p, i, s)
        else if (mbEdge) doFilter6(p, i, s)
        else doFilter4(p, i, s)
      }
      c += 1
    }
  }

  // ------------------------------------------------ YUV -> RGBA

  /** libwebp fancy upsampler + fixed-point YUV->RGB (dsp/yuv.h,
    * dsp/upsampling.c): chroma is bilinearly refined on the half-pel
    * diagonal grid with the library's exact two-step rounding, so the
    * RGBA output is byte-identical to WebPDecodeRGBA. */
  private def upsampleArgb(f: Yuv): Array[Int] = {
    val w = f.width; val h = f.height
    val cw = f.chromaW
    val out = new Array[Int](w * h)
    val uRow = new Array[Int](w); val vRow = new Array[Int](w)
    def cAt(p: Array[Byte], row: Int, x: Int) = p(row * cw + x) & 0xff
    // one upsampled chroma row: rows jt (above) and jc (below) blended
    // 1:3 or 3:1; `topSide` = this luma row sits on the jt side
    def fillRow(p: Array[Byte], jt: Int, jc: Int, topSide: Boolean,
                dst: Array[Int]): Unit = {
      val t0 = cAt(p, jt, 0); val c0 = cAt(p, jc, 0)
      dst(0) = if (topSide) (3 * t0 + c0 + 2) >> 2 else (3 * c0 + t0 + 2) >> 2
      var x = 1
      while (x <= (w - 1) / 2) {
        val tl = cAt(p, jt, x - 1); val t = cAt(p, jt, x)
        val l = cAt(p, jc, x - 1); val c = cAt(p, jc, x)
        val avg = tl + t + l + c + 8
        val diag12 = (avg + 2 * (t + l)) >> 3
        val diag03 = (avg + 2 * (tl + c)) >> 3
        if (topSide) {
          dst(2 * x - 1) = (diag12 + tl) >> 1
          if (2 * x < w) dst(2 * x) = (diag03 + t) >> 1
        } else {
          dst(2 * x - 1) = (diag03 + l) >> 1
          if (2 * x < w) dst(2 * x) = (diag12 + c) >> 1
        }
        x += 1
      }
      if (w > 1 && (w & 1) == 0) {
        val tl = cAt(p, jt, cw - 1); val l = cAt(p, jc, cw - 1)
        dst(w - 1) = if (topSide) (3 * tl + l + 2) >> 2 else (3 * l + tl + 2) >> 2
      }
    }
    var r = 0
    while (r < h) {
      val (jt, jc, topSide) =
        if (r == 0) (0, 0, true)
        else if ((r & 1) == 1) ((r + 1) / 2 - 1, math.min((r + 1) / 2, f.chromaH - 1), true)
        else (r / 2 - 1, r / 2, false)
      fillRow(f.u, jt, jc, topSide, uRow)
      fillRow(f.v, jt, jc, topSide, vRow)
      var x = 0
      while (x < w) {
        val yv = f.y(r * w + x) & 0xff
        out(r * w + x) = 0xff000000 | (yuvToR(yv, vRow(x)) << 16) |
          (yuvToG(yv, uRow(x), vRow(x)) << 8) | yuvToB(yv, uRow(x))
        x += 1
      }
      r += 1
    }
    out
  }

  // libwebp dsp/yuv.h fixed-point (YUV_FIX2 = 6)
  private def multHi(v: Int, coeff: Int): Int = (v * coeff) >> 8
  private def clip8(v: Int): Int =
    if ((v & ~16383) == 0) v >> 6 else if (v < 0) 0 else 255
  private def yuvToR(y: Int, v: Int): Int = clip8(multHi(y, 19077) + multHi(v, 26149) - 14234)
  private def yuvToG(y: Int, u: Int, v: Int): Int =
    clip8(multHi(y, 19077) - multHi(u, 6419) - multHi(v, 13320) + 8708)
  private def yuvToB(y: Int, u: Int): Int = clip8(multHi(y, 19077) + multHi(u, 33050) - 17685)
}

package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: audio/video payloads as
  * opaque BINARY with typed metadata structs, plus the Spark-side plumbing
  * for decode / feature-extract / frame-sample.
  *
  * The reference handles only images (real decode via graft.images
  * .ImageCodec / javax.imageio). What is REAL here without any codec
  * library: WAV/AIFF/AU sample decode (javax.sound.sampled), WAV/AIFF/AU
  * + MP3 + FLAC + Ogg/Vorbis audio METADATA ([[audioMetaFromBytes]]), MP4/QuickTime + AVI +
  * GIF video METADATA ([[videoMetaFromBytes]]) parsed from raw bytes,
  * and FRAME DECODE for animated GIF and AVI/MJPEG clips
  * ([[decodeVideoFrames]] — JDK GIF/JPEG codecs over pure-byte container
  * walks). What remains a clearly-marked DETERMINISTIC STUB: MP3/AAC/OGG
  * sample decode and MP4/AVC frame decode — for those, the schemas,
  * partitioning behavior, per-row vs per-partition amortization, and
  * window/feature math are the real, tested plumbing a codec would drop
  * into.
  *
  * Scale notes: payloads stay opaque binary until a kernel needs them
  * (column pruning skips them entirely for metadata-only queries —
  * the same header-vs-pixels split as images/ImageCodec.imageDims);
  * feature extraction is a narrow map, no shuffle; frame sampling is a
  * generator (1 row → N rows) exactly like the tile grid, pure column
  * arithmetic until frame bytes are touched.
  */
object Multimodal {

  // ------------------------------------------------------------ metadata

  /** Typed audio metadata column: STRUCT<sample_rate, channels, duration_ms>.
    * In a real pipeline this comes from the container header (cheap), not a
    * full decode — the audio analog of header-only image dims. */
  def audioMeta(sampleRate: Column, channels: Column, durationMs: Column): Column =
    struct(sampleRate.cast("int").as("sample_rate"),
      channels.cast("int").as("channels"),
      durationMs.cast("long").as("duration_ms"))

  /** REAL audio metadata from payload bytes — header-only, no sample
    * decode: WAV/AIFF/AU via AudioSystem.getAudioFileFormat (reads only
    * the container header) and MP3 via [[Mp3.parse]]'s frame-header walk.
    * Returns a struct with [[audioMeta]]'s exact schema, or null when no
    * parser recognizes the payload — quarantine, as everywhere. The
    * audio analog of header-only image dims: metadata queries never
    * touch sample data, so column pruning + this keep a metadata scan
    * I/O-proportional to headers. */
  val audioMetaFromBytes: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else {
        val viaJdk =
          try {
            val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(payload))
            val f = aff.getFormat
            if (aff.getFrameLength <= 0 || f.getFrameRate <= 0 || f.getSampleRate <= 0) None
            else Some(Mp3.AudioMeta(f.getSampleRate.toInt, f.getChannels,
              (aff.getFrameLength * 1000.0 / f.getFrameRate).toLong))
          } catch { case _: Exception => None }
        viaJdk.orElse(Mp3.parse(payload)).orElse(Flac.parse(payload))
          .orElse(Ogg.parse(payload)).orNull
      }
    }

  /** Typed video metadata: STRUCT<width, height, fps, duration_ms>. */
  def videoMeta(width: Column, height: Column, fps: Column, durationMs: Column): Column =
    struct(width.cast("int").as("width"), height.cast("int").as("height"),
      fps.cast("double").as("fps"), durationMs.cast("long").as("duration_ms"))

  /** REAL video metadata from payload bytes: walks the MP4/QuickTime
    * `moov` box tree ([[Mp4.parse]] — pure byte offsets, offline, no
    * codec): width/height from `tkhd`, duration from `mvhd`, fps from the
    * `stts` sample deltas at the `mdhd` timescale; animated GIF via
    * [[Gif.parse]] (logical screen + per-frame delays). Returns a struct
    * with [[videoMeta]]'s exact schema, or null for payloads no
    * parser recognizes — the same quarantine contract as
    * [[decodeAudioPcm]]. MP4 and AVI ([[Avi.parse]] — RIFF header walk)
    * stay header-cost only (sample data never touched); GIF walks
    * frames, which IS the container's header-less reality. */
  val videoMetaFromBytes: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else Mp4.parse(payload).orElse(Gif.parse(payload))
        .orElse(Avi.parse(payload)).orNull
    }

  /** REAL GIF-specific frame decode ([[Gif.frames]]) with the GIF-only
    * fields (per-frame delay, disposal, logical-screen offset) the
    * container-agnostic [[decodeVideoFrames]] schema drops. One array
    * element per frame — raster dims/offset, delay, disposal, exact
    * pixel digests (integer channel sum + ARGB md5). explode() for one
    * row per frame; [[Gif.frameArgb]] hands kernels the raster itself. */
  val decodeGifFrames: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null) null else Gif.frames(payload).map(_.toArray).orNull
    }

  /** Container-agnostic REAL video-frame decode: animated GIF (JDK GIF
    * codec) and AVI/MJPEG ([[Avi.frames]] — RIFF walk + JDK JPEG codec)
    * both land in the shared [[VideoFrame]] schema, with per-frame
    * presentation timestamps (GIF: cumulative GCE delays; AVI: frame
    * index at the stream's exact scale/rate). Unrecognized payloads →
    * null. MP4/AVC is PERMANENTLY closed at the metadata tier (SURVEY
    * §7.4, decided r9): no offline validation oracle for H.264 exists
    * here — no ffmpeg/x264, and unlike FLAC's CRC/MD5 ladder or VP8's
    * libwebp goldens, an AVC bitstream carries no in-format check over
    * decoded output, so a cleanroom decoder would be unverifiable by
    * construction; deployments plug a real codec behind this same
    * schema. Everything downstream of THIS column is
    * container-independent. */
  val decodeVideoFrames: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else {
        val viaGif = Gif.frames(payload).map { fs =>
          var ts = 0L
          fs.map { f =>
            val v = VideoFrame(f.frame_idx, f.width, f.height, ts, f.rgb_sum, f.argb_md5)
            ts += f.delay_cs * 10L
            v
          }.toArray
        }
        viaGif.orElse(Avi.frames(payload).map(_.toArray)).orNull
      }
    }

  // ------------------------------------------------------------ decode stub

  /** STUB audio decode: bytes → Array[Float] "PCM". Deterministic fake —
    * each payload byte becomes one centered sample b/128f ∈ [-1, 1). Kept
    * for the formats PERMANENTLY closed at the metadata tier (MP3/AAC/
    * Vorbis — SURVEY §7.4: psychoacoustic reconstruction with no offline
    * reference oracle and no in-format checksum; see [[decodeAudioPcm]]
    * for the real FLAC/WAV/AIFF/AU paths) and for plumbing tests that
    * need payload-independent determinism. Kept as a scalar UDF: decode
    * is inherently a black-box byte kernel, exactly like
    * images/ImageCodec. */
  val decodeAudioStub: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else payload.map(b => b.toFloat / 128.0f)
    }

  /** REAL audio decode: FLAC via the pure-JVM frame decoder
    * ([[FlacDecode]] — CONSTANT/VERBATIM/FIXED/LPC subframes, Rice
    * residuals, stereo decorrelation, CRC-8/CRC-16/MD5-verified), plus
    * the containers the JDK ships codecs for (WAV/AIFF/AU, PCM and
    * a-law/µ-law via javax.sound.sampled — fully offline). Bytes → mono
    * float samples in [-1, 1): FLAC samples scale by 2^(bps−1) at native
    * depth; JDK streams are converted to 16-bit signed PCM at their
    * native rate; channels averaged either way. Payloads neither path
    * parses (MP3, AAC, OGG, truncated headers) return null — the same
    * quarantine contract as image decode; route those to
    * [[decodeAudioStub]] or a real codec in deployments that carry
    * one. */
  val decodeAudioPcm: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else FlacDecode.decode(payload) match {
        case Some(d) =>
          val ch = d.channels
          val scale = (1L << (d.bitsPerSample - 1)).toFloat
          val nFrames = d.samples.length / ch
          val out = new Array[Float](nFrames)
          var i = 0
          while (i < nFrames) {
            var s = 0.0f
            var c = 0
            while (c < ch) { s += d.samples(i * ch + c) / scale; c += 1 }
            out(i) = s / ch
            i += 1
          }
          out
        case None =>
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        try {
          val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
          try {
            val src = in.getFormat
            val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
              src.getSampleRate, 16, src.getChannels, 2 * src.getChannels,
              src.getSampleRate, false) // little-endian
            val pcm = AudioSystem.getAudioInputStream(target, in)
            val bytes = pcm.readAllBytes()
            val ch = target.getChannels
            val nFrames = bytes.length / (2 * ch)
            val out = new Array[Float](nFrames)
            var i = 0
            while (i < nFrames) {
              var sum = 0.0f
              var c = 0
              while (c < ch) {
                val base = (i * ch + c) * 2
                val s = (((bytes(base + 1): Int) << 8) | (bytes(base) & 0xff)).toShort
                sum += s / 32768.0f
                c += 1
              }
              out(i) = sum / ch
              i += 1
            }
            out
          } finally in.close()
        } catch { case _: Exception => null }
      }
    }

  /** Positional FNV-1a fold over interleaved integer samples — the
    * exact-PCM fingerprint q204 hash-gates. The committed reference
    * encoder (tools/gen_flac_fixtures.py) computes the identical fold
    * over the PCM it encoded, so the oracle literal certifies the whole
    * decode chain sample-exactly, order included. */
  private[multimodal] def pcmFnv(samples: Array[Int]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < samples.length) {
      h = (h ^ samples(i).toLong) * 0x100000001B3L
      i += 1
    }
    h
  }

  /** Typed integer-PCM summary for q204: stream params + frame count +
    * the positional sample fingerprint. */
  final case class PcmInfo(sample_rate: Int, channels: Int, bits: Int,
                           n_samples: Long, pcm_fp: Long)

  /** Exact integer PCM from any decodable audio payload: FLAC frames via
    * [[FlacDecode]] (native bit depth), else JDK-parseable containers
    * read as 16-bit signed little-endian at native rate/channels.
    * Returns (sampleRate, channels, bits, interleaved samples); None =
    * quarantine. */
  private[multimodal] def decodeToPcm(payload: Array[Byte]): Option[(Int, Int, Int, Array[Int])] =
    FlacDecode.decode(payload) match {
      case Some(d) => Some((d.sampleRate, d.channels, d.bitsPerSample, d.samples))
      case None =>
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        try {
          val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
          try {
            val src = in.getFormat
            val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
              src.getSampleRate, 16, src.getChannels, 2 * src.getChannels,
              src.getSampleRate, false)
            val pcm = AudioSystem.getAudioInputStream(target, in)
            val bytes = pcm.readAllBytes()
            val ch = target.getChannels
            val n = bytes.length / 2
            val samples = new Array[Int](n)
            var i = 0
            while (i < n) {
              samples(i) = (((bytes(2 * i + 1): Int) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
              i += 1
            }
            Some((src.getSampleRate.toInt, ch, 16, samples))
          } finally in.close()
        } catch { case _: Exception => None }
    }

  /** EXACT integer-PCM decode summary ([[decodeToPcm]] → [[PcmInfo]]).
    * Unparseable → null (quarantine). The fingerprint is over
    * interleaved samples, so channel order and frame order are both
    * certified. */
  val decodePcmInfo: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      decodeToPcm(payload).map { case (sr, ch, bits, s) =>
        PcmInfo(sr, ch, bits, (s.length / ch).toLong, pcmFnv(s))
      }.orNull
    }

  /** The q205 round-trip kernel: decode → re-encode with the pure-JVM
    * [[FlacEncode]] → decode the re-encoded stream with [[FlacDecode]]
    * (which re-verifies CRC-8/CRC-16 and the STREAMINFO MD5 the encoder
    * wrote) → summarize. Equal to [[decodePcmInfo]] iff the encoder is
    * lossless AND its integrity metadata is correct — one column, both
    * properties. */
  val pcmRoundtripInfo: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      decodeToPcm(payload).flatMap { case (sr, ch, bits, s) =>
        FlacDecode.decode(FlacEncode.encode(s, sr, ch, bits)).map(d =>
          PcmInfo(d.sampleRate, d.channels, d.bitsPerSample,
            (d.samples.length / d.channels).toLong, pcmFnv(d.samples)))
      }.orNull
    }

  // ------------------------------------------------------------ features

  /** Windowed RMS energy over a decoded sample array: frames of `frameLen`
    * samples (tail partial frame dropped), each reduced to
    * sqrt(mean(x²)) — pure array expressions, no explode until the caller
    * wants per-frame rows. */
  def rmsFrames(samples: Column, frameLen: Int): Column = {
    val nFrames = floor(size(samples) / frameLen).cast("int")
    // guard nFrames = 0 (input shorter than one frame): sequence(0, -1, 1)
    // throws at runtime — same guard shape as frameSampleGrid
    when(nFrames > 0,
      transform(sequence(lit(0), nFrames - 1, lit(1)), f => {
        val frame = slice(samples, f * frameLen + 1, lit(frameLen))
        sqrt(aggregate(frame, lit(0.0d), (s, x) => s + x.cast("double") * x.cast("double"))
          / frameLen)
      }))
      .otherwise(array().cast("array<double>"))
  }

  /** Peak absolute amplitude — one fold, no allocation. */
  def peak(samples: Column): Column =
    aggregate(samples, lit(0.0d), (m, x) => greatest(m, abs(x.cast("double"))))

  // ------------------------------------------------------------ frame sampling

  /** Video frame-sample grid: every `everyNth` frame of a clip described
    * only by metadata — ARRAY<STRUCT<frame_idx, ts_ms>>, pure arithmetic
    * (the video analog of the tile grid in images/Geometry). explode() it
    * to get one row per sampled frame; only then would a real pipeline
    * seek+decode that frame's bytes. */
  def frameSampleGrid(fps: Column, durationMs: Column, everyNth: Int): Column = {
    val nFrames = floor(fps * durationMs / 1000.0).cast("int")
    val lastIdx = (floor((nFrames - 1) / lit(everyNth)) * everyNth).cast("int")
    when(nFrames > 0,
      transform(sequence(lit(0), lastIdx, lit(everyNth)), i =>
        struct(i.as("frame_idx"),
          floor(i * lit(1000.0) / fps).cast("long").as("ts_ms"))))
      .otherwise(array().cast("array<struct<frame_idx:int,ts_ms:bigint>>"))
  }

  /** One row per sampled frame: df must carry (id, meta) with videoMeta
    * schema. Narrow generator — partition count and ordering preserved. */
  def sampleFrames(df: DataFrame, everyNth: Int): DataFrame =
    df.select(col("id"), col("meta"),
        explode(frameSampleGrid(col("meta.fps"), col("meta.duration_ms"), everyNth)).as("frame"))
      .select(col("id"), col("frame.frame_idx").as("frame_idx"),
        col("frame.ts_ms").as("ts_ms"))

  // ------------------------------------------------------------ batched extract

  /** Per-partition amortized feature extraction: the expensive resource (a
    * codec context, an inference session) is initialized ONCE per partition
    * and reused across rows — the mapPartitions batch shape that matters at
    * 100 TB (per-row init would dominate). The "model" here is the stub
    * decoder + RMS, but the lifecycle is the real pattern. */
  def extractFeaturesBatched(df: DataFrame, frameLen: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // once-per-partition init happens here (codec/session handle)
        val decode = (payload: Array[Byte]) => payload.map(b => b.toFloat / 128.0f)
        rows.map { case (id, payload) =>
          if (payload == null) (id, 0, 0.0, 0.0)
          else {
            val pcm = decode(payload)
            val frames = pcm.grouped(frameLen).filter(_.length == frameLen).toArray
            val rms = frames.map(f => math.sqrt(f.map(x => x.toDouble * x).sum / frameLen))
            val pk = if (pcm.isEmpty) 0.0 else pcm.map(x => math.abs(x.toDouble)).max
            (id, frames.length, if (rms.isEmpty) 0.0 else rms.max, pk)
          }
        }
      }
      .toDF("id", "n_frames", "rms_max", "peak")
  }
}

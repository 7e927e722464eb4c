package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** REAL audio decode for the multimodal pipeline, on the JDK's own
  * codec (`javax.sound.sampled` — WAV/AIFF/AU PCM, headless, no
  * external libraries): payload bytes → PCM sample stream →
  * fixed-dim features by mean pooling over `dim` equal time buckets.
  * The sibling of [[ImageMeanPoolExpr]] and [[VideoFramePoolExpr]] —
  * every modality decodes for real on at least one genuine format;
  * only codecs the JDK ships no decoder for (H.264/VP9, mp3/aac)
  * remain behind the stub seam.
  *
  * Output: array<double> of length `dim`; position b holds the mean of
  * the channel-0 16-bit samples whose index i satisfies
  * `i*dim div n == b`, scaled to [-1, 1) by /32768 (a power of two, so
  * the scaling is IEEE-exact and an external engine replaying
  * `sum/count/32768` from ground-truth samples matches bit-for-bit).
  * Variable-length clips pool to one fixed embedding dimension.
  *
  * Undecodable, non-PCM-16-bit, or empty payloads yield NULL — a
  * crawl-scale media corpus always carries corrupt files; the pipeline
  * drops them with a filter instead of dying mid-job.
  *
  * Registered as `audio_mean_pool(content, dim)` (dim literal).
  * CodegenFallback: one eval per CLIP — the decode inside dominates. */
case class AudioMeanPoolExpr(child: Expression, dim: Int)
  extends UnaryExpression with CodegenFallback {

  require(dim >= 1, s"audio_mean_pool: dim must be >= 1, got $dim")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_mean_pool expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "audio_mean_pool"

  override protected def nullSafeEval(input: Any): Any = {
    val pooled = AudioCodec.decodeMeanPool(input.asInstanceOf[Array[Byte]], dim)
    if (pooled == null) null else new GenericArrayData(pooled)
  }

  override protected def withNewChildInternal(
      newChild: Expression): AudioMeanPoolExpr = copy(child = newChild)
}

object AudioMeanPoolExpr {
  val Name = "audio_mean_pool"
  private[plans] val info = new ExpressionInfo(classOf[AudioMeanPoolExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"audio_mean_pool expects 2 arguments (content, dim), got ${children.size}")
    require(children(1).foldable,
      s"audio_mean_pool: dim must be a literal, got ${children(1)}")
    AudioMeanPoolExpr(children(0),
      children(1).eval(null).asInstanceOf[Number].intValue())
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** REAL audio QUALITY probe: `audio_stats(content)` decodes the clip
  * (same `javax.sound.sampled` path as `audio_mean_pool`) and returns
  * struct(n_samples, peak, sum_sq, zero_crossings) over channel 0 —
  * the amplitude statistics audio curation filters on (a silent clip
  * has near-zero sum_sq/n, a clipped one rides peak at 32767-32768,
  * a DC-stuck one has ~0 zero crossings). Every field is EXACT
  * integer arithmetic over the decoded 16-bit samples, so a DuckDB
  * oracle replaying the fixture's sample formula matches
  * bit-for-bit — the m4 discipline applied to quality stats. NULL
  * for undecodable payloads. CodegenFallback: one eval per clip. */
case class AudioStatsExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"audio_stats expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    StructType(Seq(
      StructField("n_samples", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("sum_sq", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
  }
  override def nullable: Boolean = true
  override def prettyName: String = "audio_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val s = AudioCodec.decodeStats(input.asInstanceOf[Array[Byte]])
    if (s == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s(0), s(1), s(2), s(3)))
  }

  override protected def withNewChildInternal(
      newChild: Expression): AudioStatsExpr = copy(child = newChild)
}

object AudioStatsExpr {
  val Name = "audio_stats"
  private[plans] val info = new ExpressionInfo(classOf[AudioStatsExpr].getName, Name)
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 1,
      s"audio_stats expects 1 argument (content), got ${children.size}")
    AudioStatsExpr(children(0))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(Name), info, builder)
}

/** The static codec surface shared by the expression (decode) and the
  * fixture/test builders (encode). Decode is pure
  * `javax.sound.sampled` — present in every JDK, works headless; the
  * encoder writes the canonical 44-byte RIFF/WAVE PCM container. */
object AudioCodec {

  /** A decoded 16-bit PCM clip: raw frame bytes plus the layout needed
    * to read channel 0 — the shared preamble of every stats/pooling
    * pass. */
  private final case class Pcm(frames: Int, frameBytes: Int,
                               big: Boolean, data: Array[Byte],
                               base: Int = 0) {
    /** Channel-0 sample i (exact signed 16-bit). */
    def sample(i: Int): Int = {
      val off = base + i * frameBytes
      if (big) ((data(off) << 8) | (data(off + 1) & 0xFF)).toShort.toInt
      else ((data(off + 1) << 8) | (data(off) & 0xFF)).toShort.toInt
    }
  }

  /** RIFF/WAVE plain-PCM16 fast path: the canonical crawl shape (and
    * everything [[encodeWavPcm16]] emits) parsed directly — format
    * tag 1, 16-bit, fmt before data, even-padded chunk walk — with
    * the Pcm view pointing INTO the original payload (no SPI provider
    * scan, no stream stack, no readAllBytes copy; measured ~8 ms/clip
    * of pure preamble on the m9 fixture). Anything else (AIFF, AU,
    * a-law, extensible-format WAVs, structural oddities) returns null
    * and the caller falls back to `javax.sound.sampled`, so behavior
    * on the long tail is unchanged. Frame count comes from the data
    * chunk HEADER, null when the payload is shorter — the same
    * truncation contract as the readAllBytes check below. */
  private def wavPcm16(bytes: Array[Byte]): Pcm = {
    if (bytes.length < 44) return null
    def u32(o: Int): Long =
      ((bytes(o) & 0xFFL)) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def tag(o: Int, t: String): Boolean =
      bytes(o) == t.charAt(0).toByte && bytes(o + 1) == t.charAt(1).toByte &&
        bytes(o + 2) == t.charAt(2).toByte && bytes(o + 3) == t.charAt(3).toByte
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return null
    var off = 12
    var frameBytes = 0
    var haveFmt = false
    while (off + 8 <= bytes.length) {
      val len = u32(off + 4)
      if (len < 0 || len > Int.MaxValue) return null
      val body = off + 8
      if (tag(off, "fmt ")) {
        if (len < 16 || body + 16 > bytes.length) return null
        if (u16(body) != 1 || u16(body + 14) != 16) return null // PCM16 only
        frameBytes = u16(body + 12) // block align
        if (frameBytes < 2) return null
        haveFmt = true
      } else if (tag(off, "data")) {
        if (!haveFmt) return null // fmt must precede data (spec order)
        val dataLen = len.toInt
        val frames = dataLen / frameBytes
        if (frames <= 0) return null
        if (body + frames.toLong * frameBytes > bytes.length) return null
        return Pcm(frames, frameBytes, big = false, bytes, base = body)
      }
      off = body + len.toInt + (len.toInt & 1) // chunks pad to even
    }
    null
  }

  /** Open + validate a payload as 16-bit PCM — the plain-WAV fast
    * path first, then `javax.sound.sampled` (WAV/AIFF/AU) for
    * everything else; null when neither decodes it. The decode
    * preamble shared by [[decodeMeanPool]] and [[decodeStats]]. */
  private def openPcm16(bytes: Array[Byte]): Pcm = {
    val fast = try wavPcm16(bytes) catch { case _: Exception => null }
    if (fast != null) return fast
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => return null
        case _: java.io.IOException => return null
      }
    try {
      val fmt = in.getFormat
      if (fmt.getEncoding !=
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return null
      val n = in.getFrameLength
      if (n <= 0 || n > Int.MaxValue / 2) return null
      val frames = n.toInt
      val frameBytes = fmt.getFrameSize
      val data = in.readAllBytes()
      if (data.length < frames.toLong * frameBytes) return null
      Pcm(frames, frameBytes, fmt.isBigEndian, data)
    } catch {
      case _: java.io.IOException => null
    } finally in.close()
  }

  /** Exact integer amplitude statistics over channel 0 — the audio
    * QUALITY probe (silence and clipping are the two crawl-corpus
    * drop reasons): (n_samples, peak |s|, Σs², strict sign-change
    * zero crossings). Every field is exact integer arithmetic over
    * the decoded samples, so an oracle replaying the sample formula
    * reproduces them bit-for-bit. Null for undecodable payloads. */
  def decodeStats(bytes: Array[Byte]): Array[Long] = {
    val pcm = openPcm16(bytes)
    if (pcm == null) return null
    var peak = 0L
    var sumSq = 0L
    var zc = 0L
    var prev = 0
    var i = 0
    while (i < pcm.frames) {
      val s = pcm.sample(i)
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumSq += s.toLong * s
      if (i > 0 && prev.toLong * s < 0) zc += 1
      prev = s
      i += 1
    }
    Array(pcm.frames.toLong, peak, sumSq, zc)
  }

  /** Decode + time-bucket mean pool; null when the bytes are not a
    * decodable 16-bit PCM clip (or decode to zero frames). Multi-
    * channel clips pool channel 0 — the feature contract is per-clip,
    * not per-channel. Sums are exact integer accumulations over the
    * signed 16-bit samples, so `sum / count / 32768.0` is reproducible
    * bit-for-bit by any engine replaying the same bucketing. */
  def decodeMeanPool(bytes: Array[Byte], dim: Int): Array[Double] = {
    {
      val pcm = openPcm16(bytes)
      if (pcm == null) return null
      val frames = pcm.frames
      val frameBytes = pcm.frameBytes
      val big = pcm.big
      val data = pcm.data
      val base = pcm.base
      val sums = new Array[Long](dim)
      val cnts = new Array[Long](dim)
      // Bucket-outer iteration: sample i belongs to bucket
      // i·dim div frames, whose inverse is the contiguous range
      // [ceil(b·frames/dim), ceil((b+1)·frames/dim)) — precomputing
      // the boundaries removes the per-sample 64-bit division of the
      // sample-outer form (measured ~neutral on the m9 fixture — the
      // JIT largely absorbed it — but strictly less work per sample
      // and branchless inner loops). Identical partition, identical
      // exact integer sums.
      var bk = 0
      while (bk < dim) {
        val start = ((bk.toLong * frames + dim - 1) / dim).toInt
        val end = (((bk + 1).toLong * frames + dim - 1) / dim).toInt
        var sum = 0L
        var i = start
        if (big) while (i < end) {
          val off = base + i * frameBytes // channel 0 leads each frame
          sum += ((data(off) << 8) | (data(off + 1) & 0xFF)).toShort
          i += 1
        } else while (i < end) {
          val off = base + i * frameBytes
          sum += ((data(off + 1) << 8) | (data(off) & 0xFF)).toShort
          i += 1
        }
        sums(bk) = sum
        cnts(bk) = end - start
        bk += 1
      }
      val out = new Array[Double](dim)
      var b = 0
      while (b < dim) {
        // A bucket is empty only when dim > frames; its feature is 0.
        out(b) = if (cnts(b) == 0) 0.0 else sums(b).toDouble / cnts(b) / 32768.0
        b += 1
      }
      out
    }
  }

  /** Encode mono 16-bit PCM samples as real WAV bytes (canonical
    * 44-byte RIFF/WAVE header + little-endian samples). Lossless, so a
    * decode gives back exactly these samples — the property the
    * fixture oracles lean on. Fixture/test builder only. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Design: media payloads are opaque `binary` columns with typed metadata
  * beside them; decode / feature-extract / resize / frame-sample run as
  * per-partition batch transforms (`mapPartitions` over Rows — the JVM
  * equivalent of `mapInPandas`: one iterator per partition, so a real codec
  * would amortize its init cost across the partition batch, and partitioning
  * controls batch shape exactly as at 100 TB).
  *
  * Codecs: IMAGE decode/feature/resize is REAL over the JDK's javax.imageio
  * ([[ImageCodecs]], `codec = "imageio"` — PNG/JPEG/BMP/GIF), AUDIO decode
  * is REAL over javax.sound.sampled ([[AudioCodecs]], `codec = "wav"` —
  * WAV/AIFF/AU PCM), and VIDEO demux + frame sampling is REAL for the
  * motion-PNG container ([[VideoCodecs]], `codec = "mpng"` — index walk,
  * byte-offset extraction, PNG frames). None needs a dependency beyond the
  * JDK. Compressed codecs (MP3/AAC, H.264/MP4) have no JDK implementation
  * and remain deterministic stubs — clearly marked below so pipelines and
  * tests exercise the real Spark plumbing (schemas, partition batching,
  * explode fan-out) with stable outputs. Swap `StubCodecs` per codec to
  * productionize.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Deterministic fake codecs — STUBS for the real byte-level decoders. */
  object StubCodecs {
    /** ??? real impl: JPEG/PNG decode → pixel tensor. Stub: `dim`
      * deterministic "channel statistics" (mean normalized byte value per
      * byte stripe). Accumulates exact integer sums and divides once in
      * double so the value is reproducible in any engine (float running
      * sums are order-sensitive and drift past 4 decimals). */
    def imageFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload == null) return out
      val sums = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        sums(i % dim) += (payload(i) & 0xff)
        i += 1
      }
      val n = math.max(1, payload.length / dim)
      var j = 0
      while (j < dim) { out(j) = ((sums(j).toDouble / 255.0) / n).toFloat; j += 1 }
      out
    }

    /** ??? real impl: libjpeg-turbo scale. Stub: metadata-correct resize
      * that subsamples payload bytes proportionally. */
    def resize(payload: Array[Byte], fromW: Int, fromH: Int, toW: Int, toH: Int): Array[Byte] = {
      if (payload == null || fromW <= 0 || fromH <= 0) return Array.emptyByteArray
      val ratio = (toW.toLong * toH).toDouble / (fromW.toLong * fromH)
      val newLen = math.max(1, (payload.length * ratio).toInt)
      val out = new Array[Byte](newLen)
      var i = 0
      while (i < newLen) {
        out(i) = payload(((i.toLong * payload.length) / newLen).toInt)
        i += 1
      }
      out
    }

    /** ??? real impl: container demux + keyframe decode. Stub: k evenly
      * spaced byte slices standing in for frames. */
    def sampleFrames(payload: Array[Byte], numFrames: Int): Seq[Array[Byte]] = {
      if (payload == null || payload.length == 0) return Seq.empty
      val frameLen = math.max(1, payload.length / math.max(1, numFrames))
      (0 until numFrames).map { f =>
        val start = math.min(payload.length - 1, f * frameLen)
        java.util.Arrays.copyOfRange(payload, start,
          math.min(payload.length, start + frameLen))
      }
    }

    /** ??? real impl: PCM decode + MFCC. Stub: windowed byte-energy bands. */
    def audioFeatures(payload: Array[Byte], bands: Int): Array[Float] = {
      val out = new Array[Float](bands)
      if (payload == null || payload.length == 0) return out
      val window = math.max(1, payload.length / bands)
      var b = 0
      while (b < bands) {
        var s = 0.0f
        var i = b * window
        val end = math.min(payload.length, (b + 1) * window)
        while (i < end) { s += math.abs(payload(i).toFloat); i += 1 }
        out(b) = s / math.max(1, end - b * window)
        b += 1
      }
      out
    }
  }

  /** Image decode + feature extraction as a per-partition batch transform.
    * Output: (media_id, features array<float>). Real plumbing: one codec
    * "session" per partition, rows streamed through it.
    *
    * `codec = "imageio"` selects the REAL decoder ([[ImageCodecs]],
    * javax.imageio — PNG/JPEG/BMP/GIF, no external dependency); the default
    * stub keeps byte-derived deterministic features for payloads that are
    * not actual images (the synthetic test tables).
    */
  def imageFeatures(
      spark: SparkSession, media: DataFrame, dim: Int = 8,
      codec: String = "stub"): DataFrame = {
    val fn: (Array[Byte], Int) => Array[Float] = codec match {
      case "imageio" => ImageCodecs.imageFeatures
      case "stub"    => StubCodecs.imageFeatures
      case other     => throw new IllegalArgumentException(s"unknown codec: $other")
    }
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // real codecs init shared state here, once per partition
        rows.map { r =>
          Row(r.getLong(0), fn(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }(enc)
  }

  /** Resize: payload + metadata transform; width/height columns updated.
    * `codec = "imageio"` does a real bilinear resample + PNG re-encode.
    */
  def resizeImages(
      spark: SparkSession, media: DataFrame, toW: Int, toH: Int,
      codec: String = "stub"): DataFrame = {
    val resizeUdf = codec match {
      case "imageio" => udf((p: Array[Byte], w: Int, h: Int) =>
        ImageCodecs.resize(p, toW, toH))
      case "stub" => udf((p: Array[Byte], w: Int, h: Int) =>
        StubCodecs.resize(p, w, h, toW, toH))
      case other => throw new IllegalArgumentException(s"unknown codec: $other")
    }
    val resized = media.filter(col("kind") === "image")
      .withColumn("payload", resizeUdf(col("payload"), col("width"), col("height")))
    // a failed decode degrades to an empty payload — its metadata must not
    // claim the target dimensions (poison rows stay visibly poisoned)
    val ok = length(col("payload")) > 0
    resized
      .withColumn("width", when(ok, lit(toW)).otherwise(lit(null).cast("int")))
      .withColumn("height", when(ok, lit(toH)).otherwise(lit(null).cast("int")))
  }

  /** Frame sampling: one video row fans out to `numFrames` frame rows via
    * posexplode — the scalable shape (generator, no driver involvement).
    * `codec = "mpng"` does REAL container demux ([[VideoCodecs]]): header
    * parse, frame index walk, byte-offset extraction; emitted frames are
    * decodable PNG payloads and `frame_idx` is the frame's TRUE index in
    * the container (the stub's is the sample ordinal).
    */
  def sampleVideoFrames(
      spark: SparkSession, media: DataFrame, numFrames: Int,
      codec: String = "stub"): DataFrame = codec match {
    case "mpng" =>
      val framesUdf = udf((p: Array[Byte]) =>
        VideoCodecs.sampleFrames(p, numFrames).map(f => (f._1, f._2)))
      media.filter(col("kind") === "video")
        .select(col("media_id"), explode(framesUdf(col("payload"))).as("f"))
        .select(col("media_id"), col("f._1").as("frame_idx"), col("f._2").as("frame"))
    case "stub" =>
      val framesUdf = udf((p: Array[Byte]) => StubCodecs.sampleFrames(p, numFrames))
      media.filter(col("kind") === "video")
        .select(col("media_id"), posexplode(framesUdf(col("payload"))).as(Seq("frame_idx", "frame")))
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  /** Audio feature extraction, same partition-batch shape as images.
    * `codec = "wav"` selects the REAL decoder ([[AudioCodecs]],
    * javax.sound.sampled — WAV/AIFF/AU PCM, no external dependency).
    */
  def audioFeatures(
      spark: SparkSession, media: DataFrame, bands: Int = 4,
      codec: String = "stub"): DataFrame = {
    val fn: (Array[Byte], Int) => Array[Float] = codec match {
      case "wav"  => AudioCodecs.audioFeatures
      case "stub" => StubCodecs.audioFeatures
      case other  => throw new IllegalArgumentException(s"unknown codec: $other")
    }
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), fn(r.getAs[Array[Byte]](1), bands).toSeq)
        }
      }(enc)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Media is carried as opaque `binary` columns plus typed metadata —
  * the Spark-side plumbing (schema, partition sizing, batch iteration)
  * is real; the actual codec step is STUBBED with a deterministic fake
  * (no image/audio libraries exist in this build). Swap
  * `fakeDecode` for a real decoder (e.g. javacv / a JNI codec) without
  * touching the plan shape.
  *
  * Scale notes: binary payloads dominate row size, so media tables
  * must set a small `spark.sql.files.maxPartitionBytes` relative to
  * text tables, and decode work runs in `mapPartitions` so per-batch
  * codec state (decoder contexts) is reused across rows rather than
  * re-created per row.
  */
object Multimodal {

  /** Canonical media-row schema: id + opaque bytes + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true)))

  /** Pure-expression metadata over a binary column: size + content
    * hash + magic-prefix sniff. These run at scan speed — no decode.
    */
  def byteLength(content: Column): Column = octet_length(content).cast(LongType)
  def contentMd5(content: Column): Column = md5(content)
  def magicHex(content: Column, nBytes: Int = 4): Column =
    lower(hex(substring(content, 1, nBytes)))

  /** MIME sniff from magic numbers (the real signatures; the decode
    * downstream is what's stubbed).
    */
  def sniffMime(content: Column): Column = {
    val magic8 = magicHex(content, 8)
    when(magic8.startsWith("89504e47"), "image/png")
      .when(magic8.startsWith("ffd8ff"), "image/jpeg")
      .when(magic8.startsWith("474946383"), "image/gif")
      .when(magic8.startsWith("52494646"), "audio/wav") // RIFF container
      .when(substring(magic8, 9, 8) === "66747970", "video/mp4") // ....ftyp
      .otherwise("application/octet-stream")
  }

  final case class MediaMeta(
      media_id: Long,
      n_bytes: Long,
      mime: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** STUB decoder: deterministic fake "decode" deriving dimensions and
    * a feature vector from the bytes themselves (so tests are exact and
    * reproducible). A real implementation replaces only this function.
    */
  def fakeDecode(id: Long, bytes: Array[Byte], mime: String): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    def byteAt(i: Int): Int = if (n == 0) 0 else java.lang.Byte.toUnsignedInt(bytes(i % n))
    val feature = Array.tabulate(8)(i => byteAt(i).toFloat / 255.0f)
    MediaMeta(
      media_id = id,
      n_bytes = n.toLong,
      mime = if (mime == null) "application/octet-stream" else mime,
      width = 1 + byteAt(0) % 512,
      height = 1 + byteAt(1) % 512,
      n_frames = 1 + byteAt(2) % 32,
      feature = feature)
  }

  /** Distributed decode / feature-extract pass: mapPartitions so a real
    * decoder would amortize codec initialization per partition (the
    * `decoderState` placeholder). Output is a typed Dataset ready for
    * the similarity operators (feature column = array<float>).
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content", "mime").as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // real impl: val decoderState = Codec.open(); reuse across rows
        rows.map { case (id, bytes, mime) => fakeDecode(id, bytes, mime) }
      }
  }

  /** Frame-sampling stub for video: pick every `stride`-th frame index
    * deterministically (plumbing for a real frame extractor).
    */
  def sampleFrameIndexes(nFrames: Column, stride: Int): Column =
    sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))

  final case class ResizedMedia(media_id: Long, width: Int, height: Int, content: Array[Byte])

  /** Resize stub: computes the real target geometry (aspect-preserving
    * fit into maxDim) and fakes the pixel work with a deterministic
    * byte slice — a real codec replaces only the `resized` line. Runs
    * in mapPartitions like decode, so scaler state would amortize.
    */
  def resizeFit(media: DataFrame, maxDim: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content", "mime").as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, mime) =>
          val meta = fakeDecode(id, bytes, mime)
          val scale = math.min(1.0, maxDim.toDouble / math.max(meta.width, meta.height))
          val (w, h) = (math.max(1, (meta.width * scale).toInt),
            math.max(1, (meta.height * scale).toInt))
          val n = if (bytes == null) 0 else bytes.length
          val resized = java.util.Arrays.copyOf(
            if (bytes == null) Array.emptyByteArray else bytes,
            math.max(1, (n * scale * scale).toInt))
          ResizedMedia(id, w, h, resized)
        }
      }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("sniffMime recognizes magic numbers") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 0, 0, 0, 0)
    val wav = "RIFF1234WAVE".getBytes
    val other = "hello world!".getBytes
    val df = Seq((png, jpg, wav, other)).toDF("png", "jpg", "wav", "other")
    val r = df.select(
      Multimodal.sniffMime(col("png")), Multimodal.sniffMime(col("jpg")),
      Multimodal.sniffMime(col("wav")), Multimodal.sniffMime(col("other"))).head()
    assert(r.getString(0) === "image/png")
    assert(r.getString(1) === "image/jpeg")
    assert(r.getString(2) === "audio/wav")
    assert(r.getString(3) === "application/octet-stream")
  }

  test("sampleFrameIndexes strides deterministically and handles empty media") {
    val df = Seq((10, 100)).toDF("short", "long")
    val r = df.select(
      Multimodal.sampleFrameIndexes(col("short"), 3).as("s"),
      Multimodal.sampleFrameIndexes(lit(0), 3).as("empty")).head()
    assert(r.getSeq[Int](0) === Seq(0, 3, 6, 9))
    assert(r.getSeq[Int](1) === Seq(0))
  }

  test("resizeFit preserves aspect ratio and caps the long edge") {
    val media = Seq((1L, Array.fill[Byte](4096)(7), "image/png"))
      .toDF("media_id", "content", "mime")
    val out = Multimodal.resizeFit(media, maxDim = 64).collect().head
    assert(math.max(out.width, out.height) <= 64)
    assert(out.width >= 1 && out.height >= 1)
    assert(out.content.length <= 4096)
    // deterministic: same input → same geometry
    val again = Multimodal.resizeFit(media, maxDim = 64).collect().head
    assert((again.width, again.height) === (out.width, out.height))
  }

  test("decodeFeatures runs distributed and is deterministic per content") {
    val media = Seq(
      (1L, "some bytes".getBytes, "application/octet-stream"),
      (2L, "some bytes".getBytes, "application/octet-stream"),
      (3L, Array.empty[Byte], null.asInstanceOf[String]))
      .toDF("media_id", "content", "mime")
    val out = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(out.length === 3)
    assert(out(0).width === out(1).width && out(0).height === out(1).height)
    assert(out(0).n_bytes === 10L)
    assert(out(2).n_bytes === 0L && out(2).mime === "application/octet-stream")
    assert(out(0).feature.length === 8)
  }
}

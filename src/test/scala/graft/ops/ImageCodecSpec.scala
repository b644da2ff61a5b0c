package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal._

/** Real compressed-image decode (JDK ImageIO codecs): encode→decode
  * round trips, lossy-format tolerance, and corrupt-payload safety.
  * The cross-engine binding of the same loop is oracle q37. */
class ImageCodecSpec extends SparkSpec {

  private val codec = new ImageIoCodec

  test("png: lossless gradient round-trips the formula mean exactly") {
    for (id <- 0L until 300L by 3L) {
      val bytes = synthImageBytes(id)
      sniffFormat(bytes) shouldBe "png"
      val Some((w, h, mean)) = codec.decodeImage(bytes)
      w shouldBe (5 + id % 4).toInt
      h shouldBe (3 + id % 3).toInt
      val n = w * h * 3
      val expect = (0 until n).map(k => ((id * 31 + k) % 256).toDouble).sum / n
      mean shouldBe expect +- 1e-12
    }
  }

  test("gif: two-gray checkerboard decodes to the exact palette mean") {
    for (id <- 1L until 300L by 3L) {
      val bytes = synthImageBytes(id)
      sniffFormat(bytes) shouldBe "gif"
      val Some((w, h, mean)) = codec.decodeImage(bytes)
      w shouldBe (4 + 2 * (id % 3)).toInt
      h shouldBe (3 + id % 4).toInt
      val expect = ((id * 37) % 256 + (id * 53) % 256) / 2.0
      mean shouldBe expect +- 1e-12
    }
  }

  test("gif bytes are NON-interlaced (the JDK interlaced round-trip " +
    "scrambles rows below the 8-row pass stride)") {
    for (id <- Seq(1L, 4L, 7L, 10L)) {
      val bytes = synthImageBytes(id)
      // image descriptor = first 0x2C block: 4×u16 geometry then flags;
      // bit 6 of flags is the interlace bit
      val idx = bytes.indexOf(0x2C.toByte)
      assert(idx >= 0, "no image descriptor")
      (bytes(idx + 9) & 0x40) shouldBe 0
    }
  }

  test("jpeg: real lossy decode — dims exact, solid gray within ±2") {
    for (id <- 2L until 300L by 3L) {
      val bytes = synthImageBytes(id)
      sniffFormat(bytes) shouldBe "jpeg"
      val Some((w, h, mean)) = codec.decodeImage(bytes)
      w shouldBe (8 + (id % 5) * 4).toInt
      h shouldBe (6 + (id % 3) * 2).toInt
      val gray = ((id * 29) % 256).toDouble
      mean shouldBe gray +- 2.0
    }
  }

  test("corrupt, truncated and codec-less payloads decode to None") {
    codec.decodeImage(Array[Byte]()) shouldBe None
    codec.decodeImage(Array[Byte](1, 2, 3)) shouldBe None
    codec.decodeImage(synthImageBytes(0L).take(20)) shouldBe None
    // random garbage with a PNG magic: reader accepts, decode fails
    val junk = synthImageBytes(0L).take(8) ++ Array.fill[Byte](32)(0x5A)
    codec.decodeImage(junk) shouldBe None
    // WebP: real header parse territory, but NO JDK codec — None here
    val vp8x = "RIFF0000WEBPVP8X".getBytes("ISO-8859-1") ++
      Array[Byte](10, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    codec.decodeImage(vp8x) shouldBe None
  }

  // ---- compressed AUDIO (javax.sound G.711 μ-law, same JDK-ships-it
  // story as the image codecs) ----

  private def g711UlawToLinear(code: Int): Int = {
    val u = (~code) & 0xFF
    val exp = (u >> 4) & 7
    val mant = u & 0x0F
    val lin = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -lin else lin
  }

  test("ulaw wav: JDK codec decode equals the G.711 closed form") {
    for (id <- 0L until 40L) {
      val bytes = synthUlawBytes(id)
      sniffFormat(bytes) shouldBe "wav"
      // header parse still owns rate/duration (fmt 7, 8-bit)
      val info = wavInfo(bytes).get
      info.sampleRate shouldBe 8000
      info.bitsPerSample shouldBe 8
      val ns = (300 + (id % 7) * 50).toInt
      info.nSamples shouldBe ns
      // PCM hand decoder correctly refuses; the G.711 codec decodes
      wavRms(bytes) shouldBe None
      val rms = compressedWavRms(bytes).get
      val expect = math.sqrt((0 until ns).map { k =>
        val v = g711UlawToLinear(((id * 13 + 7L * k) % 256).toInt).toDouble
        v * v
      }.sum / ns)
      rms shouldBe expect +- 1e-9
    }
  }

  test("alaw wav: JDK codec decode equals the G.711 closed form " +
    "(all 256 codes)") {
    // fmt code 6 WAV carrying every A-law code once
    val ns = 256
    val out = java.nio.ByteBuffer.allocate(44 + ns)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + ns)
      .put("WAVE".getBytes("ISO-8859-1"))
    out.put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(6).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    out.put("data".getBytes("ISO-8859-1")).putInt(ns)
    (0 until ns).foreach(k => out.put(k.toByte))
    def alawToLinear(c: Int): Int = {
      val a = c ^ 0x55
      val exp = (a >> 4) & 7
      val mant = a & 0x0F
      val lin =
        if (exp == 0) (mant << 4) + 8
        else ((mant << 4) + 0x108) << (exp - 1)
      if ((a & 0x80) != 0) lin else -lin
    }
    val expect = math.sqrt((0 until ns).map { k =>
      val v = alawToLinear(k).toDouble; v * v
    }.sum / ns)
    compressedWavRms(out.array()).get shouldBe expect +- 1e-9
  }

  test("compressedWavRms: PCM input and garbage both yield None") {
    // PCM16 (q36's synth): the hand decoder owns it
    compressedWavRms(synthAvBytes(1L)) shouldBe None
    compressedWavRms(Array[Byte](1, 2, 3)) shouldBe None
    compressedWavRms(synthUlawBytes(3L).take(30)) shouldBe None
  }

  test("decodeAvFeatures routes ulaw rows through the G.711 codec") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(1L, "audio", synthUlawBytes(1L)),
      MediaRow(2L, "audio", synthAvBytes(1L)))) // PCM16 control
    val out = Multimodal.decodeAvFeatures(media).collect()
      .map(m => m.media_id -> m).toMap
    out(1L).sample_rate shouldBe 8000
    out(1L).rms shouldBe compressedWavRms(synthUlawBytes(1L)).get +- 1e-12
    out(2L).rms shouldBe wavRms(synthAvBytes(1L)).get +- 1e-12
  }

  test("decodeImageFeatures: per-partition codec over the binary column") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    val media = spark.createDataset((0L until 30L).map(id =>
      MediaRow(id, "image", synthImageBytes(id))) :+
      MediaRow(99L, "image", Array[Byte](9, 9, 9)))
    val out = Multimodal.decodeImageFeatures(media).collect()
      .map(m => m.media_id -> m).toMap
    out(0L).format shouldBe "png"
    out(0L).width shouldBe 5
    out(1L).format shouldBe "gif"
    out(2L).format shouldBe "jpeg"
    out(99L) shouldBe ImgMeta(99L, "unknown", 0, 0, 0.0)
    // agreement with the AV dispatch path (same codec, same numbers)
    val av = Multimodal.decodeAvFeatures(media).collect()
      .map(m => m.media_id -> m).toMap
    for (id <- 0L until 30L) {
      av(id).width shouldBe out(id).width
      av(id).height shouldBe out(id).height
      av(id).mean_px shouldBe out(id).mean_px
    }
  }
}

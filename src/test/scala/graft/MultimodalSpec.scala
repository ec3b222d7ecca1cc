package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Multimodal

/** Multimodal plumbing: schema, batched kernel shape, 1→N frame
  * sampling, metadata resize. (Decode kernels are documented stubs.) */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val media = Multimodal.generate(spark, 90L).cache()

  test("generator: binary payloads with typed metadata, 3 kinds") {
    val rows = media.collect()
    rows.length shouldBe 90
    all(rows.map(_.payload.length)) shouldBe 32 // two md5 digests
    rows.map(_.kind).distinct.sorted shouldBe Array("audio", "image", "video")
  }

  test("feature extraction: fixed 8-dim vectors, deterministic, batched") {
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    all(f1.map(_.features.length)) shouldBe 8
    f1.zip(f2).foreach { case (a, b) => a.features.toSeq shouldBe b.features.toSeq }
  }

  test("frame sampling: 1→N generator only for video, ts monotone") {
    val frames = Multimodal.sampleFrames(spark, media).collect()
    frames.length should be > 0
    val videoIds = media.filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    all(frames.map(_.media_id)) should (be >= 0L)
    frames.map(_.media_id).toSet.subsetOf(videoIds) shouldBe true
    frames.groupBy(_.media_id).values.foreach { fs =>
      fs.sortBy(_.frame_idx).map(_.frame_ts_ms).toSeq shouldBe
        fs.map(_.frame_ts_ms).sorted.toSeq
    }
  }

  test("sub-second videos sample zero frames (no bogus negative indices)") {
    import spark.implicits._
    val short = Seq(Multimodal.Media(99L, "video", Array[Byte](1,2,3,4,5,6,7,8), 64, 64, 500)).toDS()
    Multimodal.sampleFrames(spark, short).count() shouldBe 0L
  }

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def wavBytes(rate: Int, samples: Array[Int], extraChunk: Boolean = false): Array[Byte] = {
    val data = samples.map(_.toByte)
    val extra = if (extraChunk) "LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0) else Array.empty[Byte] // odd size => pad byte
    val body = "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate) ++ le16(1) ++ le16(8) ++
      extra ++ "data".getBytes ++ le32(data.length) ++ data
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  test("WAV kernel: known-answer stats on a hand-built 8-bit PCM file") {
    val s = Multimodal.WavKernel.stats(7L, wavBytes(8000, Array(128, 255, 0, 130)))
    s shouldBe Multimodal.WavStats(7L, 8000, 4, 0, 128,
      127L * 127 + 128L * 128 + 4, math.sqrt((127L * 127 + 128L * 128 + 4) / 4.0), 2)
  }

  test("WAV kernel: real chunk walker skips unknown odd-sized chunks (RIFF padding)") {
    val s = Multimodal.WavKernel.stats(8L, wavBytes(12000, Array(130, 126), extraChunk = true))
    s.sample_rate shouldBe 12000
    s.n_samples shouldBe 2
    s.peak_amp shouldBe 2
  }

  test("WAV kernel: malformed payloads fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.WavKernel.stats(9L, Array.fill[Byte](44)(0))
    val notPcm = wavBytes(8000, Array(128))
    notPcm(20) = 3 // audioFormat = IEEE float
    an[IllegalArgumentException] should be thrownBy Multimodal.WavKernel.stats(9L, notPcm)
  }

  test("generated WAVs are genuine files: the JDK's own parser agrees on every row") {
    import javax.sound.sampled.AudioSystem
    Multimodal.generateWav(spark, 60L).collect().foreach { row =>
      val id = row.getLong(0)
      val bytes = row.getAs[Array[Byte]](1)
      val fmt = AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      fmt.getType.getExtension shouldBe "wav"
      fmt.getFormat.getSampleRate shouldBe (8000 + (id % 3) * 4000).toFloat
      fmt.getFormat.getSampleSizeInBits shouldBe 8
      fmt.getFormat.getChannels shouldBe 1
      fmt.getFrameLength shouldBe (16 + id % 17)
      // and our kernel agrees with the JDK on the header fields
      val s = Multimodal.WavKernel.stats(id, bytes)
      s.sample_rate shouldBe fmt.getFormat.getSampleRate.toInt
      s.n_samples shouldBe fmt.getFrameLength
    }
  }

  test("resize metadata: aspect-preserving, never upscales") {
    val r = Multimodal.resizeMeta(media, maxDim = 100).collect()
    r.foreach { row =>
      val (w, h) = (row.getAs[Int]("out_width"), row.getAs[Int]("out_height"))
      w should be <= math.max(100, row.getAs[Int]("width"))
      h should be <= math.max(100, row.getAs[Int]("height"))
      math.max(w, h) should be <= 100
    }
  }

  /** Hand-built 24bpp BMP: `rows` is the IMAGE top-down, each pixel
    * (r,g,b) — the builder does the bottom-up flip and BGR byte order
    * the format requires, with non-zero pad bytes (decoders must skip
    * them; a kernel that sums them is caught). */
  private def bmpBytes(rows: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h = rows.length
    val w = rows.head.length
    val rowSize = ((w * 3 + 3) / 4) * 4
    val px = rows.reverse.flatMap { r => // file stores bottom row first
      r.flatMap { case (pr, pg, pb) => Seq(pb.toByte, pg.toByte, pr.toByte) } ++
        Seq.fill(rowSize - w * 3)(0x5a.toByte)
    }.toArray
    "BM".getBytes ++ le32(54 + px.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(px.length) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ px
  }

  test("BMP kernel: known-answer stats pin bottom-up rows, BGR order, pad skipping") {
    // 2x2 image, distinct channels everywhere; rowSize 8 => 2 pad bytes/row
    val s = Multimodal.BmpKernel.stats(3L, bmpBytes(Seq(
      Seq((1, 2, 3), (4, 5, 6)), Seq((7, 8, 9), (10, 11, 12)))))
    s.width shouldBe 2
    s.height shouldBe 2
    s.n_px shouldBe 4
    s.sum_r shouldBe 22L // 1+4+7+10 — pad bytes (0x5a) excluded
    s.sum_g shouldBe 26L
    s.sum_b shouldBe 30L
    s.luma_sum shouldBe 299L * 22 + 587L * 26 + 114L * 30
    s.top_left shouldBe "010203" // image top-left = LAST file row, BGR reversed
  }

  test("BMP kernel: malformed payloads fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.BmpKernel.stats(9L, Array.fill[Byte](54)(0))
    val eightBpp = bmpBytes(Seq(Seq((1, 2, 3))))
    eightBpp(28) = 8 // bpp = 8 (palette form the kernel doesn't handle)
    an[IllegalArgumentException] should be thrownBy Multimodal.BmpKernel.stats(9L, eightBpp)
    val rle = bmpBytes(Seq(Seq((1, 2, 3))))
    rle(30) = 1 // compression = BI_RLE8
    an[IllegalArgumentException] should be thrownBy Multimodal.BmpKernel.stats(9L, rle)
  }

  test("generated BMPs are genuine files: the JDK's ImageIO agrees on every row") {
    import javax.imageio.ImageIO
    Multimodal.generateBmp(spark, 60L).collect().foreach { row =>
      val id = row.getLong(0)
      val bytes = row.getAs[Array[Byte]](1)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      img should not be null
      img.getWidth shouldBe (2 + id % 4).toInt
      img.getHeight shouldBe (2 + id % 3).toInt
      val s = Multimodal.BmpKernel.stats(id, bytes)
      s.width shouldBe img.getWidth
      s.height shouldBe img.getHeight
      s.top_left shouldBe f"${img.getRGB(0, 0) & 0xffffff}%06x"
      // channel sums agree with the JDK's full decode
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
      }
      (s.sum_r, s.sum_g, s.sum_b) shouldBe ((sr, sg, sb))
    }
  }
}

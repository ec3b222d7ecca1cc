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
}

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

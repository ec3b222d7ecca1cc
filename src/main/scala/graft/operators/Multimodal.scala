package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video travel as opaque
 * `binary` payloads with typed metadata; decode / feature-extraction /
 * resize / frame-sampling run as batched per-partition stages.
 *
 * The DECODE KERNELS ARE STUBS — this container has no image/audio
 * codecs — marked `stubDecode*` and implemented as deterministic
 * byte-derived fakes. Everything around them is real and tested: the
 * schema, the batched iterator shape (the same contract a Pandas-UDF /
 * `mapInPandas` stage has in PySpark — fixed-size batches in, rows
 * out), the 1→N frame-sampling generator, and the partitioning.
 */
object Multimodal {

  case class Media(media_id: Long, kind: String, payload: Array[Byte],
                   width: Int, height: Int, duration_ms: Int)
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame_ts_ms: Int,
                   thumb: Array[Byte])

  /** Deterministic synthetic media table (payload = md5-stretched bytes;
    * generation is pure column work, distributed). */
  def generate(spark: SparkSession, n: Long): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).selectExpr(
      "id AS media_id",
      "CASE CAST(id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
      "unhex(concat(md5(CAST(id AS STRING)), md5(CAST(id + 1 AS STRING)))) AS payload",
      "CAST(64 + id % 192 AS INT) AS width",
      "CAST(64 + id % 128 AS INT) AS height",
      "CAST(CASE WHEN id % 3 = 2 THEN 1000 + id % 9000 ELSE 0 END AS INT) AS duration_ms"
    ).as[Media]
  }

  /** STUB decode+embed kernel: a real implementation would decode the
    * payload (JPEG/PCM/container) and run a vision/audio encoder; the
    * deterministic fake derives an 8-dim feature vector from payload
    * bytes so the surrounding plumbing is testable end-to-end. */
  private def stubDecodeEmbed(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out.map(v => v / math.max(1, payload.length / 8).toFloat)
  }

  val FeatureBatch = 32

  /** Batched feature extraction: partitions stream through the kernel in
    * fixed-size batches (the mapInPandas batch contract), never
    * materializing a partition in memory. */
  def extractFeatures(spark: SparkSession, media: Dataset[Media]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(FeatureBatch).flatMap { batch =>
        // a real kernel would process `batch` as one tensor/arrow block
        batch.map(m => MediaFeatures(m.media_id, m.kind, stubDecodeEmbed(m.payload)))
      }
    }
  }

  /** 1→N frame sampling for video rows (one frame per second, max 5):
    * a generator/UDTF-shaped op — explode over a computed sequence; the
    * thumb decode is the stub (payload slice). */
  def sampleFrames(spark: SparkSession, media: Dataset[Media]): Dataset[Frame] = {
    import spark.implicits._
    media.toDF()
      .filter(col("kind") === "video")
      .withColumn("frame_idx", explode(
        // sub-second videos yield ZERO frames: sequence(0,-1) would
        // generate a DESCENDING [0,-1] — guard with an empty array
        when(col("duration_ms") >= 1000,
          sequence(lit(0), least(lit(4), (col("duration_ms") / 1000).cast("int") - 1)))
          .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType)))))
      .selectExpr("media_id", "frame_idx",
        "CAST(frame_idx * 1000 AS INT) AS frame_ts_ms",
        "substr(payload, frame_idx * 4 + 1, 4) AS thumb")
      .as[Frame]
  }

  /** Metadata-only resize: the payload transform is the decode stub's
    * concern; the metadata arithmetic (aspect-preserving fit) is real. */
  def resizeMeta(media: Dataset[Media], maxDim: Int): DataFrame =
    media.toDF().withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("out_width", round(col("width") * col("scale")).cast("int"))  // round, not ceil: w*(maxDim/w) can land at maxDim+ε
      .withColumn("out_height", round(col("height") * col("scale")).cast("int"))
      .select("media_id", "kind", "width", "height", "out_width", "out_height")

  // ---- driver-gate twins: the deterministic media table is generated
  // in-engine, and its SQL-exact pieces (frame sampling, resize
  // arithmetic, binary slicing) carry DuckDB oracles built from the same
  // generate_series derivation — so the multimodal plumbing has
  // hash-checked correctness rows, not just specs. The float feature
  // kernel stays spec-only (float32 accumulation is not SQL-portable).

  val GateRows = 500L

  /** Thumbs are compared as lowercase hex (DuckDB can't substring a
    * BLOB); the hex slice is byte-for-byte the binary thumb. */
  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(spark, generate(spark, GateRows)).toDF()
      .selectExpr("media_id", "frame_idx", "frame_ts_ms",
        "lower(hex(thumb)) AS thumb_hex")

  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resizeMeta(generate(spark, GateRows), maxDim = 128)

  private val mediaCte: String =
    s"""WITH media AS (
       |  SELECT s AS media_id,
       |    CASE CAST(s % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    unhex(md5(CAST(s AS VARCHAR)) || md5(CAST(s + 1 AS VARCHAR))) AS payload,
       |    CAST(64 + s % 192 AS INT) AS width,
       |    CAST(64 + s % 128 AS INT) AS height,
       |    CAST(CASE WHEN s % 3 = 2 THEN 1000 + s % 9000 ELSE 0 END AS INT) AS duration_ms
       |  FROM generate_series(0, ${GateRows - 1}) AS g(s)
       |)""".stripMargin

  val framesOracle: String =
    s"""$mediaCte
       |SELECT media_id, CAST(f AS INT) AS frame_idx,
       |  CAST(f * 1000 AS INT) AS frame_ts_ms,
       |  substr(md5(CAST(media_id AS VARCHAR)) || md5(CAST(media_id + 1 AS VARCHAR)),
       |         CAST(f * 8 + 1 AS INT), 8) AS thumb_hex
       |FROM media, LATERAL unnest(generate_series(0, least(4, duration_ms // 1000 - 1))) AS t(f)
       |WHERE kind = 'video' AND duration_ms >= 1000""".stripMargin

  /** Audio quality gate (the audio twin of the image/video gates): mean
    * byte amplitude of the (stub-PCM) payload, with a silence/clipping
    * keep band (tuned so the md5-uniform stub payloads land on BOTH sides) — the shape of a loudness filter in a training pipeline.
    * Byte arithmetic runs over the lowercase-hex rendering in BOTH
    * engines (DuckDB cannot slice BLOBs), so amp_sum is integer-exact
    * and the mean is one correctly-rounded division. */
  def audioGateQuery(spark: SparkSession, dir: String): DataFrame =
    generate(spark, GateRows).toDF()
      .filter(col("kind") === "audio")
      .selectExpr("media_id", "lower(hex(payload)) AS h")
      .selectExpr("media_id",
        "aggregate(sequence(1, length(h) div 2), 0L, (acc, i) -> acc + CAST(conv(substring(h, i*2-1, 2), 16, 10) AS BIGINT)) AS amp_sum",
        "length(h) div 2 AS n_bytes")
      .selectExpr("media_id", "amp_sum",
        "round(amp_sum / CAST(n_bytes AS DOUBLE), 6) AS mean_amp")
      .selectExpr("media_id", "amp_sum", "mean_amp",
        "mean_amp >= 120.0 AND mean_amp <= 135.0 AS pass")

  val audioGateOracle: String =
    s"""$mediaCte
       |SELECT media_id, amp_sum,
       |  round(amp_sum / CAST(n_bytes AS DOUBLE), 6) AS mean_amp,
       |  (round(amp_sum / CAST(n_bytes AS DOUBLE), 6) >= 120.0 AND
       |   round(amp_sum / CAST(n_bytes AS DOUBLE), 6) <= 135.0) AS pass
       |FROM (
       |  SELECT media_id,
       |    CAST(list_reduce(list_transform(generate_series(1, length(h) // 2),
       |      i -> ('0x' || substr(h, i * 2 - 1, 2))::BIGINT), (a, b) -> a + b) AS BIGINT) AS amp_sum,
       |    CAST(length(h) // 2 AS BIGINT) AS n_bytes
       |  FROM (SELECT media_id, lower(hex(payload)) AS h FROM media WHERE kind = 'audio'))""".stripMargin

  val resizeOracle: String =
    s"""$mediaCte
       |SELECT media_id, kind, width, height,
       |  CAST(round(width * scale) AS INT) AS out_width,
       |  CAST(round(height * scale) AS INT) AS out_height
       |FROM (SELECT *, least(1.0, 128 / CAST(greatest(width, height) AS DOUBLE)) AS scale
       |      FROM media)""".stripMargin
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video travel as opaque
 * `binary` payloads with typed metadata; decode / feature-extraction /
 * resize / frame-sampling run as batched per-partition stages.
 *
 * AUDIO and IMAGE decode are REAL where the format is pure byte
 * arithmetic: [[WavKernel]] walks RIFF chunks, parses the PCM format
 * header, and computes sample statistics from the raw bytes;
 * [[BmpKernel]] parses the BMP headers and walks the bottom-up padded
 * 24bpp pixel array — each with a hex-arithmetic DuckDB oracle over the
 * same bytes ([[wavOracle]]/[[bmpOracle]]). Compressed-codec decode
 * (JPEG, video containers) remains a STUB — this container has no
 * codecs — marked `stubDecodeEmbed` and implemented as a deterministic
 * byte-derived fake. Everything around that stub is real and tested:
 * the schema, the batched iterator shape (the same contract a
 * Pandas-UDF / `mapInPandas` stage has in PySpark — fixed-size batches
 * in, rows out), the 1→N frame-sampling generator, and the
 * partitioning.
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

  /** STUB decode+embed kernel (compressed codecs only — WAV and BMP
    * have the real [[WavKernel]]/[[BmpKernel]] below): a real
    * implementation would decode the
    * payload (JPEG/container) and run a vision encoder; the
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

  // ---- REAL audio decode: RIFF/WAVE PCM is pure byte arithmetic, no
  // codec needed. The table is generated in-engine as genuine WAV files
  // (44-byte canonical header + 8-bit mono PCM), the kernel is a real
  // chunk-walking parser over the raw bytes, and the DuckDB twin
  // re-parses the SAME fields from the hex rendering — so a wrong
  // header byte, a wrong little-endian decode, or a wrong sample stat
  // all hash-mismatch.

  case class WavStats(media_id: Long, sample_rate: Int, n_samples: Int,
                      duration_ms: Int, peak_amp: Int, sq_sum: Long,
                      rms: Double, clip_count: Int)

  /** Real RIFF/WAVE parser + PCM sample statistics. Walks chunks (with
    * RIFF word alignment) rather than assuming fixed offsets, validates
    * magics and the PCM format, and computes loudness stats over the
    * unsigned 8-bit samples: peak |s-128|, integer-exact sum of squared
    * deviations (so the oracle can match it exactly), RMS, and the
    * clipped-sample count. Throws on malformed input — a corrupt media
    * row should fail loudly, not score silently. */
  object WavKernel {
    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32le(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def stats(mediaId: Long, b: Array[Byte]): WavStats = {
      require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        s"media $mediaId: not a RIFF/WAVE payload")
      var pos = 12
      var rate = -1
      var bits = -1
      var channels = -1
      var dataOff = -1
      var dataLen = -1
      while (pos + 8 <= b.length && (rate < 0 || dataOff < 0)) {
        val id = tag(b, pos)
        val size = u32le(b, pos + 4).toInt
        if (id == "fmt ") {
          require(u16le(b, pos + 8) == 1, s"media $mediaId: not PCM")
          channels = u16le(b, pos + 10)
          rate = u32le(b, pos + 12).toInt
          bits = u16le(b, pos + 22)
        } else if (id == "data") {
          dataOff = pos + 8
          dataLen = size
        }
        pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      require(rate > 0 && dataOff >= 0 && dataOff + dataLen <= b.length,
        s"media $mediaId: missing fmt/data chunk")
      require(bits == 8 && channels == 1,
        s"media $mediaId: kernel handles 8-bit mono PCM, got $bits-bit x$channels")
      var i = dataOff
      var peak = 0
      var sq = 0L
      var clip = 0
      while (i < dataOff + dataLen) {
        val v = b(i) & 0xff
        val d = v - 128
        val a = if (d < 0) -d else d
        if (a > peak) peak = a
        sq += d.toLong * d
        if (v == 0 || v == 255) clip += 1
        i += 1
      }
      // rms left UNROUNDED here; the query rounds via Spark SQL round()
      // so the cross-engine rounding path is the same one every other
      // oracle query already proves against DuckDB
      WavStats(mediaId, rate, dataLen, (dataLen.toLong * 1000L / rate).toInt,
        peak, sq, math.sqrt(sq.toDouble / dataLen), clip)
    }
  }

  /** Little-endian hex of an n-byte integer field, as a SQL fragment —
    * same construction in Spark (format_string) and DuckDB (printf). */
  private def leHex(expr: String, bytes: Int, printfFn: String): String = {
    val s = s"$printfFn('%0${bytes * 2}x', $expr)"
    (0 until bytes).map(i => s"substr($s, ${2 * (bytes - 1 - i) + 1}, 2)")
      .mkString(" || ")
  }

  /** The WAV table's hex image: canonical 44-byte PCM header + 8-bit
    * mono samples taken from md5 bytes; rate/length vary per row so the
    * header arithmetic is exercised, not constant-folded. */
  private def wavHexSql(printfFn: String, idExpr: String, md5Cast: String): String = {
    val rate = s"(8000 + ($idExpr % 3) * 4000)"
    val n = s"(16 + ($idExpr % 17))"
    s"'52494646' || ${leHex(s"(36 + $n)", 4, printfFn)} || '57415645'" + // RIFF size WAVE
      s" || '666d7420' || '10000000' || '0100' || '0100'" + // fmt :16, PCM, mono
      s" || ${leHex(rate, 4, printfFn)} || ${leHex(rate, 4, printfFn)}" + // rate, byteRate(=rate: mono 8-bit)
      s" || '0100' || '0800' || '64617461' || ${leHex(n, 4, printfFn)}" + // align 1, 8 bits, data, size
      s" || substr(md5(CAST($idExpr AS $md5Cast)) || md5(CAST($idExpr + 17 AS $md5Cast)), 1, $n * 2)"
  }

  /** Deterministic WAV media table: genuine playable RIFF bytes. */
  def generateWav(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr("id AS media_id",
      s"unhex(${wavHexSql("format_string", "id", "STRING")}) AS payload")

  /** Batched REAL decode over the WAV table (same batch contract as
    * [[extractFeatures]]). */
  def wavQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    generateWav(spark, GateRows).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(FeatureBatch).flatMap(
        _.map { case (id, payload) => WavKernel.stats(id, payload) }))
      .toDF()
      .withColumn("rms", round(col("rms"), 6))
  }

  /** DuckDB twin: rebuilds the same hex image, then PARSES the header
    * fields back out of the hex (LE byte swaps) and recomputes the
    * sample stats — nothing is taken from the generator parameters
    * except the bytes themselves. */
  val wavOracle: String = {
    def u32le(bytePos: Int) = // 1-based byte position in the hex image
      s"('0x' || substr(h, ${2 * (bytePos + 3) - 1}, 2) || substr(h, ${2 * (bytePos + 2) - 1}, 2)" +
        s" || substr(h, ${2 * (bytePos + 1) - 1}, 2) || substr(h, ${2 * bytePos - 1}, 2))::BIGINT"
    s"""WITH wav AS (
       |  SELECT s AS media_id, ${wavHexSql("printf", "s", "VARCHAR")} AS h
       |  FROM generate_series(0, ${GateRows - 1}) AS g(s)
       |), parsed AS (
       |  SELECT media_id, h,
       |    ${u32le(25)} AS sample_rate,
       |    ${u32le(41)} AS data_len
       |  FROM wav
       |), samples AS (
       |  SELECT media_id, sample_rate, data_len,
       |    list_transform(generate_series(45, 44 + CAST(data_len AS INT)),
       |      i -> ('0x' || substr(h, 2 * i - 1, 2))::BIGINT - 128) AS d
       |  FROM parsed)
       |SELECT media_id,
       |  CAST(sample_rate AS INT) AS sample_rate,
       |  CAST(data_len AS INT) AS n_samples,
       |  CAST(data_len * 1000 // sample_rate AS INT) AS duration_ms,
       |  CAST(list_max(list_transform(d, v -> abs(v))) AS INT) AS peak_amp,
       |  CAST(list_sum(list_transform(d, v -> v * v)) AS BIGINT) AS sq_sum,
       |  round(sqrt(CAST(list_sum(list_transform(d, v -> v * v)) AS DOUBLE) / data_len), 6) AS rms,
       |  CAST(len(list_filter(d, v -> v = -128 OR v = 127)) AS INT) AS clip_count
       |FROM samples""".stripMargin
  }

  val resizeOracle: String =
    s"""$mediaCte
       |SELECT media_id, kind, width, height,
       |  CAST(round(width * scale) AS INT) AS out_width,
       |  CAST(round(height * scale) AS INT) AS out_height
       |FROM (SELECT *, least(1.0, 128 / CAST(greatest(width, height) AS DOUBLE)) AS scale
       |      FROM media)""".stripMargin

  // ---- REAL image decode: BMP (BITMAPINFOHEADER, 24bpp BI_RGB) is,
  // like WAV, pure byte arithmetic — no codec needed. The subtle parts a
  // fake can't exercise are real here: the BOTTOM-UP row order (file row
  // 0 is the image's bottom row) and the 4-byte row padding (pad bytes
  // must be EXCLUDED from every statistic). The table is generated
  // in-engine as genuine viewable BMP bytes, and the DuckDB twin
  // re-parses width/height/offset from the hex image and recomputes the
  // stats pixel-by-pixel — a wrong row stride, an off-by-one in the
  // padding, or an RGB/BGR mixup all hash-mismatch (top_left pins the
  // row-order + channel-order decode specifically).

  case class BmpStats(media_id: Long, width: Int, height: Int, n_px: Int,
                      sum_r: Long, sum_g: Long, sum_b: Long, luma_sum: Long,
                      mean_luma: Double, top_left: String)

  /** Real BMP parser + pixel statistics over 24bpp BI_RGB payloads:
    * per-channel integer-exact sums, a 1000×-scaled integer luma sum
    * (299R+587G+114B — exact, so the oracle matches it bit-for-bit),
    * and the top-left pixel as rrggbb hex (file stores B,G,R bottom-up;
    * getting this right requires navigating both). Throws on malformed
    * input — corrupt media should fail loudly, not score silently. */
  object BmpKernel {
    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32le(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    def stats(mediaId: Long, b: Array[Byte]): BmpStats = {
      require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
        s"media $mediaId: not a BMP payload")
      val dataOff = u32le(b, 10).toInt
      require(u32le(b, 14) == 40L, s"media $mediaId: BITMAPINFOHEADER expected")
      val w = u32le(b, 18).toInt // positive i32le => bottom-up pixel array
      val h = u32le(b, 22).toInt
      require(u16le(b, 26) == 1 && u16le(b, 28) == 24,
        s"media $mediaId: kernel handles single-plane 24bpp")
      require(u32le(b, 30) == 0L, s"media $mediaId: BI_RGB (uncompressed) expected")
      val rowSize = ((w * 3 + 3) / 4) * 4 // rows padded to 4-byte boundaries
      require(w > 0 && h > 0 && dataOff + rowSize.toLong * h <= b.length,
        s"media $mediaId: truncated pixel array")
      var sumR = 0L; var sumG = 0L; var sumB = 0L; var luma = 0L
      var y = 0
      while (y < h) { // y walks the IMAGE top-down; the file stores bottom-up
        val base = dataOff + (h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val o = base + x * 3
          val pb = b(o) & 0xff; val pg = b(o + 1) & 0xff; val pr = b(o + 2) & 0xff
          sumB += pb; sumG += pg; sumR += pr
          luma += 299L * pr + 587L * pg + 114L * pb
          x += 1
        }
        y += 1
      }
      val tl = dataOff + (h - 1) * rowSize
      val topLeft = f"${b(tl + 2) & 0xff}%02x${b(tl + 1) & 0xff}%02x${b(tl) & 0xff}%02x"
      // mean_luma left UNROUNDED; the query rounds via Spark SQL round()
      BmpStats(mediaId, w, h, w * h, sumR, sumG, sumB, luma,
        luma.toDouble / (1000.0 * w * h), topLeft)
    }
  }

  /** The BMP table's hex image: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + bottom-up padded 24bpp rows from md5 bytes.
    * Width/height vary per row so stride and padding are exercised, not
    * constant-folded (w=4 rows have zero padding, the others 1-3 pad
    * bytes — both paths covered). `divOp` is the engine's integer-div
    * spelling (Spark `div`, DuckDB `//`). */
  private def bmpHexSql(printfFn: String, idExpr: String, md5Cast: String,
                        divOp: String): String = {
    val w = s"(2 + $idExpr % 4)"
    val h = s"(2 + $idExpr % 3)"
    val rowSize = s"((($w * 3 + 3) $divOp 4) * 4)"
    val dataLen = s"($rowSize * $h)"
    s"'424d' || ${leHex(s"(54 + $dataLen)", 4, printfFn)} || '00000000' || '36000000'" + // BM, file size, reserved, data offset 54
      s" || '28000000' || ${leHex(w, 4, printfFn)} || ${leHex(h, 4, printfFn)}" + // DIB 40, width, height (+ => bottom-up)
      s" || '0100' || '1800' || '00000000' || ${leHex(dataLen, 4, printfFn)}" + // 1 plane, 24bpp, BI_RGB, image size
      s" || '130b0000' || '130b0000' || '00000000' || '00000000'" + // 2835 ppm x2, palette 0/0
      s" || substr(md5(CAST($idExpr AS $md5Cast)) || md5(CAST($idExpr + 31 AS $md5Cast))" +
      s" || md5(CAST($idExpr + 62 AS $md5Cast)) || md5(CAST($idExpr + 93 AS $md5Cast)), 1, $dataLen * 2)"
  }

  /** Deterministic BMP media table: genuine viewable bitmap bytes. */
  def generateBmp(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr("id AS media_id",
      s"unhex(${bmpHexSql("format_string", "id", "STRING", "div")}) AS payload")

  /** Batched REAL image decode over the BMP table (same batch contract
    * as [[extractFeatures]]). */
  def bmpQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    generateBmp(spark, GateRows).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(FeatureBatch).flatMap(
        _.map { case (id, payload) => BmpKernel.stats(id, payload) }))
      .toDF()
      .withColumn("mean_luma", round(col("mean_luma"), 6))
  }

  /** DuckDB twin: rebuilds the hex image, re-parses data offset, width,
    * and height out of the header bytes, and walks the pixel array with
    * the same bottom-up stride arithmetic. */
  val bmpOracle: String = {
    def u32le(bytePos: Int) = // 1-based byte position in the hex image
      s"('0x' || substr(h, ${2 * (bytePos + 3) - 1}, 2) || substr(h, ${2 * (bytePos + 2) - 1}, 2)" +
        s" || substr(h, ${2 * (bytePos + 1) - 1}, 2) || substr(h, ${2 * bytePos - 1}, 2))::BIGINT"
    // byte(o): the unsigned byte at 0-based offset o of the binary image
    val byteAt = "('0x' || substr(h, 2 * CAST(%s AS INT) + 1, 2))::BIGINT"
    def bAt(o: String) = byteAt.format(o)
    s"""WITH bmp AS (
       |  SELECT s AS media_id, ${bmpHexSql("printf", "s", "VARCHAR", "//")} AS h
       |  FROM generate_series(0, ${GateRows - 1}) AS g(s)
       |), parsed AS (
       |  SELECT media_id, h,
       |    ${u32le(11)} AS data_off, ${u32le(19)} AS w, ${u32le(23)} AS hh
       |  FROM bmp
       |), px AS (
       |  SELECT media_id, h, w, hh,
       |    flatten(list_transform(generate_series(0, CAST(hh - 1 AS INT)), y ->
       |      list_transform(generate_series(0, CAST(w - 1 AS INT)), x ->
       |        data_off + (hh - 1 - y) * (((w * 3 + 3) // 4) * 4) + x * 3))) AS offs,
       |    data_off + (hh - 1) * (((w * 3 + 3) // 4) * 4) AS tl
       |  FROM parsed)
       |SELECT media_id, CAST(w AS INT) AS width, CAST(hh AS INT) AS height,
       |  CAST(w * hh AS INT) AS n_px,
       |  CAST(list_sum(list_transform(offs, o -> ${bAt("o + 2")})) AS BIGINT) AS sum_r,
       |  CAST(list_sum(list_transform(offs, o -> ${bAt("o + 1")})) AS BIGINT) AS sum_g,
       |  CAST(list_sum(list_transform(offs, o -> ${bAt("o")})) AS BIGINT) AS sum_b,
       |  CAST(list_sum(list_transform(offs, o ->
       |    299 * ${bAt("o + 2")} + 587 * ${bAt("o + 1")} + 114 * ${bAt("o")})) AS BIGINT) AS luma_sum,
       |  round(CAST(list_sum(list_transform(offs, o ->
       |    299 * ${bAt("o + 2")} + 587 * ${bAt("o + 1")} + 114 * ${bAt("o")})) AS DOUBLE)
       |    / (1000.0 * w * hh), 6) AS mean_luma,
       |  printf('%02x%02x%02x', ${bAt("tl + 2")}, ${bAt("tl + 1")}, ${bAt("tl")}) AS top_left
       |FROM px""".stripMargin
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Int8 embedding quantization + quantized ANN — the memory-reduction
 * path a 100 TB vector corpus takes (4x smaller vectors ⇒ 4x more of
 * the corpus resident per executor, and integer dot products on the
 * scan side). Per-vector affine quantization (the faiss
 * ScalarQuantizer / SQ8 scheme): code = round((x - lo) * 255 / (hi -
 * lo)) with per-vector (lo, hi), reconstruction x' = lo + code *
 * (hi - lo) / 255.
 *
 * The quantized cosine is computed EXACTLY from integer sufficient
 * statistics — Σc, Σc², and the pairwise Σ c_v·c_q are integer sums
 * (exact in any engine, any order), and the final combination
 *   dot' = n·lo_v·lo_q + lo_v·s_q·Σc_q + lo_q·s_v·Σc_v + s_v·s_q·X
 * is one fixed double expression — so the whole train of arithmetic is
 * bit-identical cross-engine and the oracle hash-matches, recall
 * measured against the exact [[Similarity.annTopK]] in QuantizeSpec.
 *
 * Scale shape: quantization is pure map-side; the ANN side broadcasts
 * the quantized query row and aggregates integer products map-side —
 * same plan as annTopK with a quarter of the bytes scanned.
 */
object Quantize {

  /** Quantized view: scalars + the integer sufficient statistics.
    * Codes ride along as an array for scoring; the query surface
    * serializes them as a string (drivers hash scalar columns). */
  private[operators] def qframe(spark: SparkSession, dir: String): DataFrame =
    Inputs.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding",
        "CAST(array_min(embedding) AS DOUBLE) AS lo",
        "CAST(array_max(embedding) AS DOUBLE) AS hi")
      .selectExpr("vec_id", "embedding", "lo", "hi",
        "(hi - lo) / 255.0 AS s",
        """CASE WHEN hi = lo THEN transform(embedding, x -> 0)
          |ELSE transform(embedding, x ->
          |  CAST(round((CAST(x AS DOUBLE) - lo) * 255.0 / (hi - lo)) AS INT))
          |END AS codes""".stripMargin)
      .selectExpr("vec_id", "embedding", "lo", "hi", "s", "codes",
        "CAST(size(codes) AS INT) AS n",
        "aggregate(codes, 0L, (a, x) -> a + x) AS s_sum",
        "aggregate(codes, 0L, (a, x) -> a + x * x) AS s_sq")

  /** q_embed_quantize: per-vector quantization stats + worst-case
    * reconstruction error (bounded by (hi-lo)/510). */
  def quantize(spark: SparkSession, dir: String): DataFrame =
    qframe(spark, dir)
      .selectExpr("vec_id", "round(lo, 6) AS lo", "round(hi, 6) AS hi",
        "n", "s_sum", "s_sq",
        "array_join(transform(codes, c -> CAST(c AS STRING)), ',') AS codes_str",
        "round(array_max(zip_with(embedding, codes, (x, c) -> abs(CAST(x AS DOUBLE) - (lo + c * (hi - lo) / 255.0)))), 6) AS max_abs_err")

  def quantizeOracle: String =
    s"""WITH mm AS (
       |  SELECT vec_id, embedding,
       |    CAST(list_min(embedding) AS DOUBLE) AS lo,
       |    CAST(list_max(embedding) AS DOUBLE) AS hi
       |  FROM embeddings
       |), qc AS (
       |  SELECT vec_id, embedding, lo, hi,
       |    CASE WHEN hi = lo THEN list_transform(embedding, x -> 0)
       |    ELSE list_transform(embedding, x ->
       |      CAST(round((CAST(x AS DOUBLE) - lo) * 255.0 / (hi - lo)) AS INT))
       |    END AS codes
       |  FROM mm
       |)
       |SELECT vec_id, round(lo, 6) AS lo, round(hi, 6) AS hi,
       |  CAST(len(codes) AS INT) AS n,
       |  CAST(list_sum(codes) AS BIGINT) AS s_sum,
       |  CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT) AS s_sq,
       |  array_to_string(codes, ',') AS codes_str,
       |  round(list_max(list_transform(generate_series(1, len(codes)),
       |    i -> abs(CAST(embedding[i] AS DOUBLE) - (lo + codes[i] * (hi - lo) / 255.0)))), 6) AS max_abs_err
       |FROM qc""".stripMargin

  /** The exact quantized-cosine expression over the joined
    * (corpus × query) columns — ONE fixed formula, written identically
    * in the oracle, so doubles agree to the bit. */
  private[operators] val qcosSql: String = {
    val dot = "n * lo * q_lo + lo * q_s * q_sum + q_lo * s * s_sum + s * q_s * x"
    val nv = "n * lo * lo + 2 * lo * s * s_sum + s * s * s_sq"
    val nq = "n * q_lo * q_lo + 2 * q_lo * q_s * q_sum + q_s * q_s * q_sq"
    s"round(($dot) / (sqrt($nv) * sqrt($nq)), 6)"
  }

  /** q_ann_quantized: top-k by cosine over the QUANTIZED vectors
    * (query = vec 0, like annTopK). Integer cross-products map-side,
    * broadcast query row, TakeOrderedAndProject — annTopK's plan at a
    * quarter of the vector bytes. */
  def annQuantized(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val f = qframe(spark, dir)
    val q = f.filter("vec_id = 0").selectExpr("codes AS q_codes",
      "lo AS q_lo", "s AS q_s", "s_sum AS q_sum", "s_sq AS q_sq")
    f.filter("vec_id <> 0")
      .join(broadcast(q))
      .selectExpr("vec_id", "lo", "s", "n", "s_sum", "s_sq",
        "q_lo", "q_s", "q_sum", "q_sq",
        "aggregate(zip_with(codes, q_codes, (a, b) -> a * b), 0L, (acc, x) -> acc + x) AS x")
      .selectExpr("vec_id", s"$qcosSql AS qcosine")
      .orderBy(desc("qcosine"), asc("vec_id"))
      .limit(k)
  }

  /** The quantized-stats CTE chain (mm → qf → st), shared by the
    * quantized-ANN oracles here and in [[Similarity]]. */
  private[operators] val statsCtes: String =
    s"""mm AS (
       |  SELECT vec_id, embedding,
       |    CAST(list_min(embedding) AS DOUBLE) AS lo,
       |    CAST(list_max(embedding) AS DOUBLE) AS hi
       |  FROM embeddings
       |), qf AS (
       |  SELECT vec_id, lo, (hi - lo) / 255.0 AS s,
       |    CASE WHEN hi = lo THEN list_transform(embedding, x -> 0)
       |    ELSE list_transform(embedding, x ->
       |      CAST(round((CAST(x AS DOUBLE) - lo) * 255.0 / (hi - lo)) AS INT))
       |    END AS codes
       |  FROM mm
       |), st AS (
       |  SELECT vec_id, lo, s, codes,
       |    CAST(len(codes) AS INT) AS n,
       |    CAST(list_sum(codes) AS BIGINT) AS s_sum,
       |    CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT) AS s_sq
       |  FROM qf
       |)""".stripMargin

  def annQuantizedOracle(k: Int = 10): String =
    s"""WITH $statsCtes, joined AS (
       |  SELECT e.vec_id, e.lo, e.s, e.n, e.s_sum, e.s_sq,
       |    q.lo AS q_lo, q.s AS q_s, q.s_sum AS q_sum, q.s_sq AS q_sq,
       |    CAST(list_sum(list_transform(generate_series(1, e.n),
       |      i -> e.codes[i] * q.codes[i])) AS BIGINT) AS x
       |  FROM st e CROSS JOIN (SELECT * FROM st WHERE vec_id = 0) q
       |  WHERE e.vec_id <> 0
       |)
       |SELECT vec_id, $qcosSql AS qcosine
       |FROM joined
       |ORDER BY qcosine DESC, vec_id ASC
       |LIMIT $k""".stripMargin
}

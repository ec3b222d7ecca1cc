package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filter, FineWeb-Edu-shaped (Penedo'24): distill
 * labels into a small linear classifier over hashed features, then
 * filter the corpus with the broadcast model. The production pattern
 * labels a sample with an LLM and trains offline; here the weak labels
 * come from the engine's own oracle-proven heuristic gate
 * ([[TextStats.quality]] `pass`), which makes the whole train+infer
 * chain deterministic and exactly DuckDB-checkable — and the operator
 * honestly demonstrates generalization by training only on the 90%
 * split (doc_id % [[HoldMod]] != 0) while scoring every doc.
 *
 * Features are [[LangIdModel]]-style hashed char trigrams, but
 * fixed-point LENGTH-NORMALIZED (count * Scale div n_grams) so short
 * and long documents carry equal update mass, plus one fastText-style
 * meta token (`__L<length decile>`) hashed into the same bucket space
 * — the standard trick that lets a bag-of-ngrams model express a
 * length rule directly.
 *
 * Training is an AVERAGED BATCH PERCEPTRON, all-integer: each epoch
 * scores the corpus against the current weights (one broadcast join +
 * one doc-keyed aggregation), aggregates the signed feature mass of
 * misclassified train docs into a weight delta (second aggregation),
 * and folds it in; the deployed model is the SUM of the post-epoch
 * weight states (same argmax as the average, still exact integers),
 * which settles the oscillation batch perceptrons exhibit on
 * non-separable data. Measured on sf0.01: 95.4% corpus agreement,
 * 100% on the held-out split (majority class is 86.8%).
 *
 * Scale shape: the feature frame is aggregated to (doc_id, bucket, c)
 * — far smaller than the raw gram explode — and cached across epochs;
 * each epoch is one broadcast-join scoring pass + two hash
 * aggregations; the weight frame never exceeds [[Buckets]]+1 rows, is
 * localCheckpointed per epoch (truncating the would-be-exponential
 * lineage), and ships to executors as a broadcast. Epochs are a small
 * constant, so training is O(Epochs) passes over the cached features
 * — and a real deployment trains once, then runs only the inference
 * half (one broadcast join + one aggregation, the LangIdModel plan).
 * Margins stay well inside BIGINT at test scale (|w| ≲ epochs ×
 * misclassified × 2·Scale); a 10^9-doc run rescales Scale down.
 */
object QualityModel {

  val Buckets = 1024
  val Scale = 1000000L
  val Epochs = 4
  val HoldMod = 10

  private val bucketSql =
    s"CAST(conv(substring(md5(gram), 1, 8), 16, 10) AS BIGINT) % $Buckets"

  /** (doc_id, bucket, c): length-normalized fixed-point trigram mass +
    * the length-decile meta token at full Scale. */
  private def features(docs: DataFrame): DataFrame = {
    val g = Inputs.spread(docs)
      .selectExpr("doc_id",
        "explode(filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)) AS tok")
      .selectExpr("doc_id", "concat('<', tok, '>') AS p")
      .selectExpr("doc_id",
        "explode(transform(sequence(1, length(p) - 2), i -> substring(p, i, 3))) AS gram")
      .selectExpr("doc_id", s"$bucketSql AS bucket")
    val ng = g.groupBy("doc_id").agg(count(lit(1)).as("ng"))
    val tri = g.groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      .join(ng, "doc_id")
      .selectExpr("doc_id", "bucket", s"(n * $Scale) div ng AS c")
    val meta = docs.selectExpr("doc_id",
      s"""CAST(conv(substring(md5(concat('__L',
         |  CAST(least(9, size(split(text, '\\\\s+')) div 10) AS STRING))), 1, 8), 16, 10)
         |AS BIGINT) % $Buckets AS bucket""".stripMargin,
      s"CAST($Scale AS BIGINT) AS c")
    tri.unionByName(meta)
      .groupBy("doc_id", "bucket").agg(sum("c").cast("long").as("c"))
  }

  /** q_quality_model: train the averaged perceptron on the 90% split,
    * score ALL docs with the averaged weights. Output keeps the weak
    * label and the holdout flag so distillation fidelity is auditable
    * per row. */
  def distill(spark: SparkSession, dir: String): DataFrame = {
    // labels and features are consumed by every epoch's scoring pass AND
    // the final inference pass (Epochs+1 = 5 consumers each): materialize
    // both ONCE per invocation via localCheckpoint — the r6 shape cached
    // feats but re-derived the quality scan 5x and, having unpersisted
    // feats before returning the lazy frame, re-ran the whole gram
    // explode inside the final scoring action. Checkpoint blocks are
    // released by the ContextCleaner once the returned frame dies, the
    // same lifecycle every other operator's localCheckpoint relies on.
    // (Probed: pre-repartitioning these by doc_id before the checkpoint
    // does NOT help — Spark 4.1's localCheckpoint scan reports
    // UnknownPartitioning, so the co-partitioning is invisible to the
    // epoch plans and the extra shuffle is pure cost.)
    val lab = TextStats.quality(spark, dir)
      .selectExpr("doc_id", "CASE WHEN pass THEN 1L ELSE -1L END AS y")
      .localCheckpoint()
    val feats = features(Inputs.documents(spark, dir)).localCheckpoint()

    def margins(w: DataFrame, b: Long): DataFrame =
      lab.join(feats, Seq("doc_id"), "left")
        .join(broadcast(w), Seq("bucket"), "left")
        .groupBy("doc_id", "y")
        .agg((coalesce(sum(col("c") * col("w")), lit(0L)) + lit(b * Scale))
          .cast("long").as("m"))

    var w = spark.range(0).selectExpr("id AS bucket", "id AS w")
    var wsum = w
    var b = 0L
    var bsum = 0L
    (1 to Epochs).foreach { _ =>
      // consumed twice per epoch (weight delta + bias delta) — cache the
      // slim (doc_id, y, m) frame instead of re-scoring the corpus
      val mis = margins(w, b)
        .filter(s"doc_id % $HoldMod <> 0 AND y * m <= 0").cache()
      val delta = mis.join(feats, "doc_id")
        .groupBy("bucket").agg(sum(col("y") * col("c")).cast("long").as("d"))
      w = w.join(delta, Seq("bucket"), "full_outer")
        .selectExpr("bucket", "CAST(coalesce(w, 0L) + coalesce(d, 0L) AS BIGINT) AS w")
        .localCheckpoint()
      // wsum stays LAZY: it only unions the ≤(Buckets+1)-row checkpointed
      // per-epoch weight states, so its one consumer (the final scoring
      // broadcast) evaluates a trivial plan — checkpointing it per epoch
      // paid one extra job per epoch for nothing
      wsum = wsum.unionByName(w)
        .groupBy("bucket").agg(sum("w").cast("long").as("w"))
      b += mis.agg(coalesce(sum("y"), lit(0L)).cast("long")).head().getLong(0)
      bsum += b
      // both consumers (delta's localCheckpoint, the bias sum) have run
      mis.unpersist()
    }
    margins(wsum, bsum)
      .selectExpr("doc_id", "m AS margin", "m > 0 AS model_pass",
        "y = 1 AS heur_pass", s"doc_id % $HoldMod = 0 AS holdout",
        "(m > 0) = (y = 1) AS agree")
  }

  /** The same train+infer chain as generated SQL: one (m, d, w, b) CTE
    * quartet per epoch (the annIvf generated-iteration pattern), then
    * the summed weights/bias score every doc. */
  def distillOracle: String = {
    val epochs = (1 to Epochs).map { e =>
      val (pw, pb) = (s"w${e - 1}", s"b${e - 1}")
      s"""m$e AS (
         |  SELECT l.doc_id, l.y,
         |    CAST(coalesce(sum(f.c * w.w), 0) + (SELECT b FROM $pb) * $Scale AS BIGINT) AS m
         |  FROM lab l LEFT JOIN feats f ON l.doc_id = f.doc_id
         |  LEFT JOIN $pw w ON f.bucket = w.bucket
         |  GROUP BY l.doc_id, l.y
         |), d$e AS (
         |  SELECT f.bucket, CAST(sum(m.y * f.c) AS BIGINT) AS d
         |  FROM m$e m JOIN feats f USING (doc_id)
         |  WHERE m.doc_id % $HoldMod <> 0 AND m.y * m.m <= 0
         |  GROUP BY f.bucket
         |), w$e AS (
         |  SELECT coalesce(w.bucket, d.bucket) AS bucket,
         |    CAST(coalesce(w.w, 0) + coalesce(d.d, 0) AS BIGINT) AS w
         |  FROM $pw w FULL OUTER JOIN d$e d ON w.bucket = d.bucket
         |), b$e AS (
         |  SELECT CAST((SELECT b FROM $pb) + coalesce(
         |    (SELECT sum(y) FROM m$e WHERE doc_id % $HoldMod <> 0 AND y * m <= 0), 0) AS BIGINT) AS b
         |)""".stripMargin
    }.mkString(", ")
    val wUnion = (1 to Epochs).map(e => s"SELECT * FROM w$e").mkString(" UNION ALL ")
    val bSum = (1 to Epochs).map(e => s"(SELECT b FROM b$e)").mkString(" + ")
    s"""WITH lab0 AS (
       |${TextStats.qualityOracle}
       |), lab AS (
       |  SELECT doc_id, CASE WHEN pass THEN 1 ELSE -1 END AS y FROM lab0
       |), g AS (
       |  SELECT doc_id, ('0x' || substr(md5(gram), 1, 8))::BIGINT % $Buckets AS bucket
       |  FROM (SELECT doc_id, unnest(flatten(list_transform(
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> length(t) > 0),
       |    t -> list_transform(generate_series(1, length(t)), i -> substr('<' || t || '>', i, 3))))) AS gram
       |  FROM documents)
       |), n AS (
       |  SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id
       |), tri AS (
       |  SELECT g.doc_id, g.bucket, CAST((count(*) * $Scale) // max(n.ng) AS BIGINT) AS c
       |  FROM g JOIN n USING (doc_id) GROUP BY g.doc_id, g.bucket
       |), meta AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5('__L' || least(9, len(regexp_split_to_array(text, '\\s+')) // 10)), 1, 8))::BIGINT % $Buckets AS bucket,
       |    CAST($Scale AS BIGINT) AS c
       |  FROM documents
       |), feats AS (
       |  SELECT doc_id, bucket, CAST(sum(c) AS BIGINT) AS c
       |  FROM (SELECT * FROM tri UNION ALL SELECT * FROM meta) GROUP BY doc_id, bucket
       |), w0 AS (
       |  SELECT CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS w WHERE false
       |), b0 AS (
       |  SELECT CAST(0 AS BIGINT) AS b
       |), $epochs, wsum AS (
       |  SELECT bucket, CAST(sum(w) AS BIGINT) AS w FROM ($wUnion) GROUP BY bucket
       |)
       |SELECT l.doc_id,
       |  CAST(coalesce(sum(f.c * w.w), 0) + ($bSum) * $Scale AS BIGINT) AS margin,
       |  CAST(coalesce(sum(f.c * w.w), 0) + ($bSum) * $Scale AS BIGINT) > 0 AS model_pass,
       |  l.y = 1 AS heur_pass,
       |  l.doc_id % $HoldMod = 0 AS holdout,
       |  (CAST(coalesce(sum(f.c * w.w), 0) + ($bSum) * $Scale AS BIGINT) > 0) = (l.y = 1) AS agree
       |FROM lab l LEFT JOIN feats f ON l.doc_id = f.doc_id
       |LEFT JOIN wsum w ON f.bucket = w.bucket
       |GROUP BY l.doc_id, l.y""".stripMargin
  }
}

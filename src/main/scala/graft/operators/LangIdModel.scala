package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * fastText-shaped language-ID model (the north star names "a fastText
 * language-ID model broadcast to executors"): hashed character-n-gram
 * bag-of-features → per-language linear scores from a broadcast weight
 * table → argmax with a deterministic (alphabetical) tiebreak.
 *
 * Like fastText (Joulin'16), each token is wrapped in boundary markers
 * (`<tok>`) and decomposed into character trigrams; each trigram hashes
 * into one of [[Buckets]] weight rows (the hashing trick — md5-derived so
 * Spark and DuckDB compute the identical bucket). Scoring is a linear
 * model over the hashed bag: score(lang) = Σ_grams w[lang][bucket(gram)].
 *
 * The weights are trained HERE, deterministically, in one aggregation
 * pass over the labeled corpus: w[lang][b] is the fixed-point
 * class-conditional frequency `(count(lang, b) * Scale) div count(lang)`
 * — integer arithmetic end-to-end, so training AND inference carry an
 * exact DuckDB oracle (no float log-softmax whose last-ulp could flip an
 * argmax between engines). A production deployment drops released
 * fastText weights into the same [[model]] table shape; the scoring plan
 * does not change.
 *
 * Scale shape (the Perplexity.scoreTopV pattern): the model is ≤
 * Buckets rows after pivoting to one row per bucket (w_de … w_zh
 * columns), broadcast to executors; featurization is map-side explode;
 * scoring is ONE BroadcastHashJoin + ONE hash aggregation keyed by
 * doc_id (map-side partials) — no sort, no window, no corpus-sized
 * shuffle beyond the per-doc score rows. PlanSpec asserts broadcast-only
 * model joins. Featurization deliberately runs twice (training pass,
 * then inference pass): recomputing map-side grams is the right trade
 * at corpus scale, where materializing the exploded feature stream
 * would dwarf the input — and a real deployment trains once and only
 * ever runs the inference half with released weights.
 */
object LangIdModel {

  /** Hash-trick bucket count (fastText's `-bucket`, demo-sized; 2M in
    * released models — the plan is bucket-count-independent). */
  val Buckets = 1024

  /** Fixed-point scale for the frequency weights. */
  val Scale = 1000000L

  /** Languages present in the corpus, sorted — tiebreak prefers the
    * alphabetically first. */
  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  private val bucketSql =
    s"CAST(conv(substring(md5(gram), 1, 8), 16, 10) AS BIGINT) % $Buckets"

  /** (doc_id, lang, bucket) — one row per char-trigram occurrence
    * (multiplicity kept, as fastText does). Pure map-side. Two flat
    * explodes instead of one nested-HOF explode: nested lambdas run
    * interpreted and would rebuild the boundary-padded token once PER
    * GRAM (O(len²) allocations/token). Input rebalanced ahead of the
    * ~250x explode when split-starved ([[Inputs.spread]]). */
  private def features(docs: DataFrame): DataFrame =
    Inputs.spread(docs)
      .selectExpr("doc_id", "lang",
        "explode(filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)) AS tok")
      .selectExpr("doc_id", "lang", "concat('<', tok, '>') AS p")
      .selectExpr("doc_id", "lang",
        "explode(transform(sequence(1, length(p) - 2), i -> substring(p, i, 3))) AS gram")
      .selectExpr("doc_id", "lang", s"$bucketSql AS bucket")

  /** The broadcastable weight table: one row per bucket, one fixed-point
    * frequency column per language. Trained in one pass: two hash
    * aggregations (lang×bucket counts, lang totals) + a pivot. */
  def model(docs: DataFrame): DataFrame = {
    val feats = features(docs)
    val tot = feats.groupBy("lang").agg(count(lit(1)).as("t"))
    val ws = Langs.map(l =>
      coalesce(sum(when(col("lang") === l, col("w"))), lit(0L)).as(s"w_$l"))
    feats.groupBy("lang", "bucket").agg(count(lit(1)).as("n"))
      .join(broadcast(tot), "lang")
      .selectExpr("lang", "bucket", s"(n * $Scale) div t AS w")
      .groupBy("bucket").agg(ws.head, ws.tail: _*)
  }

  /** Predict a language per doc: featurize map-side, broadcast-join the
    * pivoted model on bucket, sum each language's weights in one
    * doc_id-keyed aggregation, argmax with alphabetical tiebreak. */
  def predict(spark: SparkSession, dir: String): DataFrame = {
    val docs = Inputs.documents(spark, dir)
    val sums = Langs.map(l => sum(col(s"w_$l")).as(s"s_$l"))
    val pred = Langs.init.zipWithIndex.map { case (l, i) =>
      val geAll = Langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${Langs.last}' END")
    features(docs).drop("lang")
      .join(broadcast(model(docs)), "bucket")
      .groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .selectExpr("doc_id", s"$pred AS lang_pred",
        s"greatest(${Langs.map(l => s"s_$l").mkString(", ")}) AS score")
  }

  /** Exact oracle: the same training + inference in SQL (all-integer,
    * so hash-identical). */
  val predictOracle: String = {
    // DuckDB sum(BIGINT) widens to HUGEINT — cast back to match Spark
    val ws = Langs.map(l =>
      s"CAST(coalesce(sum(CASE WHEN lang = '$l' THEN w END), 0) AS BIGINT) AS w_$l").mkString(",\n    ")
    val sums = Langs.map(l => s"CAST(sum(w_$l) AS BIGINT) AS s_$l").mkString(", ")
    val pred = Langs.init.zipWithIndex.map { case (l, i) =>
      val geAll = Langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${Langs.last}' END")
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> length(t) > 0) AS ts
       |  FROM documents
       |), grams AS (
       |  SELECT doc_id, lang,
       |    unnest(flatten(list_transform(ts, t -> list_transform(generate_series(1, length(t)), i -> substr('<' || t || '>', i, 3))))) AS gram
       |  FROM toks
       |), feats AS (
       |  SELECT doc_id, lang, ('0x' || substr(md5(gram), 1, 8))::BIGINT % $Buckets AS bucket
       |  FROM grams
       |), tot AS (
       |  SELECT lang, count(*) AS t FROM feats GROUP BY lang
       |), weights AS (
       |  SELECT c.lang, c.bucket, (c.n * $Scale) // t.t AS w
       |  FROM (SELECT lang, bucket, count(*) AS n FROM feats GROUP BY 1, 2) c
       |  JOIN tot t ON c.lang = t.lang
       |), model AS (
       |  SELECT bucket,
       |    $ws
       |  FROM weights GROUP BY bucket
       |), scored AS (
       |  SELECT f.doc_id, $sums
       |  FROM feats f JOIN model m ON f.bucket = m.bucket
       |  GROUP BY f.doc_id
       |)
       |SELECT doc_id, $pred AS lang_pred,
       |  greatest(${Langs.map(l => s"s_$l").mkString(", ")}) AS score
       |FROM scored""".stripMargin
  }
}

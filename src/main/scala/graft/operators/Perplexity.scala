package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * KenLM-style n-gram perplexity scoring (north-star component): a
 * bigram language model with Laplace smoothing, trained ON THE CORPUS
 * (deterministic — no external data), scoring each document by
 *
 *   ppl(d) = exp( -avg over bigrams ln( (c(w1,w2)+1) / (c(w1)+V) ) )
 *
 * Low perplexity ⇒ the document looks like the corpus (quality signal);
 * high ⇒ out-of-distribution/garbled.
 *
 * Scale shape: two count aggregations (map-side partial), then the
 * score pass joins each document's bigrams against the model — at
 * 100 TB the model tables are the broadcast side (vocab ≪ corpus) and
 * the document side never shuffles; here Catalyst/AQE picks the
 * strategy. Everything is exact integer counts + double math phrased
 * identically in the DuckDB oracle.
 */
object Perplexity {

  /** (doc_id, n_bigrams, round(ppl, 4)) for docs with >= 2 tokens. */
  def score(spark: SparkSession, dir: String): DataFrame = {
    val toks = Inputs.documents(spark, dir)
      .selectExpr("doc_id", "split(lower(text), '\\\\s+') AS t")
      .filter("size(t) >= 2")
    toks.cache()
    val words = toks.selectExpr("doc_id", "explode(t) AS w")
    val uni = words.groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bigrams = toks.selectExpr("doc_id",
        "explode(transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))) AS bg")
      .selectExpr("doc_id", "bg.w1 AS w1", "bg.w2 AS w2")
    val big = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    bigrams
      .join(big, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(log((col("c2") + 1.0) / (col("c1") + col("v"))))), 4).as("ppl"))
  }

  /** Scale path (100 TB shape): vocabulary capped to the top-V unigrams
    * (ties → lexicographically smaller word), every other token mapped
    * to one OOV bucket BEFORE training and scoring. The model tables are
    * then ≤ V+1 unigrams and ≤ (V+1)² bigrams — explicitly broadcast, so
    * the corpus-sized document side never shuffles into the model joins
    * (its only shuffle is its own per-doc final aggregate). Uncapped
    * [[score]] stays as the exact-model baseline. */
  def scoreTopV(spark: SparkSession, dir: String, topV: Int = 256): DataFrame = {
    val toks = Inputs.documents(spark, dir)
      .selectExpr("doc_id", "split(lower(text), '\\\\s+') AS t")
      .filter("size(t) >= 2")
    val words = toks.selectExpr("doc_id", "explode(t) AS w")
    val top = broadcast(
      words.groupBy("w").agg(count(lit(1)).as("cw"))
        .orderBy(desc("cw"), asc("w")).limit(topV)
        .select(col("w"), lit(true).as("in_top")))
    val mappedWords = words
      .join(top.withColumnRenamed("w", "kw"), col("w") === col("kw"), "left")
      .selectExpr("doc_id", s"CASE WHEN in_top THEN w ELSE '<oov>' END AS m")
    val uni = broadcast(mappedWords.groupBy("m").agg(count(lit(1)).as("c1"))
      .withColumnRenamed("m", "m1"))
    val vocab = broadcast(uni.agg(count(lit(1)).as("v")))
    val bigrams = toks.selectExpr("doc_id",
        "explode(transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))) AS bg")
      .selectExpr("doc_id", "bg.w1 AS w1", "bg.w2 AS w2")
      .join(top.selectExpr("w AS w1", "in_top AS in_w1"), Seq("w1"), "left")
      .join(top.selectExpr("w AS w2", "in_top AS in_w2"), Seq("w2"), "left")
      .selectExpr("doc_id",
        "CASE WHEN in_w1 THEN w1 ELSE '<oov>' END AS m1",
        "CASE WHEN in_w2 THEN w2 ELSE '<oov>' END AS m2")
    val big = broadcast(bigrams.groupBy("m1", "m2").agg(count(lit(1)).as("c2")))
    bigrams
      .join(big, Seq("m1", "m2"))
      .join(uni, Seq("m1"))
      .crossJoin(vocab)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(log((col("c2") + 1.0) / (col("c1") + col("v"))))), 4).as("ppl"))
  }

  def topVOracle(topV: Int = 256): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
       |  FROM documents WHERE len(regexp_split_to_array(lower(text), '\\s+')) >= 2
       |), words AS (
       |  SELECT doc_id, unnest(t) AS w FROM toks
       |), top AS (
       |  SELECT w FROM (SELECT w, count(*) AS cw FROM words GROUP BY w
       |                 ORDER BY cw DESC, w ASC LIMIT $topV)
       |), mwords AS (
       |  SELECT doc_id, CASE WHEN t.w IS NOT NULL THEN words.w ELSE '<oov>' END AS m
       |  FROM words LEFT JOIN top t ON t.w = words.w
       |), uni AS (
       |  SELECT m AS m1, count(*) AS c1 FROM mwords GROUP BY m
       |), vocab AS (
       |  SELECT count(*) AS v FROM uni
       |), bigrams AS (
       |  SELECT doc_id,
       |    CASE WHEN t1.w IS NOT NULL THEN b.w1 ELSE '<oov>' END AS m1,
       |    CASE WHEN t2.w IS NOT NULL THEN b.w2 ELSE '<oov>' END AS m2
       |  FROM (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       |        FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS g(i)) b
       |  LEFT JOIN top t1 ON t1.w = b.w1
       |  LEFT JOIN top t2 ON t2.w = b.w2
       |), big AS (
       |  SELECT m1, m2, count(*) AS c2 FROM bigrams GROUP BY m1, m2
       |)
       |SELECT b.doc_id, count(*) AS n_bigrams,
       |  round(exp(-avg(ln((bg.c2 + 1.0) / (u.c1 + vocab.v)))), 4) AS ppl
       |FROM bigrams b
       |JOIN big bg ON bg.m1 = b.m1 AND bg.m2 = b.m2
       |JOIN uni u ON u.m1 = b.m1
       |CROSS JOIN vocab
       |GROUP BY b.doc_id""".stripMargin

  val oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS t
      |  FROM documents WHERE len(regexp_split_to_array(lower(text), '\s+')) >= 2
      |), words AS (
      |  SELECT doc_id, unnest(t) AS w FROM toks
      |), uni AS (
      |  SELECT w, count(*) AS c1 FROM words GROUP BY w
      |), vocab AS (
      |  SELECT count(*) AS v FROM uni
      |), bigrams AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS g(i)
      |), big AS (
      |  SELECT w1, w2, count(*) AS c2 FROM bigrams GROUP BY w1, w2
      |)
      |SELECT b.doc_id, count(*) AS n_bigrams,
      |  round(exp(-avg(ln((bg.c2 + 1.0) / (u.c1 + vocab.v)))), 4) AS ppl
      |FROM bigrams b
      |JOIN big bg ON bg.w1 = b.w1 AND bg.w2 = b.w2
      |JOIN uni u ON u.w = b.w1
      |CROSS JOIN vocab
      |GROUP BY b.doc_id""".stripMargin
}

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
    val toks = spark.read.parquet(s"$dir/documents.parquet")
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

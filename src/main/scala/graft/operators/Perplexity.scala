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
    // the token view feeds both model builds and the scoring side;
    // cache it for the two eager model materializations below, then
    // release — the checkpointed model tables carry the reuse from
    // there, so no cached blocks outlive this call (sweep hygiene)
    toks.cache()
    val words = toks.selectExpr("doc_id", "explode(t) AS w")
    val uni = words.groupBy("w").agg(count(lit(1)).as("c1")).localCheckpoint()
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bigrams = toks.selectExpr("doc_id",
        "explode(transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))) AS bg")
      .selectExpr("doc_id", "bg.w1 AS w1", "bg.w2 AS w2")
    val big = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2")).localCheckpoint()
    toks.unpersist()
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

  /** Trigram stupid backoff (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the production-shape LM score:
    * no normalization, just counts and a fixed 0.4 back-off weight:
    *
    *   S(w3|w1,w2) = c3/c2ctx              if the trigram was seen
    *               = 0.4 * c2/c1ctx        else if bigram (w2,w3) seen
    *               = 0.4^2 * (c1+1)/(N+V)  else (Laplace unigram base,
    *                                       keeps S > 0 for any token)
    *
    * Trained on the 90% split (doc_id % 10 != 0), scored on ALL docs —
    * self-training would make every scored trigram count >= 1 and the
    * back-off chain dead code; the held-out 10% is what actually
    * exercises it (and mirrors production: reference corpus trains,
    * candidates score). Vocabulary capped to top-`topV` TRAINING
    * unigrams (ties lexicographic), everything else mapped to one
    * <oov> symbol BEFORE counting, so every model table is bounded by
    * (V+1)^3 rows REGARDLESS of corpus size — all five count tables +
    * the two scalars are explicit broadcasts, and the corpus-sized
    * document side's only shuffle is its own per-doc average.
    * Default V=32 (< this corpus' 57-word vocabulary) so <oov> and
    * both back-off legs are genuinely exercised at test scale. */
  def scoreTrigramSB(spark: SparkSession, dir: String, topV: Int = 32): DataFrame = {
    val Alpha = 0.4
    val toks = Inputs.documents(spark, dir)
      .selectExpr("doc_id", "split(lower(text), '\\\\s+') AS t")
      .filter("size(t) >= 3")
    val trainToks = toks.filter("doc_id % 10 <> 0")
    val trainWords = trainToks.selectExpr("doc_id", "explode(t) AS w")
    val top = broadcast(
      trainWords.groupBy("w").agg(count(lit(1)).as("cw"))
        .orderBy(desc("cw"), asc("w")).limit(topV)
        .select(col("w"), lit(true).as("in_top")))
    def mapped(df: DataFrame, wc: String, mc: String): DataFrame =
      df.join(top.select(col("w").as(s"k_$wc"), col("in_top").as(s"t_$wc")),
          col(wc) === col(s"k_$wc"), "left")
        .withColumn(mc, when(col(s"t_$wc"), col(wc)).otherwise(lit("<oov>")))
        .drop(wc, s"k_$wc", s"t_$wc")
    def grams(src: DataFrame, n: Int): DataFrame = {
      val fields = (0 until n).map(i => s"t[i+$i] AS w$i").mkString(", ")
      val g = src.selectExpr("doc_id",
        s"explode(transform(sequence(0, size(t)-$n), i -> struct($fields))) AS g")
        .selectExpr(Seq("doc_id") ++ (0 until n).map(i => s"g.w$i AS w$i"): _*)
      (0 until n).foldLeft(g)((acc, i) => mapped(acc, s"w$i", s"m$i"))
    }
    // score side: every trigram position of EVERY doc — built first so
    // the trigram MODEL table can reuse it: filtering pos to the train
    // split yields exactly grams(trainToks, 3) (same construction, same
    // mapping joins), which saves one full corpus explode + three
    // broadcast map joins. The uni/bi tables still need their own gram
    // frames (a doc's tail tokens appear in no trigram position).
    val pos = grams(toks, 3)
    // model tables (TRAIN split; each bounded by (V+1)^arity)
    val uniT = trainToks.transform(grams(_, 1)).groupBy("m0").agg(count(lit(1)).as("c"))
    val biT = trainToks.transform(grams(_, 2)).groupBy("m0", "m1").agg(count(lit(1)).as("c"))
    val triT = pos.filter("doc_id % 10 <> 0").groupBy("m0", "m1", "m2").agg(count(lit(1)).as("c"))
    val scal = broadcast(uniT.agg(sum("c").as("n_tok"), count(lit(1)).as("v")))
    val scored = pos
      .join(broadcast(triT.select(col("m0"), col("m1"), col("m2"), col("c").as("c3"))),
        Seq("m0", "m1", "m2"), "left")
      .join(broadcast(biT.select(col("m0"), col("m1"), col("c").as("c2ctx"))),
        Seq("m0", "m1"), "left")
      .join(broadcast(biT.select(col("m0").as("m1"), col("m1").as("m2"), col("c").as("c2"))),
        Seq("m1", "m2"), "left")
      .join(broadcast(uniT.select(col("m0").as("m1"), col("c").as("c1ctx"))), Seq("m1"), "left")
      .join(broadcast(uniT.select(col("m0").as("m2"), col("c").as("c1"))), Seq("m2"), "left")
      .crossJoin(scal)
      .withColumn("s",
        when(col("c3").isNotNull, col("c3") / col("c2ctx"))
          .when(col("c2").isNotNull, lit(Alpha) * col("c2") / col("c1ctx"))
          .otherwise(lit(Alpha * Alpha) *
            (coalesce(col("c1"), lit(0L)) + lit(1.0)) / (col("n_tok") + col("v"))))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        round(exp(-avg(log(col("s")))), 4).as("ppl_sb"))
  }

  def trigramSBOracle(topV: Int = 32): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
       |  FROM documents WHERE len(regexp_split_to_array(lower(text), '\\s+')) >= 3
       |), top AS (
       |  SELECT w FROM (
       |    SELECT unnest(t) AS w FROM toks WHERE doc_id % 10 <> 0) u
       |  GROUP BY w ORDER BY count(*) DESC, w ASC LIMIT $topV
       |), uni AS (
       |  SELECT m0, count(*) AS c FROM (
       |    SELECT CASE WHEN tp.w IS NOT NULL THEN u.w ELSE '<oov>' END AS m0
       |    FROM (SELECT doc_id, unnest(t) AS w FROM toks WHERE doc_id % 10 <> 0) u
       |    LEFT JOIN top tp ON tp.w = u.w)
       |  GROUP BY m0
       |), bi AS (
       |  SELECT m0, m1, count(*) AS c FROM (
       |    SELECT CASE WHEN t0.w IS NOT NULL THEN b.w0 ELSE '<oov>' END AS m0,
       |           CASE WHEN t1.w IS NOT NULL THEN b.w1 ELSE '<oov>' END AS m1
       |    FROM (SELECT t[i] AS w0, t[i+1] AS w1
       |          FROM toks, LATERAL unnest(generate_series(1, len(t)-1)) AS g(i)
       |          WHERE doc_id % 10 <> 0) b
       |    LEFT JOIN top t0 ON t0.w = b.w0
       |    LEFT JOIN top t1 ON t1.w = b.w1)
       |  GROUP BY m0, m1
       |), tri AS (
       |  SELECT m0, m1, m2, count(*) AS c FROM (
       |    SELECT CASE WHEN t0.w IS NOT NULL THEN b.w0 ELSE '<oov>' END AS m0,
       |           CASE WHEN t1.w IS NOT NULL THEN b.w1 ELSE '<oov>' END AS m1,
       |           CASE WHEN t2.w IS NOT NULL THEN b.w2 ELSE '<oov>' END AS m2
       |    FROM (SELECT t[i] AS w0, t[i+1] AS w1, t[i+2] AS w2
       |          FROM toks, LATERAL unnest(generate_series(1, len(t)-2)) AS g(i)
       |          WHERE doc_id % 10 <> 0) b
       |    LEFT JOIN top t0 ON t0.w = b.w0
       |    LEFT JOIN top t1 ON t1.w = b.w1
       |    LEFT JOIN top t2 ON t2.w = b.w2)
       |  GROUP BY m0, m1, m2
       |), scal AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS v FROM uni
       |), pos AS (
       |  SELECT doc_id,
       |    CASE WHEN t0.w IS NOT NULL THEN b.w0 ELSE '<oov>' END AS m0,
       |    CASE WHEN t1.w IS NOT NULL THEN b.w1 ELSE '<oov>' END AS m1,
       |    CASE WHEN t2.w IS NOT NULL THEN b.w2 ELSE '<oov>' END AS m2
       |  FROM (SELECT doc_id, t[i] AS w0, t[i+1] AS w1, t[i+2] AS w2
       |        FROM toks, LATERAL unnest(generate_series(1, len(t)-2)) AS g(i)) b
       |  LEFT JOIN top t0 ON t0.w = b.w0
       |  LEFT JOIN top t1 ON t1.w = b.w1
       |  LEFT JOIN top t2 ON t2.w = b.w2
       |), scored AS (
       |  SELECT p.doc_id,
       |    CASE WHEN tri.c IS NOT NULL THEN tri.c / CAST(bctx.c AS DOUBLE)
       |         WHEN b23.c IS NOT NULL THEN 0.4 * b23.c / CAST(u1.c AS DOUBLE)
       |         ELSE 0.4 * 0.4 * (coalesce(u2.c, 0) + 1.0) / (scal.n_tok + scal.v)
       |    END AS s
       |  FROM pos p
       |  LEFT JOIN tri ON tri.m0 = p.m0 AND tri.m1 = p.m1 AND tri.m2 = p.m2
       |  LEFT JOIN bi bctx ON bctx.m0 = p.m0 AND bctx.m1 = p.m1
       |  LEFT JOIN bi b23 ON b23.m0 = p.m1 AND b23.m1 = p.m2
       |  LEFT JOIN uni u1 ON u1.m0 = p.m1
       |  LEFT JOIN uni u2 ON u2.m0 = p.m2
       |  CROSS JOIN scal
       |)
       |SELECT doc_id, count(*) AS n_trigrams,
       |  round(exp(-avg(ln(s))), 4) AS ppl_sb
       |FROM scored GROUP BY doc_id""".stripMargin

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

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators a production pretraining pipeline runs
 * after filtering/dedup: benchmark decontamination (Brown et al. 2020,
 * "Language Models are Few-Shot Learners", Appendix C — 13-gram overlap
 * against held-out eval sets), domain-mixture sampling to a token
 * budget (the Pile / DoReMi-style mixture weights realized as
 * deterministic per-domain sampling rates), and sequence packing
 * (the standard concat-and-chunk layout that turns documents into
 * fixed-length training sequences). All three have exact DuckDB twins.
 */
object Curation {

  // ---- benchmark decontamination -----------------------------------

  /** N-gram width for the overlap check (GPT-3's published choice). */
  val DecontamN = 13
  /** Deterministic held-out "benchmark" split: doc_id % EvalMod == 0.
    * In production the eval side is the real benchmark suite (MBs);
    * the split policy here just gives the operator a non-trivial eval
    * set at every sf. */
  val EvalMod = 10

  /** Per-doc view: doc_id + the DISTINCT md5-hashed 13-gram set.
    * Hashing to 16 hex chars keeps the shuffled/broadcast keys narrow
    * (8 bytes of entropy vs ~90-char gram strings) — at 100 TB the
    * gram join moves hashes, never text. Distinctness is established
    * map-side (array_distinct) so no per-doc shuffle is needed. */
  private def gramSets(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", "split(lower(text), '\\\\s+') AS toks")
      .selectExpr("doc_id",
        s"""CASE WHEN size(toks) >= $DecontamN THEN
           |  array_distinct(transform(sequence(1, size(toks) - ${DecontamN - 1}),
           |    i -> substr(md5(array_join(slice(toks, i, $DecontamN), ' ')), 1, 16)))
           |ELSE CAST(array() AS ARRAY<STRING>) END AS grams""".stripMargin)

  /** q_decontaminate: flag training documents sharing any 13-gram with
    * the eval split. Eval grams are distinct-ed (tiny — benchmarks are
    * MBs even when the corpus is TBs) and BROADCAST; the corpus side is
    * a map-side gram explode + broadcast left join + one groupBy
    * shuffle with map-side partial counts. No corpus-vs-corpus
    * self-join anywhere. Eval docs report their (trivial) self-overlap
    * and are excluded from the contaminated flag. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateDocs(Inputs.documents(spark, dir))

  /** The distinct hashed 13-gram set of an external benchmark frame
    * (anything with a `text` column) — the production eval side, where
    * the contamination check runs against real benchmark files instead
    * of the held-out split. Stays tiny (benchmarks are MBs) so the
    * downstream join still broadcasts. */
  def evalGramsOf(bench: DataFrame): DataFrame =
    gramSets(bench.selectExpr("monotonically_increasing_id() AS doc_id", "text"))
      .selectExpr("explode(grams) AS gram")
      .distinct() // the broadcast side must be distinct-ed HERE, not by
      // courtesy of the consumer — decontaminateDocs distincts again
      // (idempotent), but any other caller broadcasting this frame
      // would otherwise ship duplicate grams

  /** The computation over any (doc_id, text) frame (spec entry). When
    * `extEvalGrams` is given (a 1-column `gram` frame, see
    * [[evalGramsOf]]) the overlap runs against IT instead of the
    * held-out split, and no corpus doc is `is_eval`. */
  def decontaminateDocs(docs: DataFrame,
                        extEvalGrams: Option[DataFrame] = None): DataFrame = {
    val g = gramSets(docs)
    val ev = extEvalGrams.getOrElse(
        g.filter(s"doc_id % $EvalMod = 0").selectExpr("explode(grams) AS gram"))
      .select("gram").distinct()
      .withColumn("hit", lit(1))
    val isEval =
      if (extEvalGrams.isDefined) "false" else s"doc_id % $EvalMod = 0"
    g.selectExpr("doc_id", s"$isEval AS is_eval",
        "explode_outer(grams) AS gram")
      .join(broadcast(ev), Seq("gram"), "left")
      .groupBy("doc_id", "is_eval")
      .agg(count("hit").cast("int").as("n_overlap"))
      .withColumn("contaminated", !col("is_eval") && col("n_overlap") > 0)
  }

  def decontaminateOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(generate_series(1, len(toks) - ${DecontamN - 1}),
       |      i -> substr(md5(array_to_string(toks[i:i+${DecontamN - 1}], ' ')), 1, 16))) AS grams
       |  FROM t
       |), ev AS (
       |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % $EvalMod = 0
       |), ex AS (
       |  SELECT doc_id, doc_id % $EvalMod = 0 AS is_eval,
       |    unnest(CASE WHEN len(grams) = 0 THEN [NULL] ELSE grams END) AS gram
       |  FROM g
       |)
       |SELECT ex.doc_id, ex.is_eval,
       |  CAST(count(ev.gram) AS INT) AS n_overlap,
       |  (NOT ex.is_eval AND count(ev.gram) > 0) AS contaminated
       |FROM ex LEFT JOIN ev ON ex.gram = ev.gram
       |GROUP BY ex.doc_id, ex.is_eval""".stripMargin

  // ---- domain-mixture sampling to a token budget -------------------

  /** Mixture weights in integer PARTS (not floats): the rate math then
    * reduces to ONE double division of two exact integers, which is
    * bit-identical across engines — no cross-engine float-summation
    * order to worry about. Sources absent from the map get the default
    * tail weight. */
  val MixPartsHead: Map[String, Int] = Map("src0" -> 25, "src1" -> 15)
  val MixPartsTail = 3
  /** Token budget = total corpus tokens * BudgetNum / BudgetDen. */
  val BudgetNum = 1
  val BudgetDen = 2

  private def partsCase: String =
    "CASE source " + MixPartsHead.map { case (s, p) => s"WHEN '$s' THEN $p" }
      .mkString(" ") + s" ELSE $MixPartsTail END"

  /** q_mix_sample: realize mixture weights as per-domain sampling
    * rates against a token budget: rate_s = min(1, (w_s/Σw) * B /
    * toks_s), decided per doc by a salted md5 uniform (reproducible
    * across runs, engines, and partitionings — no RNG state). Plan
    * shape: one source-level aggregate (map-side partials, |sources|
    * rows), one single-row total, both BROADCAST back over the corpus;
    * the keep decision is pure map-side. The only corpus-wide shuffle
    * is the source rollup. */
  def mixSample(spark: SparkSession, dir: String): DataFrame =
    mixSampleDocs(Inputs.documents(spark, dir))

  /** The computation over any (doc_id, source, text) frame (spec entry). */
  def mixSampleDocs(docs: DataFrame): DataFrame =
    mixSampleCounted(docs
      .selectExpr("doc_id", "source", "size(split(text, '\\\\s+')) AS n_tok"))

  /** The same computation over a pre-counted (doc_id, source, n_tok)
    * frame — the lightweight proxy the capstone passes so the text
    * column is tokenized once, not once per consumer (guide §8). */
  private[operators] def mixSampleCounted(base: DataFrame): DataFrame = {
    val bySrc = base.groupBy("source")
      .agg(sum("n_tok").cast("long").as("src_toks"))
      .selectExpr("source", "src_toks", s"CAST($partsCase AS BIGINT) AS w")
    val tot = bySrc.agg(sum("src_toks").cast("long").as("total_toks"),
      sum("w").cast("long").as("w_sum"))
    val rates = bySrc.crossJoin(broadcast(tot))
      .selectExpr("source", "src_toks",
        s"""least(1.0, round(
           |  CAST(w * ((total_toks * $BudgetNum) div $BudgetDen) AS DOUBLE)
           |  / CAST(w_sum * src_toks AS DOUBLE), 6)) AS rate""".stripMargin)
    base.join(broadcast(rates), "source")
      .selectExpr("doc_id", "source", "n_tok", "src_toks", "rate",
        // modulus matches the 6-dp rate resolution: rates differing at
        // the 6th decimal stay distinguishable (r5 advice)
        "((CAST(conv(substr(md5(concat('mix', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 1000000) / 1000000.0) < rate AS keep")
  }

  def mixSampleOracle: String = mixSampleOracleOn("documents")

  /** The oracle over any table/CTE with (doc_id, source, text). */
  def mixSampleOracleOn(table: String): String =
    s"""WITH base AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS INT) AS n_tok
       |  FROM $table
       |), s AS (
       |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_toks,
       |    CAST($partsCase AS BIGINT) AS w
       |  FROM base GROUP BY source
       |), t AS (
       |  SELECT CAST(sum(src_toks) AS BIGINT) AS total_toks,
       |    CAST(sum(w) AS BIGINT) AS w_sum
       |  FROM s
       |), r AS (
       |  SELECT source, src_toks,
       |    least(1.0, round(
       |      CAST(w * ((total_toks * $BudgetNum) // $BudgetDen) AS DOUBLE)
       |      / CAST(w_sum * src_toks AS DOUBLE), 6)) AS rate
       |  FROM s, t
       |)
       |SELECT b.doc_id, b.source, b.n_tok, r.src_toks, r.rate,
       |  ((('0x' || substr(md5('mix' || CAST(b.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000) / 1000000.0) < r.rate AS keep
       |FROM base b JOIN r USING (source)""".stripMargin

  /** q_mix_audit: the realized sample vs the target rates, per source
    * — the post-hoc check a pipeline runs before committing a mixture
    * (kept tokens, realized fraction vs the rate the weights implied).
    * Rates capped at 1.0 leave their excess budget UNredistributed (by
    * design — redistribution would make rates data-dependent across
    * sources); the audit is what makes that visible. */
  def mixAudit(spark: SparkSession, dir: String): DataFrame =
    mixSample(spark, dir).groupBy("source").agg(
        max("src_toks").cast("long").as("src_toks"),
        sum(when(col("keep"), col("n_tok")).otherwise(0L)).cast("long").as("kept_toks"),
        max("rate").as("rate"))
      .selectExpr("source", "src_toks", "kept_toks", "rate",
        "round(kept_toks / CAST(src_toks AS DOUBLE), 6) AS realized_frac")

  def mixAuditOracle: String =
    s"""WITH m AS (
       |$mixSampleOracle
       |)
       |SELECT source, CAST(max(src_toks) AS BIGINT) AS src_toks,
       |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_toks,
       |  max(rate) AS rate,
       |  round(sum(CASE WHEN keep THEN n_tok ELSE 0 END) / CAST(max(src_toks) AS DOUBLE), 6) AS realized_frac
       |FROM m GROUP BY source""".stripMargin

  // ---- sequence packing (concat-and-chunk) -------------------------

  /** Training sequence length in whitespace tokens. */
  val SeqLen = 512
  /** Default packing shard count (the oracle's). Documents are packed
    * independently per shard — the unit a real pipeline maps to one
    * output writer — so the running-offset window parallelizes across
    * shards. At 100 TB a deployment passes shards ≫ executor cores
    * ([[seqPackDocs]] takes it as a parameter; CurateJob exposes
    * `--shards`); doc_id % N keeps shards uniform, so no shard
    * straggles (the skewed-partition case is what
    * Conversation.runningStateSalted solves; packing never needs it
    * because the shard key is chosen, not data-given). */
  val PackShards = 16

  /** q_seq_pack: assign every document its position in the packed
    * token stream — the sequence where it starts, its offset inside
    * that sequence, and how many sequences it spans (docs straddle
    * boundaries under concat-and-chunk; nothing is padded or dropped).
    * One shuffle (partition by shard), one per-shard ordered window. */
  def seqPack(spark: SparkSession, dir: String): DataFrame =
    seqPackDocs(Inputs.documents(spark, dir))

  /** The computation over any (doc_id, text) frame (spec entry). */
  def seqPackDocs(docs: DataFrame, shards: Int = PackShards): DataFrame =
    seqPackCounted(docs
      .selectExpr("doc_id", "size(split(text, '\\\\s+')) AS n_tok"), shards)

  /** The same layout over a pre-counted (doc_id, n_tok) frame. */
  private[operators] def seqPackCounted(counted: DataFrame,
                                        shards: Int = PackShards): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counted
      .selectExpr("doc_id", s"CAST(doc_id % $shards AS INT) AS shard", "n_tok")
      .withColumn("cum_tok", sum("n_tok").over(w))
      .selectExpr("doc_id", "shard", "n_tok", "cum_tok",
        s"(cum_tok - n_tok) div $SeqLen AS seq_id",
        s"CAST((cum_tok - n_tok) % $SeqLen AS INT) AS seq_offset",
        s"CAST(((cum_tok - 1) div $SeqLen) - ((cum_tok - n_tok) div $SeqLen) + 1 AS INT) AS n_seqs")
  }

  // ---- the full curation pipeline, end to end --------------------

  /** q_curate_pipeline: documents in, packed training sequences out —
    * the whole corpus-curation chain composed: the eight-leg
    * [[TrainFilter]] decision prunes the corpus, [[mixSample]]
    * realizes the mixture weights against the token budget of the
    * SURVIVING corpus (rates are computed post-filter, as a real
    * pipeline does), and [[seqPack]] lays the sampled docs into
    * fixed-length training sequences. Every stage is an already
    * oracle-proven operator; this query proves the end-to-end
    * composition with one nested DuckDB twin. Scale shape: the legs'
    * own audited plans + two doc_id equi-joins (co-partitioned at
    * scale) — nothing new crosses the wire. */
  def curatePipeline(spark: SparkSession, dir: String): DataFrame = {
    // The slim keep-decision (doc_id only) is materialized ONCE
    // (localCheckpoint, computed fresh inside every invocation): the
    // downstream mixture aggregate, its keep join, and the pack window
    // each reference the kept corpus, and without the checkpoint each
    // reference re-derives the ENTIRE 8-leg filter chain — the r6 plan
    // carried 128 parquet scans / 372 exchanges (~4x the 30-scan
    // trainFilter plan) for one 7-row result. The decision list is a
    // few bytes per surviving doc, so at 100 TB this is exactly the
    // "decide on small rows once, re-attach cheaply" rule (guide §8);
    // the re-attached documents join stays declarative and the nested
    // oracle is unchanged.
    val kept = TrainFilter.trainFilter(spark, dir)
      .filter(col("train_keep")).select("doc_id").localCheckpoint()
    val docs = Inputs.documents(spark, dir).join(kept, "doc_id")
    // the mixture aggregate, its keep join, and the pack window need
    // only (doc_id, source, n_tok) — tokenize the kept corpus ONCE into
    // that ~20-byte proxy instead of re-splitting `text` per consumer
    val counted = docs
      .selectExpr("doc_id", "source", "size(split(text, '\\\\s+')) AS n_tok")
      .localCheckpoint()
    val sampled = mixSampleCounted(counted).filter(col("keep")).select("doc_id")
    seqPackCounted(counted.join(sampled, "doc_id").select("doc_id", "n_tok"))
  }

  /** Production shape of the capstone (what [[graft.jobs.CurateJob]]
    * runs): the filter legs materialize once via
    * [[TrainFilter.trainFilterStaged]], the SURVIVING corpus is staged
    * once more (so the mixture aggregate and the pack window both read
    * slim parquet instead of re-deriving the 8-way join), then
    * mixture-sample + pack. Same rows as [[curatePipeline]]
    * (CurationSpec asserts hash-equality; same nested oracle) — staging
    * only changes where the legs are paid for. `shards`/`evalGrams`/
    * `resume` are the deployment knobs (CurateJob `--shards` /
    * `--eval` / `--resume`): with `resume = true` every staged piece —
    * the eight legs AND the surviving-corpus table — is skipped when
    * its `_SUCCESS` commit marker exists ([[StageCommit]]), so a
    * killed run re-pays only uncommitted work. */
  def curatePipelineStaged(spark: SparkSession, dir: String, stageDir: String,
                           shards: Int = PackShards,
                           evalGrams: Option[DataFrame] = None,
                           resume: Boolean = false): DataFrame = {
    val keptPath = s"$stageDir/kept"
    if (!(resume && StageCommit.committed(spark, keptPath))) {
      val kept = TrainFilter
        .trainFilterStaged(spark, dir, s"$stageDir/legs", evalGrams, resume)
        .filter(col("train_keep")).select("doc_id")
      Inputs.documents(spark, dir).join(kept, "doc_id")
        .write.mode("overwrite").parquet(keptPath)
    }
    val docs = spark.read.parquet(keptPath)
    // same counted proxy as the proof shape: the staged parquet's text
    // column is tokenized once for mixture + packing
    val counted = docs
      .selectExpr("doc_id", "source", "size(split(text, '\\\\s+')) AS n_tok")
      .localCheckpoint()
    val sampled = mixSampleCounted(counted).filter(col("keep")).select("doc_id")
    seqPackCounted(counted.join(sampled, "doc_id").select("doc_id", "n_tok"), shards)
  }

  def curatePipelineOracle: String =
    s"""WITH tf AS (
       |${TrainFilter.trainFilterOracle}
       |), kept AS (
       |  SELECT d.* FROM documents d JOIN tf ON tf.doc_id = d.doc_id AND tf.train_keep
       |), mix AS (
       |${mixSampleOracleOn("kept")}
       |), sampled AS (
       |  SELECT k.* FROM kept k JOIN mix ON mix.doc_id = k.doc_id AND mix.keep
       |)
       |SELECT * FROM (
       |${seqPackOracleOn("sampled")}
       |)""".stripMargin

  def seqPackOracle: String = seqPackOracleOn("documents")

  /** The oracle over any table/CTE with (doc_id, text). */
  def seqPackOracleOn(table: String, shards: Int = PackShards): String =
    s"""WITH base AS (
       |  SELECT doc_id, CAST(doc_id % $shards AS INT) AS shard,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS INT) AS n_tok
       |  FROM $table
       |), c AS (
       |  SELECT *, CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
       |  FROM base
       |)
       |SELECT doc_id, shard, n_tok, cum_tok,
       |  (cum_tok - n_tok) // $SeqLen AS seq_id,
       |  CAST((cum_tok - n_tok) % $SeqLen AS INT) AS seq_offset,
       |  CAST(((cum_tok - 1) // $SeqLen) - ((cum_tok - n_tok) // $SeqLen) + 1 AS INT) AS n_seqs
       |FROM c""".stripMargin
}

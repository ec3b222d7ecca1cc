package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The composed corpus-curation decision — what a training-data pipeline
 * actually materializes per document: quality gate × language gate ×
 * Gopher repetition gate × Gopher document gate × C4 page gate ×
 * toxicity gate × benchmark-decontamination gate × dedup keep-list
 * joined into one `train_keep` flag with the reasons alongside. Each
 * leg is an already-oracle-proven operator ([[TextStats.quality]],
 * [[LangIdModel.predict]], [[GopherQuality.quality]],
 * [[C4Quality.gopherDoc]], [[C4Quality.clean]],
 * [[Toxicity.toxicity]], [[Curation.decontaminate]] — eval-split docs
 * and docs sharing a 13-gram with them both leave the training set —
 * [[Dedup.keepList]]);
 * this query proves they COMPOSE — the DuckDB twin nests each leg's
 * full SQL (including the keep-list's recursive CTE, the Gopher window
 * chain, and the C4 enrichment + line rules) and must still hash-match.
 *
 * Scale shape: eight doc_id-keyed equi-joins of corpus-sized frames —
 * at production scale these co-partition on doc_id (one shuffle each,
 * or zero with bucketed tables); no leg introduces anything beyond its
 * own audited plan.
 */
object TrainFilter {

  val KeepLang = "en"

  private def compose(q: DataFrame, l: DataFrame, k: DataFrame,
                      g: DataFrame, gd: DataFrame, c4: DataFrame,
                      tx: DataFrame, dc: DataFrame): DataFrame =
    q.join(l, "doc_id").join(k, "doc_id").join(g, "doc_id")
      .join(gd, "doc_id").join(c4, "doc_id").join(tx, "doc_id")
      .join(dc, "doc_id")
      .selectExpr("doc_id",
        s"pass AND lang_pred = '$KeepLang' AND dedup_keep AND gopher_keep" +
          " AND gopher_doc_keep AND c4_keep AND tox_keep AND decon_keep AS train_keep",
        "quality_score", "lang_pred", "gopher_keep", "gopher_doc_keep",
        "c4_keep", "tox_keep", "decon_keep", "reason")

  /** Composition PROOF shape: one declarative query re-deriving every
    * leg from the raw corpus, with an exact nested SQL twin. Use this
    * for audits/verification; use [[trainFilterStaged]] in production —
    * re-running shingling+LSH+contraction per consumer is the
    * anti-pattern at 100 TB. */
  def trainFilter(spark: SparkSession, dir: String): DataFrame = {
    val q = TextStats.quality(spark, dir)
      .select("doc_id", "quality_score", "pass")
    val l = LangIdModel.predict(spark, dir).select("doc_id", "lang_pred")
    val k = Dedup.keepList(spark, dir)
      .select(col("doc_id"), col("keep").as("dedup_keep"), col("reason"))
    val g = GopherQuality.quality(spark, dir).select("doc_id", "gopher_keep")
    // both page legs read ONE page-view subtree (identical construction
    // either way — the staged variant shares it via the pages stage; here
    // the shared lazy frame lets the planner reuse the enrichment's
    // exchanges instead of planning the self-join twice)
    val pages = C4Quality.pageView(spark, dir)
    val gd = C4Quality.gopherDocPages(pages).select("doc_id", "gopher_doc_keep")
    val c4 = C4Quality.cleanPages(pages)
      .select(col("doc_id"), col("page_keep").as("c4_keep"))
    val tx = Toxicity.toxicity(spark, dir).select("doc_id", "tox_keep")
    val dc = Curation.decontaminate(spark, dir)
      .selectExpr("doc_id", "NOT is_eval AND NOT contaminated AS decon_keep")
    compose(q, l, k, g, gd, c4, tx, dc)
  }

  /** Production shape: each leg is computed ONCE, written to a staging
    * table, and the final decision joins the MATERIALIZED frames — so
    * the expensive legs (the keep-list runs shingling + LSH + graph
    * contraction) are paid once and reusable by other consumers, and a
    * failed final join resumes from the staged parquet instead of
    * recomputing. Same rows as [[trainFilter]] (TrainFilterSpec asserts
    * hash-equality; same oracle SQL). At cluster scale the staging dir
    * is a real table (Iceberg/bucketed parquet on doc_id) and the
    * final joins co-partition without a shuffle.
    *
    * The independent legs' stage writes are SUBMITTED CONCURRENTLY
    * (Futures over the shared session — each write is a blocking
    * driver action, and serializing eight of them left the cluster
    * idle between jobs; the scheduler interleaves their stages). Only
    * the two page legs wait, on the shared page-view staging they
    * derive from.
    *
    * `evalGrams` (see [[Curation.evalGramsOf]]) switches the
    * decontamination leg from the held-out split to a real benchmark
    * gram set — the production knob (CurateJob `--eval`); default None
    * keeps the oracle-checked split semantics.
    *
    * `resume = true` makes the resumability claim operational: a leg
    * whose staged parquet carries the committer's `_SUCCESS` marker is
    * READ BACK instead of recomputed, so a killed run re-pays only the
    * legs that had not committed (an interrupted write leaves no
    * `_SUCCESS`, so a torn leg always recomputes). Same contract as
    * [[graft.pipeline.Checkpoint]]: resume assumes the same input and
    * options — stage into a fresh dir when either changes. Default
    * false preserves recompute-everything semantics for audits. */
  def trainFilterStaged(spark: SparkSession, dir: String, stageDir: String,
                        evalGrams: Option[DataFrame] = None,
                        resume: Boolean = false): DataFrame = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    def stage(name: String, df: => DataFrame): Future[DataFrame] = Future {
      val p = s"$stageDir/$name"
      if (!(resume && StageCommit.committed(spark, p)))
        df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val q = stage("quality", TextStats.quality(spark, dir)
      .select("doc_id", "quality_score", "pass"))
    val l = stage("langid", LangIdModel.predict(spark, dir).select("doc_id", "lang_pred"))
    val k = stage("keeplist", Dedup.keepList(spark, dir)
      .select(col("doc_id"), col("keep").as("dedup_keep"), col("reason")))
    val g = stage("gopher",
      GopherQuality.quality(spark, dir).select("doc_id", "gopher_keep"))
    // the two page-view legs derive from ONE staged enrichment instead
    // of each rebuilding it (same rows — cleanOracle/gopherDocOracle
    // construct the identical view; TrainFilterSpec hash-equality holds)
    val pages = stage("pages", C4Quality.pageView(spark, dir))
    val gd = pages.flatMap(p => stage("gopherdoc",
      C4Quality.gopherDocPages(p).select("doc_id", "gopher_doc_keep")))
    val c4 = pages.flatMap(p => stage("c4",
      C4Quality.cleanPages(p).select(col("doc_id"), col("page_keep").as("c4_keep"))))
    val tx = stage("toxicity",
      Toxicity.toxicity(spark, dir).select("doc_id", "tox_keep"))
    val dc = stage("decontam",
      Curation.decontaminateDocs(Inputs.documents(spark, dir), evalGrams)
        .selectExpr("doc_id", "NOT is_eval AND NOT contaminated AS decon_keep"))
    val Seq(qS, lS, kS, gS, gdS, c4S, txS, dcS) =
      Await.result(Future.sequence(Seq(q, l, k, g, gd, c4, tx, dc)), Duration.Inf)
    compose(qS, lS, kS, gS, gdS, c4S, txS, dcS)
  }

  /** The eight legs' oracles nested as CTE bodies + the same joins. */
  def trainFilterOracle: String =
    s"""WITH q AS (
       |${TextStats.qualityOracle}
       |), l AS (
       |${LangIdModel.predictOracle}
       |), k AS (
       |${Dedup.keepListOracle()}
       |), g AS (
       |${GopherQuality.qualityOracle}
       |), gd AS (
       |${C4Quality.gopherDocOracle}
       |), c4 AS (
       |${C4Quality.cleanOracle}
       |), tx AS (
       |${Toxicity.toxicityOracle}
       |), dc AS (
       |${Curation.decontaminateOracle}
       |)
       |SELECT q.doc_id,
       |  (q.pass AND l.lang_pred = '$KeepLang' AND k.keep AND g.gopher_keep
       |   AND gd.gopher_doc_keep AND c4.page_keep AND tx.tox_keep
       |   AND NOT dc.is_eval AND NOT dc.contaminated) AS train_keep,
       |  q.quality_score, l.lang_pred, g.gopher_keep,
       |  gd.gopher_doc_keep, c4.page_keep AS c4_keep, tx.tox_keep,
       |  (NOT dc.is_eval AND NOT dc.contaminated) AS decon_keep, k.reason
       |FROM q
       |JOIN l ON l.doc_id = q.doc_id
       |JOIN k ON k.doc_id = q.doc_id
       |JOIN g ON g.doc_id = q.doc_id
       |JOIN gd ON gd.doc_id = q.doc_id
       |JOIN c4 ON c4.doc_id = q.doc_id
       |JOIN tx ON tx.doc_id = q.doc_id
       |JOIN dc ON dc.doc_id = q.doc_id""".stripMargin
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AcAnyExpr, AcScrubExpr, CosineExpr, CosineFDExpr,
  FingerprintMinExpr, MinHashSigExpr, PiiScanExpr, PyCollapseTrim, SimHashExpr}

/**
 * Session extensions: registers the engine's custom Catalyst
 * expressions for SQL callers —
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
 *   SELECT pii_scan(text), cosine(a.embedding, b.embedding),
 *          minhash_sig(shingles), simhash(tokens, 8),
 *          fingerprint_min(text), py_collapse_trim(text) …
 *
 * (`vader_compound` is a ScalaUDF and registers per-session via
 * [[graft.functions.VaderUdf.register]].)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        // each function's own expression class, so DESCRIBE FUNCTION
        // metadata points at the real implementation
        new ExpressionInfo(cls.getName, name),
        builder))
    }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[graft] val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("pii_scan", classOf[PiiScanExpr],
      (c: Seq[Expression]) => PiiScanExpr(c.head)),
    ("py_collapse_trim", classOf[PyCollapseTrim],
      (c: Seq[Expression]) => PyCollapseTrim(c.head)),
    ("minhash_sig", classOf[MinHashSigExpr],
      (c: Seq[Expression]) => MinHashSigExpr(c.head)),
    ("cosine", classOf[CosineExpr],
      (c: Seq[Expression]) => CosineExpr(c.head, c(1))),
    ("simhash", classOf[SimHashExpr],
      (c: Seq[Expression]) => SimHashExpr(c.head, litInt(c(1), "simhash hexLen"))),
    ("fingerprint_min", classOf[FingerprintMinExpr],
      (c: Seq[Expression]) => FingerprintMinExpr(c.head)),
    ("cosine_fd", classOf[CosineFDExpr],
      (c: Seq[Expression]) => CosineFDExpr(c.head, c(1))),
    // context keywords are the engine's fixed set; SQL callers get the
    // same automaton the fused scanner uses
    ("ac_any", classOf[AcAnyExpr],
      (c: Seq[Expression]) => AcAnyExpr(c.head, graft.rules.PiiRules.ContextKeywords)),
    ("ac_scrub", classOf[AcScrubExpr],
      (c: Seq[Expression]) => AcScrubExpr(c.head,
        graft.rules.PiiRules.ContextKeywords, litStr(c(1), "ac_scrub mask")))
  )

  private def litStr(e: Expression, what: String): String = e.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** Same registration against an already-built session (extensions
    * only apply at builder time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    graft.functions.VaderUdf.register(spark)
  }
}

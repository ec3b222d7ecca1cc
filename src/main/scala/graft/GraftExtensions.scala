package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.PiiScanExpr

/**
 * Session extensions: registers the engine's custom Catalyst expression
 * for SQL callers —
 *
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
 *   SELECT pii_scan(text) FROM transcripts
 *
 * (`vader_compound` is a ScalaUDF and registers per-session via
 * [[graft.functions.VaderUdf.register]].)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("pii_scan"),
      new ExpressionInfo(classOf[PiiScanExpr].getName, "pii_scan"),
      (children: Seq[Expression]) => PiiScanExpr(children.head)))
  }
}

object GraftExtensions {
  /** Same registration against an already-built session (extensions
    * only apply at builder time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pii_scan", (children: Seq[Expression]) => PiiScanExpr(children.head), "scala_udf")
    graft.functions.VaderUdf.register(spark)
  }
}

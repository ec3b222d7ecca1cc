package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{udf, when, col, lit}
import org.apache.spark.sql.expressions.UserDefinedFunction
import graft.rules.Vader

/**
 * Spark exposure of the VADER compound scorer (SURVEY.md §2.4 X1).
 *
 * A ScalaUDF over the pure [[Vader.compound]] function: the lexicon is a
 * JVM-static immutable Map, so executors share one copy per JVM (no
 * broadcast needed; at cluster scale the closure ships only the function
 * reference). Deterministic, so Catalyst may reorder/CSE it freely.
 */
object VaderUdf {

  val compound: UserDefinedFunction =
    udf((s: String) => Vader.compound(s)).withName("vader_compound")

  /** X2 (sentiment.py:325-337): ==0 neutral, >0 happy, <0 sad.
    * (Emoji in the reference UI; stable ASCII labels here.) */
  def label(score: Column): Column =
    when(score === 0.0, "neutral").when(score > 0.0, "happy").otherwise("sad")

  /** Register `vader_compound` for spark.sql callers. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("vader_compound", (s: String) => Vader.compound(s))
}

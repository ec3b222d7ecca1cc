package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's models-endpoint listing
 * (`/root/reference/reddacted/api/list_models.py:8-38`): GET
 * `{base}/v1/models` (OpenAI-compatible), extract `data[].id`, error
 * when none. The HTTP half is client plumbing; the compute half — the
 * listing-JSON parse with the reference's exact keep rule (rows with a
 * non-null `id`) and its loud empty-result failure (`ModelFetchError`)
 * — is this scan. At scale the same parse reads a landing zone of
 * captured endpoint responses.
 */
object ModelsJson {

  final class ModelFetchError(msg: String) extends RuntimeException(msg)

  /** Parse an OpenAI-compatible `/v1/models` response document into one
    * row per model id. Mirrors `fetch_available_models`: `data` missing
    * or empty, or every entry id-less → ModelFetchError (the reference
    * raises rather than returning an empty list). */
  def parseModels(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val raw = spark.read.option("multiLine", "true").json(path)
    // schema-driven like parseTree: a listing where NO entry carries an
    // id infers an element struct without the field — the same
    // "no available models" condition as an empty data array
    val hasId = raw.schema.fields.find(_.name == "data").map(_.dataType) match {
      case Some(ArrayType(s: StructType, _)) => s.fieldNames.contains("id")
      case _ => false
    }
    if (!hasId)
      throw new ModelFetchError("No available models found in the API response.")
    val rows = raw
      .select(explode(col("data")).as("m"))
      .select(col("m.id").as("id"))
      // [m.get("id") ... if m.get("id")] — Python truthiness drops BOTH
      // missing and empty-string ids, so "" must not count as a model
      .filter(col("id").isNotNull && col("id") =!= "")
    if (rows.isEmpty)
      throw new ModelFetchError("No available models found in the API response.")
    rows
  }
}

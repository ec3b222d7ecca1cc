package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Clean

/**
 * S1/S2 (api/scraper.py:23-119): the reference's nested-JSON endpoint
 * scan, re-expressed as a declarative read: multiLine JSON → explode
 * `data.children` → project rows that carry a `body` → P1 projection
 * {text, upvotes, downvotes, permalink, id} with P2/P3 cleaning and the
 * F1 non-empty filter — the exact row construction of parse_listing.
 *
 * At scale this is `spark.read.json` over a partitioned landing zone;
 * the nested-walk is Catalyst `explode`, so pruning/pushdown apply to
 * the projected leaf fields only.
 */
object RedditJson {

  /** Parse a reddit listing/user JSON document into comment rows. */
  def parseListing(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("data.children")).as("child"))
      .select(
        col("child.data.body").as("body"),
        col("child.data.ups").as("ups"),
        col("child.data.downs").as("downs"),
        col("child.data.permalink").as("permalink"),
        col("child.data.id").as("id"))
      .filter(col("body").isNotNull) // "if 'body' in data" (scraper.py:54)
      .select(
        Clean.scrapeClean(col("body")).as("text"), // P2 + P3
        col("ups").cast("int").as("upvotes"),
        col("downs").cast("int").as("downvotes"),
        col("permalink"), col("id"))
      .filter(col("text") =!= "") // F1 (scraper.py:59)

  /** The reference's user-scan variant adds server-side sort/limit
    * (O1/O2); re-expressed as orderBy + limit over the same rows. */
  def parseUser(spark: SparkSession, path: String, sort: String = "new",
                limit: Int = 100): DataFrame = {
    val rows = parseListing(spark, path)
    val sorted = sort match {
      case "top" => rows.orderBy(desc("upvotes"), asc("id"))
      // "new": reddit ids are base-36 creation ordinals — compare
      // NUMERICALLY (string desc would misorder ids of unequal length)
      case _ => rows.orderBy(conv(col("id"), 36, 10).cast("long").desc)
    }
    if (limit > 0) sorted.limit(limit) else sorted
  }
}

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

  /** S3 (api/reddit.py:155-191): authenticated comment-tree expansion —
    * `replace_more(limit=None)` + tree flatten. The IO half (fetching
    * "more" stubs from the endpoint) is client plumbing; the compute
    * half — flattening an arbitrarily nested comment forest into rows —
    * is this iterative explode: one narrow, shuffle-free explode per
    * depth level (schema-driven; terminates when the inferred schema has
    * no deeper `replies.data.children`), unioned by name. "more" stubs
    * are skipped (kind <> "t1"); a real client expands them by
    * fetch-and-append BEFORE the flatten, which leaves this plan
    * unchanged. Emits (id, parent_id, depth) so the tree is losslessly
    * reconstructible downstream. */
  def parseTree(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{DataType, StructType}
    def hasDeeperChildren(dt: DataType): Boolean = dt match {
      case s: StructType if s.fieldNames.contains("replies") =>
        s("replies").dataType match {
          case r: StructType if r.fieldNames.contains("data") =>
            r("data").dataType match {
              case d: StructType => d.fieldNames.contains("children")
              case _ => false
            }
          case _ => false
        }
      case _ => false
    }
    val raw = spark.read.option("multiLine", "true").json(path)
    var level = raw.select(explode(col("data.children")).as("c"))
      .select(col("c.kind").as("kind"), col("c.data").as("d"),
        lit(null).cast("string").as("parent_id"), lit(0).as("depth"))
    val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var depth = 0
    var more = true
    while (more) {
      val comments = level.filter(col("kind") === "t1" && col("d.body").isNotNull)
      out += comments
        .select(col("d.id").as("id"), col("parent_id"),
          Clean.scrapeClean(col("d.body")).as("text"),
          col("d.ups").cast("int").as("upvotes"),
          col("d.downs").cast("int").as("downvotes"),
          col("depth"))
        .filter(col("text") =!= "")
      if (hasDeeperChildren(level.schema("d").dataType)) {
        depth += 1
        level = comments
          .select(col("d.id").as("pid"), explode(col("d.replies.data.children")).as("c"))
          .select(col("c.kind").as("kind"), col("c.data").as("d"),
            col("pid").as("parent_id"), lit(depth).as("depth"))
      } else more = false
    }
    out.reduce(_ unionByName _)
  }

  /** The reference's user-scan variant adds server-side sort/limit
    * (O1/O2, api/reddit.py:371-378); re-expressed as orderBy + limit
    * over the same rows. `new`/`top` order on fields the listing
    * carries directly; `hot`/`controversial` apply reddit's published
    * rank formulas ([[graft.rules.Ranking]]) client-side, using the
    * base-36 id creation ordinal as the hot formula's time input (the
    * listing projection drops created_utc; the ordinal is monotone in
    * it, which is all the recency term needs at fixture scale — a
    * landing zone that retains created_utc passes it instead). Every
    * branch is a TakeOrderedAndProject: rank-at-scale is one map-side
    * score + one top-k, no shuffle of the full listing. */
  def parseUser(spark: SparkSession, path: String, sort: String = "new",
                limit: Int = 100): DataFrame = {
    val rows = parseListing(spark, path)
    val created = conv(col("id"), 36, 10).cast("long")
    val sorted = sort match {
      case "top" => rows.orderBy(desc("upvotes"), asc("id"))
      case "hot" => rows.orderBy(
        graft.rules.Ranking.hotScore(col("upvotes"), col("downvotes"), created).desc,
        asc("id"))
      case "controversial" => rows.orderBy(
        graft.rules.Ranking.controversyScore(col("upvotes"), col("downvotes")).desc,
        asc("id"))
      // "new": reddit ids are base-36 creation ordinals — compare
      // NUMERICALLY (string desc would misorder ids of unequal length)
      case _ => rows.orderBy(created.desc)
    }
    if (limit > 0) sorted.limit(limit) else sorted
  }
}

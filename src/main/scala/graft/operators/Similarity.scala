package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Similarity search over the `embeddings` table (vec_id, embedding:
 * array<float>[64], label).
 *
 * Brute-force cosine top-k is the correctness baseline; the scale path
 * is random-hyperplane LSH (deterministic md5-seeded ±1 planes) that
 * prunes candidates to one bucket before scoring. All arithmetic is
 * float→double cast then left-to-right summation, identically phrased
 * in Spark and the DuckDB oracle, so scores agree bit-for-bit before
 * the 6dp rounding.
 *
 * Scale notes: brute-force is a broadcast of one query row against an
 * arbitrarily partitioned scan (no shuffle); top-k is
 * TakeOrderedAndProject (per-partition heap + driver merge of k rows).
 * LSH bucketing is map-side; the bucket filter prunes ~(1/2^planes) of
 * the corpus before any scoring.
 */
object Similarity {

  val Dim = 64
  val Planes = 8

  /** Deterministic ±1 hyperplanes: sign of the first md5 hex nibble of
    * "p:d". Same literals are embedded in the SQL oracle. */
  lazy val planes: IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until Planes).map { p =>
      (0 until Dim).map { d =>
        val h = md.digest(s"$p:$d".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) < 8) 1 else -1
      }
    }
  }

  /** dot(a, b) with float→double casts, summed left-to-right. */
  private def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, $Dim), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def cosSpark(a: String, b: String): String =
    s"${dotSpark(a, b)} / (sqrt(${dotSpark(a, a)}) * sqrt(${dotSpark(b, b)}))"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Cosine between adjacent vec_ids — dense probe of the kernel. */
  def cosineAdjacent(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.selectExpr("vec_id AS a_id", "embedding AS ea")
      .join(e.selectExpr("vec_id - 1 AS a_id", "vec_id AS b_id", "embedding AS eb"), "a_id")
      .selectExpr("a_id", "b_id", s"round(${cosSpark("ea", "eb")}, 6) AS cosine")
  }

  val cosineAdjacentOracle: String =
    s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cosine
       |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin

  /** Brute-force cosine top-k for query vec 0 (broadcast single row; the
    * scan side never shuffles; TakeOrderedAndProject merges k per
    * partition). Round-then-order so engines agree on boundary ties. */
  def annTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter("vec_id = 0").selectExpr("embedding AS q")
    e.filter("vec_id <> 0")
      .join(org.apache.spark.sql.functions.broadcast(q))
      .selectExpr("vec_id", s"round(${cosSpark("embedding", "q")}, 6) AS cosine")
      .orderBy(org.apache.spark.sql.functions.desc("cosine"),
        org.apache.spark.sql.functions.asc("vec_id"))
      .limit(k)
  }

  def annTopKOracle(k: Int = 10): String =
    s"""SELECT vec_id, round(${cosSql("embedding", "q")}, 6) AS cosine
       |FROM embeddings CROSS JOIN (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
       |WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id ASC LIMIT $k""".stripMargin

  private def bucketExpr(dot: Int => String, nPlanes: Int = Planes): String =
    (0 until nPlanes).map(p => s"CASE WHEN ${dot(p)} > 0 THEN ${1 << p} ELSE 0 END")
      .mkString(" + ")

  private def planeLitSpark(p: Int): String =
    "array(" + planes(p).map(v => s"$v.0D").mkString(", ") + ")"
  private def planeLitSql(p: Int): String =
    "[" + planes(p).map(v => s"$v.0").mkString(", ") + "]"

  /** Per-vector LSH bucket id (map-side only; no shuffle). */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val b = bucketExpr(p => dotSpark("embedding", planeLitSpark(p)))
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", s"CAST($b AS INT) AS bucket")
  }

  val lshBucketsOracle: String = {
    val b = bucketExpr(p => dotSql("embedding", planeLitSql(p)))
    s"SELECT vec_id, CAST($b AS INT) AS bucket FROM embeddings"
  }

  /** Planes used by the ANN-LSH query: coarser than [[Planes]] so the
    * query bucket is populated even at small SF (recall/selectivity is a
    * planes-count dial; 4 planes = 16 buckets). */
  val AnnPlanes = 4

  /** LSH-pruned ANN: score only vectors sharing the query's bucket. */
  def annLsh(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val b = bucketExpr(p => dotSpark("embedding", planeLitSpark(p)), AnnPlanes)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding", s"CAST($b AS INT) AS bucket")
    val q = e.filter("vec_id = 0").selectExpr("embedding AS q", "bucket AS qb")
    e.join(org.apache.spark.sql.functions.broadcast(q))
      .filter("vec_id <> 0 AND bucket = qb")
      .selectExpr("vec_id", s"round(${cosSpark("embedding", "q")}, 6) AS cosine")
      .orderBy(org.apache.spark.sql.functions.desc("cosine"),
        org.apache.spark.sql.functions.asc("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket the corpus, then
    * score only same-bucket pairs and keep cosine >= threshold (0.3 here: the synthetic corpus is near-orthogonal random vectors, so a production 0.9+ cut would be vacuous) — the
    * scale path for embedding dedup (candidate generation is a bucket
    * equi-join, never all-pairs). */
  def embedNearDup(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    val b = bucketExpr(p => dotSpark("embedding", planeLitSpark(p)), AnnPlanes)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding", s"CAST($b AS INT) AS bucket")
    e.as("x").join(e.as("y"),
        org.apache.spark.sql.functions.col("x.bucket") ===
          org.apache.spark.sql.functions.col("y.bucket") &&
          org.apache.spark.sql.functions.col("x.vec_id") <
            org.apache.spark.sql.functions.col("y.vec_id"))
      .selectExpr("x.vec_id AS a_id", "y.vec_id AS b_id",
        s"round(${cosSpark("x.embedding", "y.embedding")}, 6) AS cosine")
      .filter(s"cosine >= $threshold")
  }

  def embedNearDupOracle(threshold: Double = 0.3): String = {
    val b = bucketExpr(p => dotSql("embedding", planeLitSql(p)), AnnPlanes)
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, CAST($b AS INT) AS bucket FROM embeddings
       |)
       |SELECT x.vec_id AS a_id, y.vec_id AS b_id,
       |  round(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
       |FROM bucketed x JOIN bucketed y
       |  ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE round(${cosSql("x.embedding", "y.embedding")}, 6) >= $threshold""".stripMargin
  }

  /** IVF centroid ids: a deterministic coarse codebook — corpus vectors
    * 1..16 stand in for trained k-means centroids (training is an
    * offline concern; the operator shape — assign to nearest centroid,
    * probe one inverted list — is what scales). */
  val IvfCentroids = 16

  /** IVF cell assignment: nearest centroid by cosine (tie → smaller
    * centroid id), via a broadcast join + window argmax. */
  def ivfCells(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, row_number, desc, asc}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = e.filter(s"vec_id BETWEEN 1 AND $IvfCentroids")
      .selectExpr("vec_id AS cent_id", "embedding AS cent")
    val scored = e.join(broadcast(cents))
      .selectExpr("vec_id", s"cent_id", s"round(${cosSpark("embedding", "cent")}, 6) AS ccos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("ccos"), asc("cent_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("vec_id", "cent_id")
  }

  val ivfCellsOracle: String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
       |  WHERE vec_id BETWEEN 1 AND $IvfCentroids
       |), scored AS (
       |  SELECT e.vec_id, c.cent_id,
       |    round(${cosSql("e.embedding", "c.cent")}, 6) AS ccos
       |  FROM embeddings e CROSS JOIN cents c
       |), ranked AS (
       |  SELECT vec_id, cent_id,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rk
       |  FROM scored
       |)
       |SELECT vec_id, cent_id FROM ranked WHERE rk = 1""".stripMargin

  /** IVF-probed ANN: search only the query's cell (nprobe = 1). */
  def annIvf(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, desc, asc}
    val cells = ivfCells(spark, dir)
    val e = spark.read.parquet(s"$dir/embeddings.parquet").join(cells, "vec_id")
    val q = e.filter("vec_id = 0").selectExpr("embedding AS qv", "cent_id AS qc")
    e.join(broadcast(q))
      .filter("vec_id <> 0 AND cent_id = qc")
      .selectExpr("vec_id", s"round(${cosSpark("embedding", "qv")}, 6) AS cosine")
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  def annIvfOracle(k: Int = 5): String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
       |  WHERE vec_id BETWEEN 1 AND $IvfCentroids
       |), scored AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |    round(${cosSql("e.embedding", "c.cent")}, 6) AS ccos
       |  FROM embeddings e CROSS JOIN cents c
       |), cells AS (
       |  SELECT vec_id, embedding, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rk
       |    FROM scored) WHERE rk = 1
       |)
       |SELECT vec_id, round(${cosSql("embedding", "qv")}, 6) AS cosine
       |FROM cells CROSS JOIN (SELECT embedding AS qv, cent_id AS qc FROM cells WHERE vec_id = 0)
       |WHERE vec_id <> 0 AND cent_id = qc
       |ORDER BY cosine DESC, vec_id ASC LIMIT $k""".stripMargin

  def annLshOracle(k: Int = 5): String = {
    val b = bucketExpr(p => dotSql("embedding", planeLitSql(p)), AnnPlanes)
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, CAST($b AS INT) AS bucket FROM embeddings
       |)
       |SELECT vec_id, round(${cosSql("embedding", "q")}, 6) AS cosine
       |FROM bucketed CROSS JOIN (SELECT embedding AS q, bucket AS qb FROM bucketed WHERE vec_id = 0)
       |WHERE vec_id <> 0 AND bucket = qb
       |ORDER BY cosine DESC, vec_id ASC LIMIT $k""".stripMargin
  }
}

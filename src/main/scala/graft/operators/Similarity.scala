package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Similarity search over the `embeddings` table (vec_id, embedding:
 * array<float>[64], label).
 *
 * Brute-force cosine top-k is the correctness baseline; the scale path
 * is random-hyperplane LSH (deterministic md5-seeded ±1 planes) in the
 * standard multi-table banded form: [[AnnTables]] independent tables of
 * [[AnnPlanes]] planes each. Candidates = union over tables of
 * same-bucket matches — recall grows with tables, per-bucket population
 * shrinks 2^-planes, so the same-bucket join is O(T · N²/2^P) instead of
 * round 1's O(N²/16). All arithmetic is float→double cast then
 * left-to-right summation, identically phrased in Spark and the DuckDB
 * oracle, so scores agree bit-for-bit before the 6dp rounding.
 *
 * Scale notes: brute-force is a broadcast of one query row against an
 * arbitrarily partitioned scan (no shuffle); top-k is
 * TakeOrderedAndProject (per-partition heap + driver merge of k rows).
 * LSH bucketing is map-side; at production N, planes (P) scales as
 * ~log2(N / target-bucket-size) and tables (T) buys back recall — both
 * are parameters here, with the committed defaults sized so the sf0.01
 * oracle stays non-trivially populated.
 */
object Similarity {

  val Dim = 64
  val Planes = 8

  /** Deterministic ±1 hyperplanes: sign of the first md5 hex nibble of
    * "<seed>p:d". Same literals are embedded in the SQL oracle. */
  private def planesFor(seed: String, n: Int): IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { p =>
      (0 until Dim).map { d =>
        val h = md.digest(s"$seed$p:$d".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) < 8) 1 else -1
      }
    }
  }

  lazy val planes: IndexedSeq[IndexedSeq[Int]] = planesFor("", Planes)

  /** dot(a, b) with float→double casts, summed left-to-right — the
    * oracle-side rendering; Spark runs [[graft.functions.Cosine]] /
    * [[graft.functions.LshBucket]] with the same arithmetic. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, $Dim), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Cosine between adjacent vec_ids — dense probe of the kernel. The
    * Spark side scores with the fused codegen'd [[graft.functions.Cosine]]
    * (bit-identical arithmetic); the oracle keeps the composed HOF form. */
  def cosineAdjacent(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, round}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    e.selectExpr("vec_id AS a_id", "embedding AS ea")
      .join(e.selectExpr("vec_id - 1 AS a_id", "vec_id AS b_id", "embedding AS eb"), "a_id")
      .select(col("a_id"), col("b_id"),
        round(graft.functions.Cosine(col("ea"), col("eb")), 6).as("cosine"))
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
    import org.apache.spark.sql.functions.{asc, broadcast, col, desc, round}
    e.filter("vec_id <> 0")
      .join(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.Cosine(col("embedding"), col("q")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Query-BATCH ANN: top-k per query for a broadcast query table (vec
    * ids < nQueries stand in for an arriving query batch) — the
    * production shape where queries amortize one corpus scan. The corpus
    * side never shuffles into the scoring join (broadcast); the only
    * shuffle is the per-query top-k window keyed by q_id, whose input is
    * |corpus|·nQueries scored rows — at scale, nQueries per job is the
    * dial that keeps that bounded. */
  def annTopKBatch(spark: SparkSession, dir: String,
                   nQueries: Int = 8, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions.{asc, broadcast, col, desc, round, row_number}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val qs = broadcast(e.filter(s"vec_id < $nQueries")
      .selectExpr("vec_id AS q_id", "embedding AS q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("cosine"), asc("vec_id"))
    e.filter(s"vec_id >= $nQueries").join(qs)
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.Cosine(col("embedding"), col("q")), 6).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("q_id", "vec_id", "cosine")
  }

  def annTopKBatchOracle(nQueries: Int = 8, k: Int = 5): String =
    s"""WITH scored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    round(${cosSql("e.embedding", "q.embedding")}, 6) AS cosine
       |  FROM embeddings e
       |  CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $nQueries) q
       |  WHERE e.vec_id >= $nQueries
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rk
       |  FROM scored
       |)
       |SELECT q_id, vec_id, cosine FROM ranked WHERE rk <= $k""".stripMargin

  def annTopKOracle(k: Int = 10): String =
    s"""SELECT vec_id, round(${cosSql("embedding", "q")}, 6) AS cosine
       |FROM embeddings CROSS JOIN (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
       |WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id ASC LIMIT $k""".stripMargin

  private def bucketExpr(dot: Int => String, nPlanes: Int = Planes): String =
    (0 until nPlanes).map(p => s"CASE WHEN ${dot(p)} > 0 THEN ${1 << p} ELSE 0 END")
      .mkString(" + ")

  private def planeLitSql(ps: IndexedSeq[IndexedSeq[Int]])(p: Int): String =
    "[" + ps(p).map(v => s"$v.0").mkString(", ") + "]"

  private def planesD(ps: IndexedSeq[IndexedSeq[Int]]): Seq[Seq[Double]] =
    ps.map(_.map(_.toDouble).toSeq).toSeq

  /** Per-vector LSH bucket id (map-side only; no shuffle). Spark runs
    * the fused codegen'd [[graft.functions.LshBucket]] (identical
    * arithmetic); the oracle keeps the composed per-plane form. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.LshBucket(col("embedding"), planesD(planes)).as("bucket"))
  }

  val lshBucketsOracle: String = {
    val b = bucketExpr(p => dotSql("embedding", planeLitSql(planes)(p)))
    s"SELECT vec_id, CAST($b AS INT) AS bucket FROM embeddings"
  }

  /** Multi-table banded LSH for the ANN/near-dup operators: each table
    * is an independent [[AnnPlanes]]-plane hash (seed "t<i>:"), so a pair
    * colliding in ANY table is a candidate. Tables buy recall, planes buy
    * selectivity (2^-planes per-bucket mass). */
  val AnnPlanes = 8
  val AnnTables = 4

  private lazy val tablePlanes: IndexedSeq[IndexedSeq[IndexedSeq[Int]]] =
    (0 until AnnTables).map(t => planesFor(s"t$t:", AnnPlanes))

  private def tableBucketSql(t: Int, emb: String): String =
    bucketExpr(p => dotSql(emb, planeLitSql(tablePlanes(t))(p)), AnnPlanes)

  /** (vec_id, tbl, bucket) — one row per vector per table (map-side;
    * all T·P dot products fused into one codegen'd pass per table). */
  private def bandedTables(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{array, col, explode, lit, struct}
    val structs = (0 until AnnTables).map { t =>
      struct(lit(t).as("tbl"),
        graft.functions.LshBucket(col("embedding"), planesD(tablePlanes(t))).as("bucket"))
    }
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), explode(array(structs: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  private val bandedTablesCte: String = {
    val selects = (0 until AnnTables)
      .map(t => s"SELECT vec_id, $t AS tbl, CAST(${tableBucketSql(t, "embedding")} AS INT) AS bucket FROM embeddings")
      .mkString("\n  UNION ALL\n  ")
    s"""banded AS (
       |  $selects
       |)""".stripMargin
  }

  /** LSH-pruned ANN: score only vectors sharing a bucket with the query
    * in at least one table (union of [[AnnTables]] probes). */
  def annLsh(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val banded = bandedTables(spark, dir)
    val qb = banded.filter("vec_id = 0").select("tbl", "bucket")
    val cands = banded.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter("vec_id <> 0").select("vec_id").distinct()
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter("vec_id = 0").selectExpr("embedding AS q")
    import org.apache.spark.sql.functions.{asc, col, desc, round}
    e.join(cands, "vec_id")
      .join(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.Cosine(col("embedding"), col("q")), 6).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  def annLshOracle(k: Int = 5): String =
    s"""WITH $bandedTablesCte,
       |cands AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM banded b JOIN banded q ON q.vec_id = 0
       |    AND b.tbl = q.tbl AND b.bucket = q.bucket
       |  WHERE b.vec_id <> 0
       |)
       |SELECT e.vec_id, round(${cosSql("e.embedding", "q.q")}, 6) AS cosine
       |FROM embeddings e
       |JOIN cands c ON c.vec_id = e.vec_id
       |CROSS JOIN (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) q
       |ORDER BY cosine DESC, e.vec_id ASC LIMIT $k""".stripMargin

  /** Embedding-cosine near-duplicate pairs: candidates = same-bucket
    * pairs in ANY of the [[AnnTables]] tables (deduped), scored once,
    * kept at cosine >= threshold (0.3 here: the synthetic corpus is
    * near-orthogonal random vectors, so a production 0.9+ cut would be
    * vacuous). Candidate generation is a (tbl, bucket) equi-join —
    * never all-pairs — and per-bucket mass shrinks 2^-AnnPlanes. */
  def embedNearDup(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.functions.col
    val banded = bandedTables(spark, dir)
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    import org.apache.spark.sql.functions.round
    pairs
      .join(e.selectExpr("vec_id AS a_id", "embedding AS ea"), "a_id")
      .join(e.selectExpr("vec_id AS b_id", "embedding AS eb"), "b_id")
      .select(col("a_id"), col("b_id"),
        round(graft.functions.Cosine(col("ea"), col("eb")), 6).as("cosine"))
      .filter(s"cosine >= $threshold")
  }

  def embedNearDupOracle(threshold: Double = 0.3): String =
    s"""WITH $bandedTablesCte,
       |pairs AS (
       |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
       |  FROM banded x JOIN banded y
       |    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
       |)
       |SELECT p.a_id, p.b_id,
       |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cosine
       |FROM pairs p
       |JOIN embeddings a ON a.vec_id = p.a_id
       |JOIN embeddings b ON b.vec_id = p.b_id
       |WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= $threshold""".stripMargin

  /** IVF centroid ids: a deterministic coarse codebook — corpus vectors
    * 1..16 stand in for trained k-means centroids (training is an
    * offline concern; the operator shape — assign to nearest centroid,
    * probe one inverted list — is what scales). */
  val IvfCentroids = 16

  /** IVF cell assignment: nearest centroid by cosine (tie → smaller
    * centroid id), via a broadcast join + max_by HASH aggregate: the
    * ordering (ccos, -cent_id) is packed into one BIGINT (ccos is
    * 6dp-rounded so ccos*1e6 is integral; cent_id < 1024), keeping the
    * aggregation buffer fixed-width → HashAggregate with a map-side
    * combiner, no sort anywhere (a struct ordering would force
    * SortAggregate; the row_number window would shuffle all candidate
    * rows instead of one row per vector). */
  def ivfCells(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, expr}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = e.filter(s"vec_id BETWEEN 1 AND $IvfCentroids")
      .selectExpr("vec_id AS cent_id", "embedding AS cent")
    import org.apache.spark.sql.functions.{col, round}
    e.join(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        round(graft.functions.Cosine(col("embedding"), col("cent")), 6).as("ccos"))
      .groupBy("vec_id")
      .agg(expr(
        "max_by(cent_id, CAST(round(ccos * 1000000) AS BIGINT) * 1024 - cent_id) AS cent_id"))
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
    import org.apache.spark.sql.functions.{broadcast, desc, asc}
    val cells = ivfCells(spark, dir)
    val e = spark.read.parquet(s"$dir/embeddings.parquet").join(cells, "vec_id")
    val q = e.filter("vec_id = 0").selectExpr("embedding AS qv", "cent_id AS qc")
    import org.apache.spark.sql.functions.{col, round}
    e.join(broadcast(q))
      .filter("vec_id <> 0 AND cent_id = qc")
      .select(col("vec_id"),
        round(graft.functions.Cosine(col("embedding"), col("qv")), 6).as("cosine"))
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
}

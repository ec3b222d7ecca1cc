package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for the training-data pipeline: exact
 * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
 * SimHash, and n-gram Jaccard.
 *
 * Cross-engine determinism: every hash is md5-hex (identical in Spark
 * and DuckDB), minhash components are fixed-width lowercase hex strings
 * (lexicographic min == numeric min), and shingling is defined over the
 * same `\s+` split in both engines — so each operator carries an exact
 * SQL oracle.
 *
 * Scale notes: exact dedup is one shuffle on the content hash; MinHash
 * signatures are embarrassingly parallel map-side work; the LSH
 * candidate join shuffles on (band, bucket) — tiny keys — and the
 * exact-Jaccard verification joins shingle sets back only for candidate
 * pairs (never all-pairs). At 100 TB the 32 per-shingle md5 passes would
 * be fused into one custom expression; the composed form is the
 * semantic baseline.
 */
object Dedup {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4 // Bands * RowsPerBand == NumHashes

  // ---------- exact dedup ----------

  /** Exact dedup on normalized (lowercased, whitespace-collapsed) text:
    * canonical keeper = min doc_id per content hash. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet").selectExpr(
      "md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))) AS content_hash",
      "doc_id")
      .groupBy("content_hash")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_dups"))

  val exactOracle: String =
    """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
      |  min(doc_id) AS keep_doc_id, count(*) AS n_dups
      |FROM documents GROUP BY 1""".stripMargin

  // ---------- shingles + minhash ----------

  /** doc_id + distinct 3-word shingle set (docs with >= 3 tokens). */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "split(text, '\\\\s+') AS t")
      .filter("size(t) >= 3")
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(0, size(t)-3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS sh")

  private val shingledCte: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
      |), shingled AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM toks WHERE len(t) >= 3
      |)""".stripMargin

  /** The NumHashes hash family is derived from EIGHT md5 digests per
    * shingle (8 x 32 = 256 hex chars), sliced into 32 8-hex (32-bit)
    * windows — 8 hashes per shingle instead of 32, identical in both
    * engines; fixed-width lowercase hex keeps lexicographic min ==
    * numeric min. (32 windows x 8 hex NEED 256 chars: slicing past the
    * digest end silently yields '' and every band collides.) */
  private val hhSpark: String = {
    val digests = (0 until 8).map {
      case 0 => "md5(s)"
      case i => s"md5(concat('$i', s))"
    }.mkString(", ")
    s"transform(sh, s -> concat($digests)) AS hh"
  }
  private val hhSql: String = {
    val digests = (0 until 8).map {
      case 0 => "md5(s)"
      case i => s"md5('$i' || s)"
    }.mkString(" || ")
    s"list_transform(sh, s -> $digests) AS hh"
  }
  private def mhExprSpark(j: Int): String =
    s"array_min(transform(hh, h -> substr(h, ${j * 8 + 1}, 8)))"
  private def mhExprSql(j: Int): String =
    s"list_min(list_transform(hh, h -> substr(h, ${j * 8 + 1}, 8)))"

  /** Per-doc MinHash signature (NumHashes md5-derived components),
    * emitted as one comma-joined string for oracle comparability. */
  def minhashSig(spark: SparkSession, dir: String): DataFrame = {
    val mh = (0 until NumHashes).map(j => s"${mhExprSpark(j)} AS mh$j")
    shingled(spark, dir)
      .selectExpr("doc_id", hhSpark)
      .selectExpr(Seq("doc_id") ++ mh: _*)
      .selectExpr("doc_id",
        s"concat_ws(',', ${(0 until NumHashes).map(j => s"mh$j").mkString(", ")}) AS sig")
  }

  val minhashSigOracle: String = {
    val mh = (0 until NumHashes).map(j => s"${mhExprSql(j)} AS mh$j").mkString(",\n    ")
    s"""$shingledCte,
       |hashed AS (SELECT doc_id, $hhSql FROM shingled),
       |sigs AS (SELECT doc_id,
       |    $mh
       |  FROM hashed)
       |SELECT doc_id,
       |  ${(0 until NumHashes).map(j => s"mh$j").mkString(" || ',' || ")} AS sig
       |FROM sigs""".stripMargin
  }

  // ---------- LSH candidate pairs + exact Jaccard verification ----------

  /** LSH: band each signature (Bands x RowsPerBand), bucket-join within
    * (band, bucket), verify candidates with exact Jaccard over distinct
    * shingle sets. Output: all candidate pairs with their true Jaccard. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir).cache()
    val mh = (0 until NumHashes).map(j => s"${mhExprSpark(j)} AS mh$j")
    val sigs = sh.selectExpr("doc_id", hhSpark).selectExpr(Seq("doc_id") ++ mh: _*)
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}").mkString(", ")
      s"struct($b AS band, md5(concat($cols)) AS bucket)"
    }.mkString(", ")
    val banded = sigs
      .selectExpr("doc_id", s"explode(array($bandStructs)) AS bb")
      .selectExpr("doc_id", "bb.band AS band", "bb.bucket AS bucket")
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    pairs
      .join(sh.selectExpr("doc_id AS a_id", "sh AS sha"), "a_id")
      .join(sh.selectExpr("doc_id AS b_id", "sh AS shb"), "b_id")
      .selectExpr("a_id", "b_id",
        "round(size(array_intersect(sha, shb)) / CAST(size(array_union(sha, shb)) AS DOUBLE), 6) AS jaccard")
  }

  val minhashPairsOracle: String = {
    val mh = (0 until NumHashes).map(j => s"${mhExprSql(j)} AS mh$j").mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cols) AS bucket FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""$shingledCte,
       |hashed AS (SELECT doc_id, $hhSql FROM shingled),
       |sigs AS (SELECT doc_id,
       |    $mh
       |  FROM hashed),
       |banded AS (
       |  $bandSelects
       |),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |)
       |SELECT p.a_id, p.b_id,
       |  round(len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
       |FROM pairs p
       |JOIN shingled a ON a.doc_id = p.a_id
       |JOIN shingled b ON b.doc_id = p.b_id""".stripMargin
  }

  // ---------- n-gram Jaccard (adjacent-doc probe: always non-empty) ----------

  def jaccardAdjacent(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
    sh.selectExpr("doc_id AS a_id", "sh AS sha")
      .join(sh.selectExpr("doc_id - 1 AS a_id", "doc_id AS b_id", "sh AS shb"), "a_id")
      .selectExpr("a_id", "b_id",
        "round(size(array_intersect(sha, shb)) / CAST(size(array_union(sha, shb)) AS DOUBLE), 6) AS jaccard")
  }

  val jaccardAdjacentOracle: String =
    s"""$shingledCte
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  round(len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
       |FROM shingled a JOIN shingled b ON b.doc_id = a.doc_id + 1""".stripMargin

  // ---------- SimHash (16-bit, md5-derived token hashes) ----------

  private val SimBits = 16

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val bitSums = (0 until SimBits).map { j =>
      s"aggregate(hs, 0, (acc, h) -> acc + CASE WHEN (h div ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
    }
    val simhash = (0 until SimBits)
      .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "split(text, '\\\\s+') AS t")
      .selectExpr("doc_id",
        "transform(t, tok -> CAST(conv(substr(md5(tok), 1, 4), 16, 10) AS INT)) AS hs")
      .selectExpr(Seq("doc_id") ++ bitSums: _*)
      .selectExpr("doc_id", s"CAST($simhash AS INT) AS simhash")
  }

  val simhashOracle: String = {
    val bitSums = (0 until SimBits).map { j =>
      s"list_reduce(list_transform(hs, h -> CASE WHEN (h // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END), (a, b) -> a + b) AS s$j"
    }.mkString(",\n    ")
    val simhash = (0 until SimBits)
      .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    list_transform(regexp_split_to_array(text, '\\s+'), tok -> ('0x' || substr(md5(tok), 1, 4))::INT) AS hs
       |  FROM documents
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hashed
       |)
       |SELECT doc_id, CAST($simhash AS INT) AS simhash FROM bits""".stripMargin
  }
}

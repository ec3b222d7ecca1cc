package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.MinHashSig

/**
 * Deduplication operators for the training-data pipeline: exact
 * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
 * SimHash, and n-gram Jaccard.
 *
 * Cross-engine determinism: every hash is md5-hex (identical in Spark
 * and DuckDB), minhash components are fixed-width lowercase hex strings
 * (lexicographic min == numeric min), and shingling is defined over the
 * same `\s+` split in both engines — so each operator carries an exact
 * SQL oracle. The Spark side computes signatures with the fused
 * [[graft.functions.MinHashSig]] expression (one pass, 32 u32 minima in
 * registers); the oracle keeps the composed md5/substr form — both are
 * the same function, proven by the oracle gate and OperatorsSpec.
 *
 * Scale notes: exact dedup is one shuffle on the content hash; MinHash
 * signatures are embarrassingly parallel map-side work; the LSH
 * candidate join shuffles on (band, bucket) — tiny keys. Two guards keep
 * the candidate join from going quadratic at 100 TB:
 *  - exact-duplicate texts collapse to one representative (min doc_id)
 *    BEFORE banding — identical texts share every bucket and are already
 *    reported by the exact stage;
 *  - buckets larger than [[DefaultBucketCap]] (boilerplate/templated
 *    text) are dropped from candidate generation, bounding the pair
 *    count per bucket at cap²/2. Production would log the dropped
 *    buckets' sizes for recall accounting.
 */
object Dedup {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4 // Bands * RowsPerBand == NumHashes

  /** Max candidate-bucket size admitted to the LSH pair join. */
  val DefaultBucketCap = 64

  // ---------- exact dedup ----------

  /** Exact dedup on normalized (lowercased, whitespace-collapsed) text:
    * canonical keeper = min doc_id per content hash. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Inputs.documents(spark, dir).selectExpr(
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
  private def shingledOver(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", "split(text, '\\\\s+') AS t")
      .filter("size(t) >= 3")
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(0, size(t)-3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))) AS sh")

  private def shingled(spark: SparkSession, dir: String): DataFrame =
    shingledOver(Inputs.documents(spark, dir))

  /** Oracle-side shingling from a named source relation. */
  private def shingledCteFrom(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM $src
       |), shingled AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
       |  FROM toks WHERE len(t) >= 3
       |)""".stripMargin

  private val shingledCte: String = "WITH " + shingledCteFrom("documents")

  /** The NumHashes hash family is derived from EIGHT md5 digests per
    * shingle (8 x 32 = 256 hex chars), sliced into 32 8-hex (32-bit)
    * windows — 8 hashes per shingle instead of 32, identical in both
    * engines; fixed-width lowercase hex keeps lexicographic min ==
    * numeric min. (32 windows x 8 hex NEED 256 chars: slicing past the
    * digest end silently yields '' and every band collides.) The oracle
    * keeps this composed form; Spark runs the fused expression. */
  private val hhSql: String = {
    val digests = (0 until 8).map {
      case 0 => "md5(s)"
      case i => s"md5('$i' || s)"
    }.mkString(" || ")
    s"list_transform(sh, s -> $digests) AS hh"
  }
  private def mhExprSql(j: Int): String =
    s"list_min(list_transform(hh, h -> substr(h, ${j * 8 + 1}, 8)))"

  /** doc_id + the 32-component signature array (fused expression). */
  private def sigArr(docs: DataFrame): DataFrame =
    shingledOver(docs).select(col("doc_id"), MinHashSig(col("sh")).as("mh"))

  /** Per-doc MinHash signature (NumHashes md5-derived components),
    * emitted as one comma-joined string for oracle comparability. */
  def minhashSig(spark: SparkSession, dir: String): DataFrame =
    sigArr(Inputs.documents(spark, dir))
      .selectExpr("doc_id", "array_join(mh, ',') AS sig")

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

  /** Exact-duplicate representatives: identical normalized text collapses
    * to its min doc_id. One shuffle on the content hash; keeps identical
    * texts (which share EVERY band bucket) out of the pair join. */
  private def representatives(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", "text",
        "md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))) AS content_hash")
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("content_hash")))
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id", "text")

  /** LSH: band each signature (Bands x RowsPerBand), bucket-join within
    * (band, bucket), verify candidates with exact Jaccard over distinct
    * shingle sets. Output: candidate pairs (among exact-dup
    * representatives, from buckets <= cap) with their true Jaccard. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    minhashPairsOver(Inputs.documents(spark, dir))

  /** (doc_id, band, bucket) — each representative's Bands LSH bucket
    * keys, exploded map-side. */
  private def bandedOf(sh: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand)
        .map(r => s"element_at(mh, ${b * RowsPerBand + r + 1})").mkString(", ")
      s"struct($b AS band, md5(concat($cols)) AS bucket)"
    }.mkString(", ")
    sh.select(col("doc_id"), MinHashSig(col("sh")).as("mh"))
      .selectExpr("doc_id", s"explode(array($bandStructs)) AS bb")
      .selectExpr("doc_id", "bb.band AS band", "bb.bucket AS bucket")
  }

  /** Distinct LSH candidate pairs among exact-dup representatives, with
    * the bucket cap applied — shared by the Jaccard-verified pair query
    * and the duplicate-cluster assignment. `sh` is the (cached) shingle
    * frame the caller may reuse for verification. When `obs` is given,
    * the cap's recall cost rides the same pass as an observation
    * (dropped_buckets / dropped_rows / max_bucket) — at 100 TB the cap
    * is a recall knob, and a knob nobody can audit is a silent one. */
  private def candidatePairs(sh: DataFrame, cap: Int,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // bucket-size cap: one boilerplate bucket of n docs would emit
    // n²/2 pairs; the window count shares the (band, bucket) shuffle
    val sized = bandedOf(sh)
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bucket")))
    // the recall audit runs as its own action over the cached shingles:
    // a CollectMetrics node INSIDE the self-joined plan is silently lost
    // when AQE reuses the exchange for both join sides (probed on 4.1.2)
    obs.foreach { o =>
      sized.observe(o,
        sum(when(col("bsz") > cap, 1L).otherwise(0L)).as("dropped_rows"),
        max(col("bsz")).as("max_bucket")).count()
    }
    val banded = sized.filter(col("bsz") <= cap).drop("bsz")
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** Oracle-checked recall-accounting twin for the bucket cap: how many
    * (band, bucket) cells the cap drops, how many banded rows they held,
    * and the largest cell — the numbers a production run logs per batch
    * to bound what LSH recall the cap cost. One aggregation over the
    * same banded frame the pair join reads. */
  def lshDroppedStats(spark: SparkSession, dir: String): DataFrame =
    lshDroppedStatsOver(Inputs.documents(spark, dir))

  def lshDroppedStatsOver(docs: DataFrame, cap: Int = DefaultBucketCap): DataFrame =
    bandedOf(shingledOver(representatives(docs)))
      .groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .agg(
        sum(when(col("n") > cap, 1L).otherwise(0L)).as("dropped_buckets"),
        sum(when(col("n") > cap, col("n")).otherwise(0L)).as("dropped_rows"),
        max(col("n")).as("max_bucket"))

  def lshDroppedStatsOracle(cap: Int = DefaultBucketCap): String =
    s"""WITH ${pairsCteChain(cap)},
       |bs AS (SELECT band, bucket, count(*) AS n FROM banded GROUP BY 1, 2)
       |SELECT
       |  CAST(coalesce(sum(CASE WHEN n > $cap THEN 1 ELSE 0 END), 0) AS BIGINT) AS dropped_buckets,
       |  CAST(coalesce(sum(CASE WHEN n > $cap THEN n ELSE 0 END), 0) AS BIGINT) AS dropped_rows,
       |  CAST(max(n) AS BIGINT) AS max_bucket
       |FROM bs""".stripMargin

  def minhashPairsOver(docs: DataFrame, cap: Int = DefaultBucketCap,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val sh = shingledOver(representatives(docs)).cache()
    // materialize the (small) verified pair set eagerly so the shingle
    // cache can be released here — repeated invocations (bench loops,
    // warm probes) must not accumulate cached partitions until eviction
    val pre = candidatePairs(sh, cap, obs)
      .join(sh.selectExpr("doc_id AS a_id", "sh AS sha"), "a_id")
      .join(sh.selectExpr("doc_id AS b_id", "sh AS shb"), "b_id")
      .selectExpr("a_id", "b_id",
        "round(size(array_intersect(sha, shb)) / CAST(size(array_union(sha, shb)) AS DOUBLE), 6) AS jaccard")
    val out = pre.localCheckpoint()
    sh.unpersist()
    out
  }

  def minhashPairsOracle: String = minhashPairsOracleWith(DefaultBucketCap)

  /** CTE chain reps → shingled → … → pairs (shared by the pair query and
    * the cluster query; emitted WITHOUT the leading WITH keyword). */
  private def pairsCteChain(cap: Int): String = {
    val mh = (0 until NumHashes).map(j => s"${mhExprSql(j)} AS mh$j").mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cols) AS bucket FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""reps AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      min(doc_id) OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS keep_id
       |    FROM documents)
       |  WHERE doc_id = keep_id
       |),
       |${shingledCteFrom("reps")},
       |hashed AS (SELECT doc_id, $hhSql FROM shingled),
       |sigs AS (SELECT doc_id,
       |    $mh
       |  FROM hashed),
       |banded AS (
       |  $bandSelects
       |),
       |capped AS (
       |  SELECT doc_id, band, bucket FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM banded)
       |  WHERE bsz <= $cap
       |),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |)""".stripMargin
  }

  def minhashPairsOracleWith(cap: Int): String =
    s"""WITH ${pairsCteChain(cap)}
       |SELECT p.a_id, p.b_id,
       |  round(len(list_intersect(a.sh, b.sh)) / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
       |FROM pairs p
       |JOIN shingled a ON a.doc_id = p.a_id
       |JOIN shingled b ON b.doc_id = p.b_id""".stripMargin

  // ---------- duplicate clusters (connected components over candidates) ----------

  /** Duplicate-cluster assignment: connected components over the LSH
    * candidate-pair graph, each doc labeled with the min doc_id of its
    * component — the step that turns pairwise near-dup hits into
    * keep-one-per-cluster decisions. The query runs the
    * large-star/small-star contraction ([[dupClustersBigStarOver]],
    * Kiveris'14): O(log n) rounds on ANY graph shape, including the
    * long duplicate chains that make min-label propagation
    * (diameter-bounded, kept in [[dupClustersOver]] and
    * equivalence-tested) degenerate at web scale. */
  def dupClusters(spark: SparkSession, dir: String): DataFrame =
    dupClustersBigStarOver(Inputs.documents(spark, dir))._1

  /** Large-star/small-star contraction over the candidate-pair graph.
    * Edges are kept canonical (src > dst); per round, large-star hangs
    * every larger neighbor off each vertex's min neighbor, small-star
    * hangs the smaller ones — each round is two (shuffle + aggregate)
    * passes and the edge set contracts toward a star per component in
    * O(log n) rounds regardless of diameter (OperatorsSpec pins a
    * 64-link chain at ≤ 8 rounds where label-prop needs 64). Returns
    * (labels, rounds). */
  def dupClustersBigStarOver(docs: DataFrame,
      cap: Int = DefaultBucketCap): (DataFrame, Int) = {
    val sh = shingledOver(representatives(docs)).cache()
    // connectedComponents materializes the pair list on entry (while the
    // shingle cache is still live); a second caller-side checkpoint here
    // would just copy the same rows again
    val pairs = candidatePairs(sh, cap)
    val out = connectedComponents(pairs)
    sh.unpersist()
    out
  }

  /** Large-star/small-star core over a (a_id, b_id) pair list: labels
    * every participating node with its component min in O(log n)
    * rounds. Exposed for adversarial graph tests. */
  def connectedComponents(pairs: DataFrame): (DataFrame, Int) = {
    // materialize the (tiny) pair list ONCE: `nodes` and the canonical
    // edge set both read it, and for callers that hand in a LAZY pair
    // frame (embedDupClusters' banded self-join) each reference would
    // otherwise re-derive the whole candidate generator. nodes itself
    // stays lazy — it is only consumed by the final labels join, so an
    // upfront checkpoint job bought nothing.
    val p = pairs.localCheckpoint()
    val nodes = p.select(col("a_id").as("doc_id"))
      .unionAll(p.select(col("b_id").as("doc_id"))).distinct()
    // canonical src > dst
    var edges = p
      .select(greatest(col("a_id"), col("b_id")).as("src"),
        least(col("a_id"), col("b_id")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      val w = Window.partitionBy("src")
      sym.withColumn("m", least(min(col("dst")).over(w), col("src")))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val w = Window.partitionBy("src")
      val withMin = e.withColumn("m", min(col("dst")).over(w))
      withMin.filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionAll(withMin.select(col("src"), col("m").as("dst")))
        .distinct()
    }
    var rounds = 0
    var converged = false
    var edgeCount = edges.count()
    while (!converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      rounds += 1
      val nextCount = next.count()
      // exact convergence: same edge set (both sides are distinct, so
      // equal counts + empty difference <=> equal sets); the expensive
      // exceptAll only runs on rounds where the count stabilized
      converged = nextCount == edgeCount && next.exceptAll(edges).isEmpty
      edges = next
      edgeCount = nextCount
    }
    // converged edge set is (node → component min) for every non-root;
    // roots label themselves
    val labels = nodes.join(edges, nodes("doc_id") === edges("src"), "left")
      .select(col("doc_id"), coalesce(col("dst"), col("doc_id")).as("cluster_id"))
    (labels, rounds)
  }

  /** Min-label propagation baseline (rounds = component diameter). */
  def dupClustersOver(docs: DataFrame, cap: Int = DefaultBucketCap): DataFrame = {
    val sh = shingledOver(representatives(docs)).cache()
    // localCheckpoint (not cache) on the loop state: each round's plan
    // would otherwise embed every previous round's plan, and Catalyst
    // re-analysis cost grows with the round count — lineage truncation
    // keeps per-round cost constant (the standard iterative-algorithm
    // shape; GraphX does the same)
    val pairs = candidatePairs(sh, cap).localCheckpoint()
    sh.unpersist() // pairs are materialized; the shingle cache is done
    val sym = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionAll(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
    var labels = sym.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym.join(labels, sym("dst") === labels("doc_id"))
        .groupBy(col("src")).agg(min("cluster_id").as("nbr_min"))
      val updated = labels.join(nbrMin, labels("doc_id") === nbrMin("src"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint()
      changed = updated.as("u")
        .join(labels.withColumnRenamed("cluster_id", "old").as("l"), "doc_id")
        .filter(col("cluster_id") =!= col("old")).count()
      labels = updated
    }
    labels
  }

  /** Oracle: transitive closure via a recursive CTE over the same
    * candidate pairs; cluster_id = min reachable doc_id (incl. self). */
  def dupClustersOracle(cap: Int = DefaultBucketCap): String =
    s"""WITH RECURSIVE ${pairsCteChain(cap)},
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION
       |  SELECT b_id AS src, a_id AS dst FROM pairs
       |),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
       |)
       |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |FROM reach GROUP BY src""".stripMargin

  // ---------- end-to-end keep-list (the training-pipeline decision) ----------

  /** The per-document dedup DECISION a training-data pipeline consumes:
    * exact duplicates collapse to their min-doc_id representative, the
    * representatives' LSH candidate graph collapses to connected
    * components (big-star), and each doc gets (keep, reason,
    * canonical_id) — keep iff the doc IS its exact representative and
    * that representative IS its cluster's min. `canonical_id` is the
    * ultimate keeper a dropped doc duplicates.
    *
    * Scale shape: one window shuffle on content_hash (exact layer), the
    * O(log n) contraction over the (small) pair graph, and one
    * corpus-sized equi-join of the per-doc hash frame against the
    * cluster labels — no step touches all-pairs. */
  def keepList(spark: SparkSession, dir: String): DataFrame =
    keepListOver(Inputs.documents(spark, dir))

  def keepListOver(docs: DataFrame, cap: Int = DefaultBucketCap): DataFrame = {
    val hashes = docs
      .selectExpr("doc_id",
        "md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))) AS content_hash")
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("content_hash")))
      .select("doc_id", "keep_id")
    val labels = dupClustersBigStarOver(docs, cap)._1
      .withColumnRenamed("doc_id", "rep_id")
    hashes.join(labels, hashes("keep_id") === labels("rep_id"), "left")
      .withColumn("canonical_id", coalesce(col("cluster_id"), col("keep_id")))
      .selectExpr("doc_id",
        "doc_id = keep_id AND canonical_id = keep_id AS keep",
        "CASE WHEN doc_id <> keep_id THEN 'exact_dup' WHEN canonical_id <> keep_id THEN 'near_dup' ELSE 'keep' END AS reason",
        "canonical_id")
  }

  def keepListOracle(cap: Int = DefaultBucketCap): String =
    s"""WITH RECURSIVE ${pairsCteChain(cap)},
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION
       |  SELECT b_id AS src, a_id AS dst FROM pairs
       |),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
       |),
       |labels AS (
       |  SELECT src AS rep_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src
       |),
       |hashes AS (
       |  SELECT doc_id,
       |    min(doc_id) OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS keep_id
       |  FROM documents
       |)
       |SELECT h.doc_id,
       |  (h.doc_id = h.keep_id AND coalesce(l.cluster_id, h.keep_id) = h.keep_id) AS keep,
       |  CASE WHEN h.doc_id <> h.keep_id THEN 'exact_dup'
       |       WHEN coalesce(l.cluster_id, h.keep_id) <> h.keep_id THEN 'near_dup'
       |       ELSE 'keep' END AS reason,
       |  coalesce(l.cluster_id, h.keep_id) AS canonical_id
       |FROM hashes h LEFT JOIN labels l ON l.rep_id = h.keep_id""".stripMargin

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

  // ---------- SimHash near-dup pairs (32-bit + Hamming-band join) ----------

  val Sim2Bits = 32
  val Sim2Bands = 4 // 8 bits per band
  val Sim2MaxHamming = 3

  /** 32-bit SimHash per doc (md5-derived 32-bit token hashes), via the
    * fused [[graft.functions.SimHash]] expression (oracle keeps the
    * composed per-bit aggregate form). */
  private def simhash32(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Inputs.documents(spark, dir)
      .selectExpr("doc_id", "split(text, '\\\\s+') AS t")
      .select(col("doc_id"),
        graft.functions.SimHash(col("t"), hexLen = Sim2Bits / 4).as("sim"))
  }

  /** SimHash near-duplicate pairs, production shape: band each 32-bit
    * fingerprint into 4 8-bit chunks, candidate-join on (band, chunk),
    * verify with the true Hamming distance ≤ [[Sim2MaxHamming]]. With
    * threshold = bands - 1 the pigeonhole guarantee is EXACT: any pair
    * within distance 3 must agree on ≥ 1 of the 4 chunks, so banding
    * loses nothing — the standard SimHash table design (Charikar'02 /
    * Manku'07 shape; at 64-bit production width the same code runs with
    * 16-bit chunks, whose selectivity on vocabulary-correlated corpora
    * is far sharper than these demo-width 8-bit chunks). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val s = simhash32(spark, dir)
    val chunkBits = Sim2Bits / Sim2Bands
    val bandStructs = (0 until Sim2Bands).map { b =>
      s"struct($b AS band, shiftright(sim, ${b * chunkBits}) & ${(1 << chunkBits) - 1} AS chunk)"
    }.mkString(", ")
    val banded = s
      .selectExpr("doc_id", "sim", s"explode(array($bandStructs)) AS bb")
      .selectExpr("doc_id", "sim", "bb.band AS band", "bb.chunk AS chunk")
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .selectExpr("x.doc_id AS a_id", "y.doc_id AS b_id",
        "x.sim AS sima", "y.sim AS simb")
      .distinct()
      .selectExpr("a_id", "b_id",
        "CAST(bit_count(sima ^ simb) AS INT) AS hamming")
      .filter(s"hamming <= $Sim2MaxHamming")
  }

  val simhashPairsOracle: String = {
    val bitSums = (0 until Sim2Bits).map { j =>
      s"list_reduce(list_transform(hs, h -> CASE WHEN (h // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END), (a, b) -> a + b) AS s$j"
    }.mkString(",\n    ")
    val sim = (0 until Sim2Bits)
      .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    val chunkBits = Sim2Bits / Sim2Bands
    val bandSelects = (0 until Sim2Bands).map { b =>
      s"SELECT doc_id, sim, $b AS band, (sim >> ${b * chunkBits}) & ${(1 << chunkBits) - 1} AS chunk FROM sims"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    list_transform(regexp_split_to_array(text, '\\s+'), tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT) AS hs
       |  FROM documents
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hashed
       |), sims AS (
       |  SELECT doc_id, CAST($sim AS BIGINT) AS sim FROM bits
       |), banded AS (
       |  $bandSelects
       |), pairs AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id, x.sim AS sima, y.sim AS simb
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
       |)
       |SELECT a_id, b_id, CAST(bit_count(xor(sima, simb)) AS INT) AS hamming
       |FROM pairs WHERE bit_count(xor(sima, simb)) <= $Sim2MaxHamming""".stripMargin
  }

  // ---------- SimHash at production width (64-bit, 4 x 16-bit bands) ----------

  val Sim64Bits = 64
  val Sim64Bands = 4 // 16 bits per band — the Manku'07 corpus-scale setting
  val Sim64MaxHamming = 3

  /** SimHash near-duplicate pairs at the 64-bit production width the
    * 32-bit [[simhashPairs]] demo parameterizes: 4 bands of 16 bits,
    * candidate-join on (band, chunk), exact-Hamming verify at distance
    * ≤ [[Sim64MaxHamming]]. Pigeonhole exactness is unchanged: any pair
    * within distance 3 differs in at most 3 of the 4 chunks, so it
    * agrees on ≥ 1 and banding loses nothing. The 16-bit chunks are the
    * selectivity that matters at corpus scale — expected random
    * collisions per band fall 2^-16, so bucket mass stays tiny even on
    * vocabulary-correlated corpora. The sign bit (bit 63) makes `sim`
    * negative for half of all docs; band extraction masks after the
    * arithmetic shift, and Hamming is computed on the raw xor, so
    * signedness never changes a result (the oracle avoids signed-64
    * literals entirely by working in 16-bit chunks). */
  def simhashPairs64(spark: SparkSession, dir: String): DataFrame = {
    val s = Inputs.documents(spark, dir)
      .selectExpr("doc_id", "split(text, '\\\\s+') AS t")
      .select(col("doc_id"),
        graft.functions.SimHash(col("t"), hexLen = Sim64Bits / 4).as("sim"))
    val chunkBits = Sim64Bits / Sim64Bands
    val mask = (1L << chunkBits) - 1
    val bandStructs = (0 until Sim64Bands).map { b =>
      s"struct($b AS band, shiftright(sim, ${b * chunkBits}) & $mask AS chunk)"
    }.mkString(", ")
    val banded = s
      .selectExpr("doc_id", "sim", s"explode(array($bandStructs)) AS bb")
      .selectExpr("doc_id", "sim", "bb.band AS band", "bb.chunk AS chunk")
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .selectExpr("x.doc_id AS a_id", "y.doc_id AS b_id",
        "x.sim AS sima", "y.sim AS simb")
      .distinct()
      .selectExpr("a_id", "b_id",
        "CAST(bit_count(sima ^ simb) AS INT) AS hamming")
      .filter(s"hamming <= $Sim64MaxHamming")
  }

  /** Oracle in unsigned-safe arithmetic: the 64-bit token hash is carried
    * as two 32-bit halves (hi = md5 hex chars 1-8, lo = chars 9-16 — the
    * same big-endian layout the fused expression reads), bit sums are per
    * half, and the fingerprint lives as four 16-bit chunks; Hamming =
    * Σ bit_count(xor(chunk_a, chunk_b)). */
  val simhashPairs64Oracle: String = {
    val chunkBits = Sim64Bits / Sim64Bands
    def half(j: Int) = if (j < 32) "lo" else "hi"
    def pow(j: Int) = 1L << (j % 32)
    val bitSums = (0 until Sim64Bits).map { j =>
      s"list_reduce(list_transform(${half(j)}, h -> CASE WHEN (h // ${pow(j)}) % 2 = 1 THEN 1 ELSE -1 END), (a, b) -> a + b) AS s$j"
    }.mkString(",\n    ")
    val chunks = (0 until Sim64Bands).map { b =>
      val v = (0 until chunkBits)
        .map(k => s"CASE WHEN s${b * chunkBits + k} > 0 THEN ${1L << k} ELSE 0 END")
        .mkString(" + ")
      s"CAST($v AS BIGINT) AS c$b"
    }.mkString(",\n    ")
    val bandSelects = (0 until Sim64Bands).map { b =>
      s"SELECT doc_id, c0, c1, c2, c3, $b AS band, c$b AS chunk FROM sims"
    }.mkString("\n  UNION ALL\n  ")
    val ham = (0 until Sim64Bands)
      .map(b => s"bit_count(xor(xc$b, yc$b))").mkString(" + ")
    val pairCols = (0 until Sim64Bands)
      .map(b => s"x.c$b AS xc$b, y.c$b AS yc$b").mkString(", ")
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    list_transform(regexp_split_to_array(text, '\\s+'), tok -> ('0x' || substr(md5(tok), 1, 8))::BIGINT) AS hi,
       |    list_transform(regexp_split_to_array(text, '\\s+'), tok -> ('0x' || substr(md5(tok), 9, 8))::BIGINT) AS lo
       |  FROM documents
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hashed
       |), sims AS (
       |  SELECT doc_id,
       |    $chunks
       |  FROM bits
       |), banded AS (
       |  $bandSelects
       |), pairs AS (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id, $pairCols
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
       |)
       |SELECT a_id, b_id, CAST($ham AS INT) AS hamming
       |FROM pairs WHERE $ham <= $Sim64MaxHamming""".stripMargin
  }

  // ---------- SimHash (16-bit, md5-derived token hashes) ----------

  private val SimBits = 16

  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Inputs.documents(spark, dir)
      .selectExpr("doc_id", "split(text, '\\\\s+') AS t")
      .select(col("doc_id"),
        graft.functions.SimHash(col("t"), hexLen = SimBits / 4)
          .cast("int").as("simhash"))
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

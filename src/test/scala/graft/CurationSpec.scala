package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Curation

/** Known-answer tests for the curation operators: 13-gram benchmark
  * decontamination (Brown'20 App.C), domain-mixture sampling to a
  * token budget, and concat-and-chunk sequence packing. Every expected
  * value below is hand-computed from the published definitions; the
  * sf-corpus oracles exercise the same chains end-to-end. */
class CurationSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def words(prefix: String, from: Int, n: Int): String =
    (from until from + n).map(i => s"$prefix$i").mkString(" ")

  test("decontaminate: overlap counts, eval self-overlap, short docs, case fold") {
    // doc 0 is eval (0 % 10 == 0): 20 tokens -> 8 distinct 13-grams.
    // doc 1 copies tokens 3..16 of doc 0 (14 tokens -> 2 grams, both in
    // the eval set). doc 2 is disjoint. doc 3 is too short for any gram.
    // doc 5 copies the same span UPPERCASED -> still contaminated
    // (grams are lowercased before hashing).
    val span = words("t", 3, 14)
    val out = Curation.decontaminateDocs(docs(
        (0L, words("t", 1, 20)),
        (1L, span),
        (2L, words("u", 1, 15)),
        (3L, "just five little tokens here"),
        (5L, span.toUpperCase)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("is_eval"), r.getAs[Int]("n_overlap"),
          r.getAs[Boolean]("contaminated")))).toMap
    out(0L) shouldBe ((true, 8, false))  // eval: trivial self-overlap
    out(1L) shouldBe ((false, 2, true))
    out(2L) shouldBe ((false, 0, false))
    out(3L) shouldBe ((false, 0, false))
    out(5L) shouldBe ((false, 2, true))
  }

  test("decontaminate against an EXTERNAL benchmark gram set (production side)") {
    import spark.implicits._
    // the benchmark file shares doc 1's span; the doc_id%10 split must
    // be ignored entirely (doc 0 is NOT eval when the eval side is
    // external), and only the span-sharing doc is contaminated
    val span = words("t", 3, 14)
    val bench = Seq(s"prefix words $span suffix").toDF("text")
    val out = Curation.decontaminateDocs(docs(
        (0L, words("x", 1, 20)),
        (1L, span),
        (2L, words("u", 1, 15))),
        extEvalGrams = Some(Curation.evalGramsOf(bench)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("is_eval"), r.getAs[Boolean]("contaminated")))).toMap
    out(0L) shouldBe ((false, false)) // %10==0 yet not eval: external set rules
    out(1L) shouldBe ((false, true))
    out(2L) shouldBe ((false, false))
  }

  test("seq pack at a NON-DEFAULT shard count: sharding + per-shard token conservation") {
    val in = docs((0L, words("a", 1, 500)), (1L, words("b", 1, 20)),
      (2L, words("c", 1, 600)), (3L, words("d", 1, 10)),
      (4L, words("e", 1, 7)), (5L, words("f", 1, 99)))
    val out = Curation.seqPackDocs(in, shards = 3).collect()
    // shard key follows the requested modulus
    out.foreach(r => r.getAs[Int]("shard") shouldBe
      (r.getAs[Long]("doc_id") % 3).toInt)
    // conservation: each shard's final cumulative offset equals the sum
    // of its docs' token counts (nothing padded or dropped)
    out.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      rows.map(_.getAs[Long]("cum_tok")).max shouldBe
        rows.map(_.getAs[Int]("n_tok").toLong).sum
    }
  }

  test("staged capstone hash-equals the proof-shape pipeline (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val stage = java.nio.file.Files.createTempDirectory("graft_curate_stage").toString
    val staged = Curation.curatePipelineStaged(spark, dir, stage)
    val proof = Curation.curatePipeline(spark, dir)
    staged.schema.map(f => (f.name, f.dataType)) shouldBe
      proof.schema.map(f => (f.name, f.dataType))
    staged.exceptAll(proof).count() shouldBe 0L
    proof.exceptAll(staged).count() shouldBe 0L
    // the resume points exist: the 9 filter legs AND the surviving corpus
    spark.read.parquet(s"$stage/legs/keeplist").count() shouldBe 500L
    spark.read.parquet(s"$stage/kept").count() should be >= 1L
  }

  test("mix sample: hand-computed rates, cap at 1.0, deterministic keeps") {
    import spark.implicits._
    // src0: 100 tokens (w=25), other: 100 (w=3), rare: 4 (w=3).
    // total=204, budget=102, w_sum=31:
    //   rate(src0)  = 25*102/(31*100) = 0.822581 (round 6)
    //   rate(other) =  3*102/(31*100) = 0.098710
    //   rate(rare)  = min(1, 3*102/(31*4)) = 1.0 (capped)
    val base = Seq(
      (0L, "src0", words("a", 1, 60)),
      (1L, "src0", words("b", 1, 40)),
      (2L, "other", words("c", 1, 100)),
      (3L, "rare", words("d", 1, 4))).toDF("doc_id", "source", "text")
    val out = Curation.mixSampleDocs(base).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(0L).getAs[Double]("rate") shouldBe 0.822581 +- 1e-9
    out(2L).getAs[Double]("rate") shouldBe 0.09871 +- 1e-9
    out(3L).getAs[Double]("rate") shouldBe 1.0
    out(3L).getAs[Boolean]("keep") shouldBe true // rate 1.0 keeps everything
    out(0L).getAs[Long]("src_toks") shouldBe 100L
    // md5-uniform decision is a pure function of doc_id — rerun agrees
    val again = Curation.mixSampleDocs(base).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    out.map { case (k, r) => k -> r.getAs[Boolean]("keep") } shouldBe again
  }

  test("seq pack: offsets, boundary-spanning docs, per-shard independence") {
    // shard 0 (ids 0,16,32): n_tok 500,20,600 -> cum 500,520,1120.
    //   id 0: starts seq 0 offset 0, ends at 499 -> 1 seq
    //   id 16: starts seq 0 offset 500, ends at 519 -> spans 2 seqs
    //   id 32: starts seq 1 offset 8, ends at 1119 -> spans 2 seqs
    // shard 1 (id 1): independent stream, offset 0.
    val out = Curation.seqPackDocs(docs(
        (0L, words("a", 1, 500)),
        (16L, words("b", 1, 20)),
        (32L, words("c", 1, 600)),
        (1L, words("d", 1, 10))))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("shard"), r.getAs[Long]("cum_tok"),
          r.getAs[Long]("seq_id"), r.getAs[Int]("seq_offset"),
          r.getAs[Int]("n_seqs")))).toMap
    out(0L) shouldBe ((0, 500L, 0L, 0, 1))
    out(16L) shouldBe ((0, 520L, 0L, 500, 2))
    out(32L) shouldBe ((0, 1120L, 1L, 8, 2))
    out(1L) shouldBe ((1, 10L, 0L, 0, 1))
  }

  test("sf0.001 mix audit: realized fractions bounded, caps visible") {
    val rows = Curation.mixAudit(spark, "/root/testdata/sf0.001").collect()
    rows.foreach { r =>
      r.getAs[Long]("kept_toks") should be <= r.getAs[Long]("src_toks")
      r.getAs[Double]("realized_frac") should (be >= 0.0 and be <= 1.0)
    }
    // head sources (src0/src1) are rate-capped at 1.0 on this corpus
    val capped = rows.filter(_.getAs[Double]("rate") == 1.0)
    capped.map(_.getAs[String]("source")).toSet should contain allOf ("src0", "src1")
    // a capped source keeps everything
    capped.foreach(r =>
      r.getAs[Long]("kept_toks") shouldBe r.getAs[Long]("src_toks"))
  }

  test("sf0.001 curate pipeline: survivors only, all invariants hold") {
    val dir = "/root/testdata/sf0.001"
    val out = Curation.curatePipeline(spark, dir).collect()
    out.length should be >= 1
    // only train_keep AND mix-keep docs may appear
    val kept = graft.operators.TrainFilter.trainFilter(spark, dir)
      .filter("train_keep").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    out.map(_.getAs[Long]("doc_id")).toSet.subsetOf(kept) shouldBe true
    out.length should be < kept.size // the mix stage genuinely samples
    all(out.map(_.getAs[Int]("seq_offset"))) should
      (be >= 0 and be < Curation.SeqLen)
  }

  test("sf0.001 smoke: contamination fires, rates sane, packing invariants") {
    val dir = "/root/testdata/sf0.001"
    val dec = Curation.decontaminate(spark, dir)
    dec.filter("contaminated").count() should be >= 1L
    dec.filter("is_eval AND contaminated").count() shouldBe 0L

    val mix = Curation.mixSample(spark, dir).collect()
    all(mix.map(_.getAs[Double]("rate"))) should (be > 0.0 and be <= 1.0)

    val pack = Curation.seqPack(spark, dir).collect()
    all(pack.map(_.getAs[Int]("seq_offset"))) should
      (be >= 0 and be < Curation.SeqLen)
    all(pack.map(_.getAs[Int]("n_seqs"))) should be >= 1
  }
}

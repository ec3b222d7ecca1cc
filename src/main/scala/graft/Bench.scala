package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Verdict
import graft.sources.Transcripts

/**
 * Bench harness (driver contract): prints ONE JSON line.
 *
 * Headline metric = turns/sec of the full keep-drop+scrub verdict
 * (clean → VADER → PII scan → keep → scrub) over a pre-materialized
 * synthetic transcript corpus (skewed conv sizes), forced through the
 * noop sink so every output column is computed, nothing collected.
 * Both scanner paths are measured: the built-in column chain and the
 * fused single-pass expression.
 *
 * Env knobs: SPARK_GRAFT_SF_DIR (queries input), SPARK_GRAFT_CPUS
 * (local[N] + shuffle partitions), SPARK_GRAFT_TURNS (corpus size,
 * default 2M). Run at CPUS=8 and CPUS=32 on the same corpus for the
 * N-vs-4N scaling evidence (BENCH/BASELINE.md).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 4M default: round 2 showed a 1M-row corpus measures a half-warmed JVM
    // (the fused expression needs ~1M invocations before C2 compiles) and
    // the headline swung 4x run-to-run; 4M + untimed warmup passes below
    // makes the gate number reproduce the documented protocol
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_TURNS", "4000000").toLong
    val warmupPasses = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "2").toInt
    val timedPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // corpus: materialized once per (size), reused across CPU levels so
    // the scaling comparison reads identical bytes
    val corpus = s"${sys.props("java.io.tmpdir")}/graft_bench_${nTurns}.parquet"
    if (!new java.io.File(corpus).exists()) {
      Transcripts.generate(spark, nTurns, nConvs = math.max(1L, nTurns / 50),
          skewPct = 5, numPartitions = 128)
        .write.mode("overwrite").parquet(corpus)
    }
    val turns = spark.read.parquet(corpus)

    // JIT warmup needs FULL passes (the expression-eval paths take ~1M
    // invocations before C2 compiles them; a cold pass runs 5-20x slower).
    // Round 2's plateau heuristic exited after 2-3 half-warm passes and
    // the headline didn't reproduce (171k vs the documented 711k) →
    // fixed protocol instead: `warmupPasses` UNTIMED full-corpus passes,
    // then best-of-`timedPasses`, with EVERY pass time emitted in the
    // JSON so a reader can see the plateau themselves.
    def measured(f: => Unit): (Double, Seq[Double]) = {
      val all = (0 until (warmupPasses + timedPasses)).map(_ => timed(f))
      (all.drop(warmupPasses).min, all)
    }
    val (tFused, passesFused) = measured(force(Verdict(turns, fused = true)))
    val (tChain, passesChain) = measured(force(Verdict(turns, fused = false)))
    val tps = nTurns / tFused
    val tpsChain = nTurns / tChain

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // scaling-evidence runs time only the keep-drop gate (the metric the
    // north rule scales); the full query sweep stays the default
    val skipQueries = sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1")
    val querySet =
      if (skipQueries) Map.empty[String, (SparkSession, String) => DataFrame]
      else SparkEntry.queries
    val results = querySet.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try timed(force(fn(spark, sfDir))) catch {
        case e: Throwable =>
          // a crashed query must be VISIBLE, never silently absent from the
          // headline: log it and carry an explicit errors field in the JSON
          System.err.println(s"[bench] $name FAILED: $e")
          e.printStackTrace()
          errors(name) = e.toString.take(200)
          -1.0
      }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + tFused
    def jarr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"turns":$nTurns,"keepdrop_sec_fused":$tFused,"keepdrop_sec_chain":$tChain,"turns_per_sec":$tps,"turns_per_sec_chain":$tpsChain,"warmup_passes":$warmupPasses,"timed_passes":$timedPasses,"passes_fused":${jarr(passesFused)},"passes_chain":${jarr(passesChain)},"errors":$errJson}"""
    println(line)
    // sbt decorates forked stdout with "[info] ", which broke the driver's
    // machine parse in round 1 (BENCH_r01 "parsed": null) → also write the
    // bare line to a file the driver/judge can read directly.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH/last_bench.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, line + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: $e") }
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}

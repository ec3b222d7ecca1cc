package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline.Verdict
import graft.sources.Transcripts
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val v = Verdict(Transcripts.generate(spark, 1000, 10), fused = true)
    val plan = v.queryExecution.executedPlan.toString
    println("[plan] pii_scan occurrences: " + "pii_scan".r.findAllIn(plan).length)
    println("[plan] vader occurrences: " + "vader".r.findAllIn(plan).length)
    val vc = Verdict(Transcripts.generate(spark, 1000, 10), fused = false)
    val planC = vc.queryExecution.executedPlan.toString
    println("[plan] chain regexp_extract_all occurrences: " + "regexp_extract_all".r.findAllIn(planC).length)
    spark.stop()
  }
}

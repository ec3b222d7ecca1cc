package graft.tools
import org.apache.spark.sql.SparkSession
object CCRounds {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (labels, rounds) = graft.operators.Dedup.dupClustersBigStarOver(
      graft.operators.Inputs.documents(spark, dir))
    println(s"CCROUNDS rounds=$rounds labels=${labels.count()}")
    spark.stop()
  }
}

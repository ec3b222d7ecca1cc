package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time dupClusters at a given SF dir (not part of the
  * driver contract). */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.dupClusters(spark, dir).count()
      println(s"dupClusters run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.Similarity.annIvf(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(s"annIvf run$i sec=${(System.nanoTime() - t0) / 1e9}")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.LangIdModel.predict(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(s"langIdModel run$i sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}

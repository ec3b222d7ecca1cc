package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: where do Observation metrics survive — plain action,
  * under a self-join, under localCheckpoint? */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k")

    def g(o: Observation): String = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      try Await.result(Future(o.get), 10.seconds).toString
      catch { case e: Throwable => s"TIMEOUT/${e.getClass.getSimpleName}" }
    }
    val o1 = Observation()
    df.observe(o1, sum("k").as("s")).count()
    println(s"plain action: ${g(o1)}")

    val o2 = Observation()
    val obs2 = df.observe(o2, sum("k").as("s"))
    val j = obs2.as("x").join(obs2.as("y"), "k")
    j.count()
    println(s"self-join: ${g(o2)}")

    val o3 = Observation()
    val obs3 = df.observe(o3, sum("k").as("s"))
    obs3.as("x").join(obs3.as("y"), "k").localCheckpoint()
    println(s"self-join + localCheckpoint: ${g(o3)}")

    // the real failing path: window count -> observe -> filter -> self-join
    val o4 = Observation()
    val common = (1 to 50).map(i => s"tok$i").mkString(" ")
    val docs = (1 to 1000).map(i => (i.toLong, s"$common tail$i")).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.minhashPairsOver(docs, obs = Some(o4))
    println(s"pairs: ${pairs.count()}")
    println(s"real path: ${g(o4)}")

    import org.apache.spark.sql.expressions.Window
    def sized(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("k")))
    val o5 = Observation()
    sized(df).observe(o5, max("bsz").as("m")).filter(col("bsz") <= 3).count()
    println(s"window+observe+filter+count: ${g(o5)}")

    val o6 = Observation()
    val b6 = sized(df).observe(o6, max("bsz").as("m")).filter(col("bsz") <= 3).drop("bsz")
    b6.as("x").join(b6.as("y"), col("x.k") === col("y.k") && col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id")).distinct().count()
    println(s"window+observe+selfjoin+distinct: ${g(o6)}")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val o7 = Observation()
    val b7 = sized(df).observe(o7, max("bsz").as("m")).filter(col("bsz") <= 3).drop("bsz")
    b7.as("x").join(b7.as("y"), col("x.k") === col("y.k") && col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id")).distinct().count()
    println(s"same, AQE off: ${g(o7)}")
    spark.stop()
  }
}

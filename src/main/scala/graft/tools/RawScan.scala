// throwaway: raw multithreaded throughput of PiiScan.scan
object RawScan {
  def main(args: Array[String]): Unit = {
    val texts = (0 until 200000).map { i =>
      if (i % 20 == 0) s"reach me at agent$i@example.com some padding words here"
      else if (i % 20 == 2) "my ssn is 123-45-6789 words"
      else "thanks for the update, that all sounds right to me and more filler words"
    }.toArray
    def run(threads: Int): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var i = t
          while (i < texts.length) { graft.functions.PiiScan.scan(texts(i)); i += threads }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    run(1) // warm
    for (t <- Seq(1, 8, 32)) println(s"[raw] threads=$t  ${run(t)} s")
  }
}

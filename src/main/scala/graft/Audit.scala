package graft
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_sessionize", "q_left_join", "q_star_join", "q_dedup_minhash", "q_ann_bruteforce", "q_union")
    for (name <- names) {
      val p = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      val exchanges = p.linesIterator.count(_.contains("Exchange"))
      val joins = p.linesIterator.filter(l => l.contains("Join")).map(_.trim.takeWhile(_ != '[')).mkString("; ")
      println(s"audit: $name exchanges=$exchanges joins=[$joins]")
    }
    spark.stop()
  }
}

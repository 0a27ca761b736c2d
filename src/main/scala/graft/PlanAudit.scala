package graft

/** Audit every declared query's physical plan for repeated-scan and
  * shuffle counts (guide §1.1 first-principles pass): for each query,
  * print how many times each parquet file is scanned in ONE plan and
  * the Exchange count. A file scanned 3+ times usually marks a shared
  * subtree the plan recomputes per consumer (the armCumGrid shape) —
  * candidates for §3.3 materialization. Usage:
  *   runMain graft.PlanAudit [minScans]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val minScans = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scanRe = "Location: InMemoryFileIndex \\[([^\\]]+)".r
    for ((n, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        val scans = scanRe.findAllMatchIn(
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          .map(_.group(1).split("/").last).toSeq
        val byFile = scans.groupBy(identity).view.mapValues(_.size).toMap
        val nEx = "Exchange".r.findAllIn(txt).size
        val hot = byFile.filter(_._2 >= minScans)
        if (hot.nonEmpty)
          println(s"AUDIT $n exchanges=$nEx scans=" +
            byFile.toSeq.sortBy(-_._2).map { case (f, c) => s"$f:$c" }
              .mkString(","))
      } catch { case e: Throwable =>
        println(s"AUDIT $n ERROR ${e.getClass.getSimpleName}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

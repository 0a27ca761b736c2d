package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiling main: run a named query N times, print each run. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_exact")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    run(SparkEntry.queries("q_top10_tokens")(spark, sfDir))
    for (n <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      run(SparkEntry.queries(n)(spark, sfDir))
      println(f"[profile] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

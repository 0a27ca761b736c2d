package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries into plans/r18/
  * (`<query>_<suffix>.txt`). Usage:
  *   runMain graft.R18Plans before q_recursive_cte q_spearman ...
  * Suffix is the first arg; remaining args are query names.
  */
object R18Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
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
    Files.createDirectories(Paths.get("plans/r18"))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r18/${n}_$suffix.txt"), txt)
      println(s"wrote plans/r18/${n}_$suffix.txt (${txt.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

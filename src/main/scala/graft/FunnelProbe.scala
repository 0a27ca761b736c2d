package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationPipeline, Dedup, DedupCluster}

/** Decompose q_curation_funnel's wall time into its stage sub-DAGs
  * (guide §1.1 empirical loop). Each piece is timed twice, warm. */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"[funnel] $label%-34s run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs")
        spark.catalog.clearCache()
      }
    }
    def docs = Tables.loadParallel(spark, dir, "documents")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("exactKeepers (md5-norm agg)") {
      noop(docs.groupBy(md5(regexp_replace(trim(lower(col("text"))),
          "[ \\t\\n\\x0B\\f\\r]+", " ")).as("h"))
        .agg(min(col("doc_id")).as("keep_id")))
    }
    time("minHashNearDups(docs)") {
      noop(Dedup.minHashNearDups(docs, "doc_id", "text", 0.8))
    }
    time("shinglePersist only") {
      val sh = Dedup.shingleDf(docs, "doc_id", "text", 3)
        .filter(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      noop(sh)
      sh.unpersist(true)
    }
    time("components(minhash pairs)") {
      val e = Dedup.minHashNearDups(docs, "doc_id", "text", 0.8)
        .select(col("i"), col("j"))
      noop(DedupCluster.components(docs, "doc_id", e))
    }
    time("contamination 5-gram join") {
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val benchSh = Dedup.shingleDf(bench, "doc_id", "text", 5)
        .select(explode(col("sh")).as("g")).distinct()
      noop(Dedup.shingleDf(docs, "doc_id", "text", 5)
        .select(col("id"), explode(col("sh")).as("g"))
        .join(benchSh, "g").select(col("id")).distinct())
    }
    time("quality flags projection") {
      noop(docs.withColumn("quality",
          graft.functions.TextAnalysis.qualityScore(col("text")))
        .withColumn("n_tokens",
          graft.functions.TextAnalysis.tokenCount(col("text")))
        .select(col("doc_id"), col("quality"), col("n_tokens")))
    }
    time("FULL q_curation_funnel") {
      noop(SparkEntry.queries("q_curation_funnel")(spark, dir))
    }
    spark.stop()
  }
}

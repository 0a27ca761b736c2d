package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Brute force is the exactness baseline: broadcast the (small) query
  * set against the full corpus — one scan, no shuffle of the corpus,
  * scales linearly with corpus size and executor count. The LSH / IVF
  * variants (see AnnLsh) bucket first so the pairwise work is
  * per-bucket instead of full cross-product.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) — the full corpus, scanned once
    * @param queries (idCol, vecCol) — SMALL; broadcast to every task
    * @return (q_id, rn, n_id, sim) one row per query × rank
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        Vectors.cosine(col("q_vec"), col("n_vec")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "rn", "n_id", "sim")
  }

  /** Hard-negative mining for contrastive / embedding training: per
    * query, the top-k corpus vectors inside the similarity band
    * [lo, hi) — similar enough to be informative negatives, below the
    * near-dup ceiling that would make them false negatives. The band
    * filter runs BEFORE the per-query ranking, so the GroupTopK heaps
    * only see band members; at scale the scored relation comes from the
    * LSH/IVF index (same contract) instead of the broadcast scan.
    * Output is integer ids + ranks (engine-exact; the band-edge
    * comparisons are single IEEE compares on identical doubles). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    lo: Double, hi: Double): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val banded = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        Vectors.cosine(col("q_vec"), col("n_vec")).as("sim"))
      .filter(col("sim") >= lo && col("sim") < hi)
    val pruned = graft.plans.GroupTopK.topKPerGroup(banded, k,
      Seq(col("q_id")), Seq(col("sim").desc, col("n_id").asc))
    pruned.withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id").asc)))
      .select("q_id", "rn", "n_id")
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98) — the DIVERSITY-aware top-k that retrieval-augmented
    * and dedup-aware training batches use: after the index returns
    * `nCand` candidates per query, greedily pick k of them maximizing
    * λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), so each pick is relevant
    * AND far from what is already selected.
    *
    * Scale shape: the expensive part is candidate generation (the ANN
    * index — here the brute-force baseline); the greedy is
    * embarrassingly per-query over ≤ nCand rows, so it runs as ONE
    * flatMapGroups job — each group holds its nCand candidates, the
    * nCand² pair sims and the k greedy rounds are a local loop, and
    * nothing corpus-sized ever shuffles twice. All similarities are
    * round(9)-collapsed with low-id tie-breaks (the repo's
    * float-ordering rule), and the local loop replays the EXACT
    * engine arithmetic (same sequential double accumulation as the
    * codegen'd cosine, Spark's BigDecimal HALF_UP round, NaN-greatest
    * double ordering) — so the greedy trajectory, and therefore the
    * whole output, replays identically on any engine.
    * Output: (q_id, pick, n_id), pick 1-based in selection order. */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCand: Int,
              lambda: Double = 0.7): DataFrame = {
    val session = corpus.sparkSession
    import session.implicits._
    val mu = 1.0 - lambda // the explicit subtraction the oracle mirrors
    val cand = bruteForceTopK(corpus, queries, idCol, vecCol, nCand)
      .select(col("q_id"), col("n_id"), round(col("sim"), 9).as("rel"))
      .join(corpus.select(col(idCol).as("n_id"),
        col(vecCol).cast("array<double>").as("n_vec")), "n_id")
      .select(col("q_id").cast("long"), col("n_id").cast("long"),
        col("rel"), col("n_vec"))
      .as[(Long, Long, Double, Seq[Double])]
    cand.groupByKey(_._1)
      .flatMapGroups { (qId: Long, rows: Iterator[(Long, Long, Double, Seq[Double])]) =>
        val cs = rows.toArray // ≤ nCand by construction
        val n = cs.length
        val ids = cs.map(_._2)
        val rel = cs.map(_._3)
        val vecs = cs.map(_._4.toArray)
        // (score desc, id asc) argmax under Spark's double ordering
        // (NaN greatest, -0.0 < 0.0) = java.lang.Double.compare
        def beats(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
          val c = java.lang.Double.compare(s1, s2)
          c > 0 || (c == 0 && id1 < id2)
        }
        val isSel = new Array[Boolean](n)
        // running max pair-sim to the selected set, per candidate
        val maxp = Array.fill(n)(Double.NegativeInfinity)
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Int, Long)](math.min(k, n))
        var pick = 1
        while (pick <= k && pick <= n) {
          var best = -1
          var bestScore = 0.0
          var j = 0
          while (j < n) {
            if (!isSel(j)) {
              val score =
                if (pick == 1) rel(j)
                else round9(lambda * rel(j) - mu * maxp(j))
              if (best < 0 || beats(score, ids(j), bestScore, ids(best))) {
                best = j; bestScore = score
              }
            }
            j += 1
          }
          isSel(best) = true
          out += ((qId, pick, ids(best)))
          j = 0
          while (j < n) {
            if (!isSel(j)) {
              val p = round9(cosineLocal(vecs(j), vecs(best)))
              if (java.lang.Double.compare(p, maxp(j)) > 0) maxp(j) = p
            }
            j += 1
          }
          pick += 1
        }
        out
      }
      .toDF("q_id", "pick", "n_id")
  }

  /** Spark's `round(x, 9)` replayed locally: BigDecimal.valueOf +
    * HALF_UP, NaN/Inf pass through (RoundBase's DoubleType branch). */
  private def round9(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** NativeExpressions.CosineSim's exact loop (same sequential
    * accumulation order → bit-identical doubles). */
  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The k-round unrolled DataFrame formulation of [[mmrTopK]] — k
    * sequential jobs of tiny joins with per-round localCheckpoints.
    * Kept as the cross-formulation parity reference (AnnSpec asserts
    * row-identical output); the fused flatMapGroups version above is
    * the production path (one job instead of k). */
  def mmrTopKUnrolled(corpus: DataFrame, queries: DataFrame, idCol: String,
                      vecCol: String, k: Int, nCand: Int,
                      lambda: Double = 0.7): DataFrame = {
    val cand = bruteForceTopK(corpus, queries, idCol, vecCol, nCand)
      .select(col("q_id"), col("n_id"), round(col("sim"), 9).as("rel"))
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")), "n_id")
      .localCheckpoint(true)
    val pairs = cand.as("a")
      .join(cand.select(col("q_id"), col("n_id").as("s_id"),
        col("n_vec").as("s_vec")).as("b"), Seq("q_id"))
      .filter(col("n_id") =!= col("s_id"))
      .select(col("q_id"), col("n_id"), col("s_id"),
        round(Vectors.cosine(col("n_vec"), col("s_vec")), 9).as("psim"))
      .localCheckpoint(true)
    // pick 1: plain argmax relevance
    var selected = cand
      .groupBy(col("q_id"))
      .agg(max_by(col("n_id"), struct(col("rel"), -col("n_id"))).as("n_id"))
      .select(col("q_id"), lit(1).as("pick"), col("n_id"))
      .localCheckpoint(true)
    for (i <- 2 to k) {
      val remaining = cand.join(selected.select(col("q_id"), col("n_id")),
        Seq("q_id", "n_id"), "left_anti")
      val diversity = remaining
        .join(pairs.join(selected.select(col("q_id"),
            col("n_id").as("s_id")), Seq("q_id", "s_id"))
          .groupBy(col("q_id"), col("n_id"))
          .agg(max(col("psim")).as("maxp")), Seq("q_id", "n_id"))
        .select(col("q_id"), col("n_id"),
          round(lit(lambda) * col("rel") -
            lit(1.0 - lambda) * col("maxp"), 9).as("score"))
      val next = diversity.groupBy(col("q_id"))
        .agg(max_by(col("n_id"), struct(col("score"), -col("n_id"))).as("n_id"))
        .select(col("q_id"), lit(i).as("pick"), col("n_id"))
      selected = selected.unionAll(next).localCheckpoint(true)
    }
    selected
  }
}

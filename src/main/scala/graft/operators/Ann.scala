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
    * index — here the brute-force baseline); the greedy loop runs on
    * queries × nCand rows ONLY (pair sims are per-query nCand², never
    * corpus-sized), k bounded iterations of tiny joins, selection
    * localCheckpoint'd per round so the plan stays flat. All
    * similarities are round(9)-collapsed with low-id tie-breaks (the
    * repo's float-ordering rule), so the greedy trajectory — and
    * therefore the whole output — replays identically on any engine.
    * Output: (q_id, pick, n_id), pick 1-based in selection order. */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
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

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
}

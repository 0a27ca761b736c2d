package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", 2023): embedding-space
  * dedup that only compares WITHIN coarse clusters — the trick that
  * makes semantic dedup tractable at corpus scale. Pairs across cells
  * are deliberately never examined (the quantizer's recall loss is the
  * accepted trade, exactly as in the paper).
  *
  * A doc is DROPPED when some smaller-id doc in its cell has cosine ≥
  * theta to it — "keep the earliest" per epsilon-neighborhood, the
  * deterministic stand-in for the paper's keep-one-per-ball rule (note
  * this is per-NEIGHBOR, not per connected component: a chain a~b~c
  * with cos(a,c) < theta keeps only a, matching SemDeDup's greedy
  * behavior, not the component semantics of DedupCluster).
  *
  * Scale shape: the cell assignment is one broadcast-centroid argmax
  * scan (AnnIvf.assign); the candidate join is an equi-join on cid, so
  * pair count is Σ cell² — bounded by sizing nlist so cells stay
  * O(n/nlist), never n². Reuses the stride-init deterministic quantizer
  * (zero Lloyd passes ⇒ no float averaging ⇒ oracle-replayable cells).
  */
object SemDedup {

  /** (vec_id, cell) for every KEPT vector. */
  def kept(embs: DataFrame, idCol: String, vecCol: String,
           nlist: Int = 16, theta: Double = 0.4): DataFrame = {
    val centroids = AnnIvf.fit(embs, idCol, vecCol, nlist, iters = 0)
    val a = AnnIvf.assign(embs, centroids, idCol, vecCol) // (id, cid, vec)
    val dropped = a.as("x").join(a.as("y"),
        col("x.cid") === col("y.cid") && col("y.id") < col("x.id"))
      .filter(Vectors.cosine(col("x.vec"), col("y.vec")) >= theta)
      .select(col("x.id").as("id")).distinct()
    a.join(dropped, Seq("id"), "left_anti")
      .select(col("id").as("vec_id"), col("cid").as("cell"))
  }
}

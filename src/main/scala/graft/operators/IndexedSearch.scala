package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fit-once / serve-many vector retrieval over persisted index
  * ARTIFACTS — the single entry point that composes what the piecewise
  * contracts already guarantee (AnnIvf.saveIndex/loadIndex,
  * AnnPq.saveCodebooks/loadCodebooks, StreamOps' PQ ingest): one
  * pipeline fits the quantizers on a corpus snapshot and persists
  * EVERYTHING a query job needs; every later session loads the
  * artifacts and serves without touching raw embeddings or re-fitting.
  *
  * Artifact layout under `dir`:
  *   ivf_centroids/  (cid, centroid)        — nlist × dim doubles, tiny
  *   ivf_assigned/   (id, vec) PARTITIONED BY cid — the corpus, laid
  *                   out so an nprobe-cell probe prunes to
  *                   nprobe/nlist of the files (at 100 TB the probe
  *                   join's broadcast drives dynamic partition pruning
  *                   — a query touches only the probed cells' parquet)
  *   pq_codebooks/   (m, cid, centroid)     — m × ksub sub-vectors, tiny
  *   pq_codes/       (id, m, code)          — m bytes/vector in spirit:
  *                   the memory-side serve path; raw vectors stay in
  *                   ivf_assigned only
  *
  * Serving modes: [[serveIvf]] (compute-side: probe + exact re-rank),
  * [[servePq]] (memory-side: ADC over codes, no vector math against
  * the corpus), [[serveHybrid]] (dense IVF arm + lexical 3-gram arm,
  * RRF-fused on Search.fuseRrf's shared (q_id, d_id, rank) contract).
  *
  * AnnSpec asserts save→load→serve parity with the fitting session for
  * all three modes.
  */
object IndexedSearch {

  /** Fit the IVF + PQ quantizers and persist all four artifacts. */
  def fit(embs: DataFrame, idCol: String, vecCol: String, dir: String,
          nlist: Int = 16, iters: Int = 1, m: Int = 8, subDim: Int = 8,
          ksub: Int = 16, pqIters: Int = 1): Unit = {
    val centroids = AnnIvf.fit(embs, idCol, vecCol, nlist, iters)
    AnnIvf.saveIndex(centroids, s"$dir/ivf_centroids")
    AnnIvf.assign(embs, centroids, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$dir/ivf_assigned")
    val cb = AnnPq.trainCodebooks(embs,
      AnnPq.fitCodebooks(embs, idCol, vecCol, m, subDim, ksub),
      idCol, vecCol, m, subDim, pqIters)
    AnnPq.saveCodebooks(cb, s"$dir/pq_codebooks")
    AnnPq.encode(embs, cb, idCol, vecCol, m, subDim)
      .write.mode("overwrite").parquet(s"$dir/pq_codes")
  }

  /** The assigned corpus with `cid` restored to a join-typed column
    * (partition-column inference reads the dir name as int). */
  private def loadAssigned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/ivf_assigned")
      .select(col("id"), col("vec"), col("cid").cast("long").as("cid"))

  /** Compute-side serve: probe the nprobe max-cosine cells per query,
    * exact cosine re-rank inside. Returns (q_id, rn, n_id, sim). */
  def serveIvf(spark: SparkSession, dir: String, queries: DataFrame,
               idCol: String, vecCol: String, k: Int,
               nprobe: Int = 4): DataFrame =
    AnnIvf.search(loadAssigned(spark, dir),
      AnnIvf.loadIndex(spark, s"$dir/ivf_centroids"),
      queries, idCol, vecCol, k, nprobe)

  /** Memory-side serve: ADC over the persisted codes — the corpus is
    * never read as vectors at query time. Returns (q_id, rn, n_id). */
  def servePq(spark: SparkSession, dir: String, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              m: Int = 8, subDim: Int = 8): DataFrame =
    AnnPq.searchEncoded(spark.read.parquet(s"$dir/pq_codes"),
      AnnPq.loadCodebooks(spark, s"$dir/pq_codebooks"),
      queries, idCol, vecCol, k, m, subDim)

  /** Hybrid serve: the dense arm comes from the LOADED IVF index, the
    * lexical 3-gram arm from `docs`, fused by RRF. `queries` is the
    * serve-time request set — (idCol, vecCol) rows, request-sized by
    * definition (recovering query vectors from the cid-partitioned
    * corpus artifact would scan every cell's files and defeat the
    * pruning the layout exists for). The lexical arm selects the query
    * docs by the collected request ids — bounded by the request size,
    * pushed into the shingle scan as an IN filter.
    * Returns (q_id, rn, d_id, rsem, rlex), rn = 1..k in fused order. */
  def serveHybrid(spark: SparkSession, dir: String, docs: DataFrame,
                  docId: String, textCol: String, queries: DataFrame,
                  idCol: String, vecCol: String,
                  armK: Int = 20, k: Int = 10, nprobe: Int = 4,
                  rrfC: Int = 60): DataFrame = {
    val sem = serveIvf(spark, dir, queries, idCol, vecCol, armK, nprobe)
      .select(col("q_id"), col("n_id").as("d_id"), col("rn").as("rsem"))
    val qIds = queries.select(col(idCol).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    val lex = Search.lexicalArm(docs, docId, textCol,
      col("id").isInCollection(qIds), armK)
    Search.fuseRrf(sem, lex, rrfC, k)
  }
}

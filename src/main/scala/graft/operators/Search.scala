package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Lexical (keyword) search primitives: inverted index, BM25 ranked
  * retrieval, and sparse TF-IDF cosine similarity via an index join.
  * The ANN family (AnnLsh/AnnIvf/q_ann_bruteforce) covers the dense
  * embedding half of similarity search; this is the sparse half a
  * training-data pipeline uses for corpus search, query-based
  * decontamination, and lexical near-dup scoring.
  *
  * Scale shape: everything routes through the (doc_id, term, tf)
  * relation — one tokenize scan, one hash aggregation. All joins are
  * per-term (inverted-index joins) or per-doc, never doc×doc; query
  * retrieval filters the term relation to the query's terms BEFORE any
  * aggregation, so the scored relation is |query| × df rows, not
  * corpus-sized. Cross-engine float rule: tf/df/dl are exact integers,
  * single divisions are deterministic per-value, and every summed
  * double surfaces through round(..., 9) (see SURVEY §4).
  */
object Search {

  /** (doc_id, term, tf): the term-frequency relation every other
    * operator here derives from. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(lower(col(textCol))).as("tk"))
      .select(col("doc_id"), explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Inverted index: (term, df, postings) with the posting list as a
    * sorted CSV of doc ids. At 100 TB the posting payload for stopword-
    * class terms is the skew risk — the build is one hash agg keyed on
    * the term, so AQE skew-split handles the hot terms, and df comes
    * from the same shuffle (no second pass). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termFreq(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))

  /** BM25 (Robertson/Spärck Jones) top-k retrieval for a literal query.
    *
    * score(d) = Σ_t ln((N − df + 0.5)/(df + 0.5) + 1) ·
    *            tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * The term filter lands BEFORE tf/df aggregation, so the scored
    * relation is only the query terms' postings; df and the (N, avgdl)
    * scalars broadcast. Ranking uses the round(9) score with doc_id as
    * the total tie-break, so ranks are engine-stable. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    // r18 (guide §3.3): dl feeds the corpus stats AND the score join,
    // qtf feeds the df rollup AND the score join — each consumer
    // re-ran its tokenize pass (PlanAudit: 4 scans). Both tables are
    // small (doc-sized lengths / query-term postings); checkpoint each
    // once so the corpus tokenizes twice total, not four times.
    val dl = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(lower(col(textCol))).as("dl"))
      .localCheckpoint(true)
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val qtf = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(lower(col(textCol))).as("tk"))
      .select(col("doc_id"), explode(col("tk")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfT = qtf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = qtf
      .join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * tfNorm), 9).as("score"))
    // TakeOrderedAndProject prefix, then rank over topK rows only
    scored.orderBy(col("score").desc, col("doc_id").asc).limit(topK)
      .withColumn("rnk", row_number().over(
        BoundedWindow.boundedGlobal(s"top-K prefix <= $topK rows")
          .orderBy(col("score").desc, col("doc_id").asc)))
  }

  /** All-pairs sparse TF-IDF cosine over a bounded id range, via the
    * inverted-index join: pairs meet per shared term (shuffle keyed on
    * the term), so the dot product accumulates only over the
    * intersection — docs sharing nothing never pair. Weights are
    * tf/df (exact integer division per value); norms and dots are
    * summed doubles surfaced through round(9). */
  def sparseCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxId: Long): DataFrame = {
    // the weighted relation feeds three consumers (norms + both join
    // sides); persist so the tokenize/tf/df pipeline runs once — cache
    // lifetime is the caller's, as with Dedup.minHashNearDups
    val w = {
      val tf0 = termFreq(docs.filter(col(idCol) < maxId), idCol, textCol)
      val dfT = tf0.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf0.join(dfT, "term")
        .select(col("doc_id"), col("term"),
          (col("tf").cast("double") / col("df").cast("double")).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val norms = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
      .join(norms.select(col("doc_id").as("i"), col("nrm").as("ni")), "i")
      .join(norms.select(col("doc_id").as("j"), col("nrm").as("nj")), "j")
      .select(col("i"), col("j"),
        round(col("dot") / (col("ni") * col("nj")), 9).as("cos_sim"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion: the modern two-arm
    * search shape — a dense arm (exact cosine over the embedding
    * column) and a sparse arm (3-gram Jaccard against the query doc's
    * text) each produce a per-query top-`armK` list, fused by
    * RRF(d) = Σ_arms 1/(c + rank_arm(d)) and re-ranked.
    *
    * Scale shape: both arms prune with the GroupTopK custom operator
    * (partial per-partition heaps → exchange on q_id → final heaps —
    * never a corpus-wide window sort); the row_number windows only ever
    * see ≤ armK survivors per query. The lexical arm's candidates come
    * from a per-shingle equi-join (docs sharing ≥ 1 shingle — zero-
    * overlap docs never pair), the dense arm broadcasts the query
    * vectors. At 100 TB the dense arm swaps to AnnLsh/AnnIvf on the
    * same (q_id, d_id, rank) contract; brute-force cosine here keeps
    * the oracle exact.
    *
    * Determinism: arm ranks are integers with (score desc, d_id)
    * total orders; RRF sums exactly TWO IEEE doubles per row (never an
    * accumulation), so scores are bit-identical across engines and the
    * (rrf desc, d_id) output order is engine-stable. Arm ranks surface
    * as 0-coalesced integers (0 = not retrieved by that arm).
    *
    * @return (q_id, rn, d_id, rsem, rlex), rn = 1..k in fused order */
  def rrfHybrid(docs: DataFrame, embs: DataFrame,
                docId: String, textCol: String, vecId: String, vecCol: String,
                nQueries: Long, armK: Int = 20, k: Int = 10,
                rrfC: Int = 60): DataFrame = {
    // dense arm: exact cosine, GroupTopK prune, rank the survivors
    val q = embs.filter(col(vecId) < nQueries)
      .select(col(vecId).as("q_id"), col(vecCol).as("q_vec"))
    val c = embs.select(col(vecId).as("n_id"), col(vecCol).as("n_vec"))
    val semScored = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id").as("d_id"),
        graft.functions.Vectors.cosine(col("q_vec"), col("n_vec")).as("sim"))
    val semTop = graft.plans.GroupTopK.topKPerGroup(semScored, armK,
      Seq(col("q_id")), Seq(col("sim").desc, col("d_id").asc))
    val sem = semTop.withColumn("rsem", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("d_id").asc)))
      .select(col("q_id"), col("d_id"), col("rsem"))

    fuseRrf(sem, lexicalArm(docs, docId, textCol, col("id") < nQueries, armK),
      rrfC, k)
  }

  /** The sparse retrieval arm: 3-gram Jaccard vs the query docs'
    * shingles — shared counts from the per-shingle equi-join (docs
    * sharing ≥ 1 shingle; zero-overlap docs never pair), sizes joined
    * back, GroupTopK prune, integer ranks. `qPred` selects the query
    * docs on the shingle table's `id` column (a pushed filter, so the
    * query side never shuffles the corpus).
    * @return (q_id, d_id, rlex) with rlex = 1..armK */
  def lexicalArm(docs: DataFrame, docId: String, textCol: String,
                 qPred: org.apache.spark.sql.Column, armK: Int): DataFrame =
    lexicalArmSel(docs, docId, textCol, _.filter(qPred), armK)

  /** [[lexicalArm]] with the query docs selected by LEFT SEMI join
    * instead of an inlined predicate — for query sets too large to
    * collect into an IN filter. `qIds` is a one-column DataFrame of
    * query doc ids; the semi-join exchanges only the (small relative
    * to the exploded shingles) pre-explode shingle rows, never a
    * driver collect, so the batch size is unbounded. */
  def lexicalArmJoin(docs: DataFrame, docId: String, textCol: String,
                     qIds: DataFrame, armK: Int): DataFrame = {
    val ids = qIds
      .select(col(qIds.columns.head).cast("long").as("id")).distinct()
    lexicalArmSel(docs, docId, textCol,
      _.join(ids, Seq("id"), "left_semi"), armK)
  }

  private def lexicalArmSel(docs: DataFrame, docId: String,
                            textCol: String, sel: DataFrame => DataFrame,
                            armK: Int): DataFrame = {
    val sh = Dedup.shingleDf(docs, docId, textCol, 3)
    val qx = sel(sh)
      .select(col("id").as("q_id"), size(col("sh")).as("qn"),
        explode(col("sh")).as("g"))
    val cx = sh.select(col("id").as("d_id"), size(col("sh")).as("dn"),
      explode(col("sh")).as("g"))
    val lexScored = qx.join(cx, Seq("g"))
      .filter(col("d_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("d_id"), col("qn"), col("dn"))
      .agg(count(lit(1)).as("shared"))
      .select(col("q_id"), col("d_id"),
        (col("shared").cast("double") /
          (col("qn") + col("dn") - col("shared")).cast("double")).as("jac"))
    val lexTop = graft.plans.GroupTopK.topKPerGroup(lexScored, armK,
      Seq(col("q_id")), Seq(col("jac").desc, col("d_id").asc))
    lexTop.withColumn("rlex", row_number().over(
        Window.partitionBy("q_id").orderBy(col("jac").desc, col("d_id").asc)))
      .select(col("q_id"), col("d_id"), col("rlex"))
  }

  /** RRF fusion of two integer-ranked arms on the shared
    * (q_id, d_id, rank) contract: full outer on (q_id, d_id), each arm
    * contributes 1/(c+rank), re-rank by (rrf desc, d_id). Exactly TWO
    * IEEE doubles sum per row (never an accumulation), so scores are
    * bit-identical across engines. Arm ranks surface 0-coalesced
    * (0 = not retrieved by that arm).
    * @return (q_id, rn, d_id, rsem, rlex), rn = 1..k in fused order */
  def fuseRrf(sem: DataFrame, lex: DataFrame, rrfC: Int, k: Int): DataFrame = {
    val fused = sem.join(lex, Seq("q_id", "d_id"), "full_outer")
      .select(col("q_id"), col("d_id"),
        coalesce(col("rsem"), lit(0)).as("rsem"),
        coalesce(col("rlex"), lit(0)).as("rlex"))
      .withColumn("rrf",
        when(col("rsem") > 0, lit(1.0) / (lit(rrfC) + col("rsem"))).otherwise(lit(0.0)) +
          when(col("rlex") > 0, lit(1.0) / (lit(rrfC) + col("rlex"))).otherwise(lit(0.0)))
    fused.withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rrf").desc, col("d_id").asc)))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("d_id"), col("rsem"), col("rlex"))
  }
}

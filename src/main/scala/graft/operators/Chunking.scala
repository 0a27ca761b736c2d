package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions.md5Prefix60
import graft.functions.TextAnalysis

/** Sliding-window text chunking — the RAG / context-window
  * preprocessing stage: fixed token windows at a fixed stride per
  * document, short final window kept.
  *
  * Scale shape: pure per-row projection + explode — stateless and
  * shuffle-free, so the SAME plan serves batch and structured
  * streaming unchanged (StreamingSpec asserts batch ≡ stream). Each
  * chunk emits its token count and an md5-60bit fingerprint of the
  * space-joined window, so downstream chunk-level dedup/exact-match
  * joins move 8-byte keys, never chunk text.
  */
object Chunking {

  /** (idCol, chunk_id, n_tok, chunk_hash) — one row per window.
    * Chunk i covers tokens [stride·i + 1, stride·i + window]; rows
    * emit while the start stays in range, so the last chunk may be
    * short. Docs with zero tokens emit nothing. */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window >= stride && stride > 0,
      "need window >= stride > 0 (gaps would drop tokens)")
    val tk: Column = TextAnalysis.tokens(lower(col(textCol)))
    docs.select(col(idCol), tk.as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0),
          floor((size(col("tk")) - 1) / lit(stride)).cast("int"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("tk"), col("chunk_id") * lit(stride) + lit(1), lit(window))
          .as("ck"))
      .select(col(idCol), col("chunk_id"),
        size(col("ck")).cast("long").as("n_tok"),
        md5Prefix60(concat_ws(" ", col("ck"))).as("chunk_hash"))
  }
}

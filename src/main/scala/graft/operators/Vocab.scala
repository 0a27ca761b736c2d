package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Vocabulary building and document encoding — the tokenize→ids step a
  * training pipeline runs after curation (the id arrays are what gets
  * packed into training sequences; see Packing).
  *
  * Scale shape: the only corpus-wide work is the token count (one
  * shuffle with map-side combine). The rank window is global but runs
  * over the DISTINCT-token table — millions of rows at 100 TB text, not
  * corpus-sized — and `minCount` prunes the hapax tail before the
  * single-partition sort. Encoding joins that same vocab-sized table
  * back to the exploded corpus (broadcast at typical vocab sizes; AQE
  * shuffles on token if a giant vocab is forced).
  */
object Vocab {

  /** Frequency-ranked dense token ids: tok_id 1 = most frequent, ties
    * broken lexicographically — deterministic across runs, engines and
    * cluster sizes. */
  def build(docs: DataFrame, textCol: String, minCount: Long = 1L): DataFrame = {
    val counts = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val w = BoundedWindow.boundedGlobal("vocab table, |distinct tokens| rows")
      .orderBy(col("cnt").desc, col("token").asc)
    counts.select(col("token"), col("cnt"),
      row_number().over(w).cast("long").as("tok_id"))
  }

  /** Encode each document as its vocab-id sequence (column `ids`,
    * OOV → 0). Token order is restored from the explode position via an
    * array_sort on (pos, id) structs, so the sequence is exact no
    * matter how the groupBy shuffles rows. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(lower(col(textCol)))).as(Seq("pos", "token")))
      .join(vocab.select(col("token"), col("tok_id")), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          coalesce(col("tok_id"), lit(0L)).as("tid")))),
        p => p.getField("tid")).as("ids"))

  /** Inverse of [[encode]]: vocab-id sequences back to whitespace-joined
    * token text. Id 0 (OOV) renders as `<unk>`, so
    * decode(encode(docs)) equals the normalized source text with OOV
    * tokens masked — the round-trip the codec API owes its callers.
    * Same shape as encode: posexplode → vocab equi-join (broadcast-
    * sized) → ordered regroup; one doc-keyed shuffle. */
  def decode(encoded: DataFrame, idCol: String, idsCol: String,
             vocab: DataFrame): DataFrame =
    encoded
      .select(col(idCol), posexplode(col(idsCol)).as(Seq("pos", "tid")))
      .join(vocab.select(col("tok_id").as("tid"), col("token")),
        Seq("tid"), "left")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"),
          coalesce(col("token"), lit("<unk>")).as("tok")))),
        p => p.getField("tok")), " ").as("text"))

  /** Stateless encoder for streaming / map-only contexts: the vocab is
    * captured as a literal map (shipped to every task like a broadcast
    * var), so encoding is a pure projection — append-mode streamable
    * with no shuffle and no state, unlike `encode`'s explode+regroup.
    * Fits whenever the vocab is driver-collectable; for vocabularies
    * past that bound use [[encodeStream]], which keeps only the top-K
    * tokens driver-side. */
  def encoderFor(vocab: DataFrame): Column => Column = {
    val m = vocab.select(col("token"), col("tok_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mapCol = typedLit(m)
    text => transform(TextAnalysis.tokens(lower(text)),
      t => coalesce(element_at(mapCol, t), lit(0L)))
  }

  /** Two-tier streaming encoder for vocabularies too large to collect
    * into a driver literal:
    *
    *  - HOT tier: the top `hotK` tokens by frequency rank (tok_id ≤
    *    hotK — `build` ranks by count) become the literal-map
    *    projection of [[encoderFor]]. Under a Zipfian token
    *    distribution a few-thousand-token hot tier covers the vast
    *    majority of token OCCURRENCES, so most documents encode as a
    *    pure stateless projection — no shuffle, no state, no join.
    *  - COLD tier: only rows containing at least one non-hot token take
    *    the slow path — posexplode → stream-static equi-join against
    *    the residual vocab table (tok_id > hotK; stateless per
    *    micro-batch, broadcast when the residual fits, shuffled-hash
    *    otherwise) → watermarked regroup on (id, ts) restoring token
    *    order from the explode position. State is bounded by the
    *    watermark; emission waits for it (append semantics).
    *
    * Output: (idCol, tsCol, ids), the union of both tiers. Parity with
    * batch [[encode]] (OOV → 0) is asserted in VocabSpec. */
  def encodeStream(stream: DataFrame, idCol: String, textCol: String,
                   tsCol: String, vocab: DataFrame, hotK: Int,
                   watermark: String = "10 minutes"): DataFrame = {
    val hot = vocab.filter(col("tok_id") <= hotK)
      .select(col("token"), col("tok_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hotMap = typedLit(hot)
    val residual = vocab.filter(col("tok_id") > hotK)
      .select(col("token"), col("tok_id"))
    val withTok = stream
      .select(col(idCol), col(tsCol),
        TextAnalysis.tokens(lower(col(textCol))).as("__tk"))
      .withColumn("__hot", transform(col("__tk"), t => element_at(hotMap, t)))
      .withColumn("__cold", exists(col("__hot"), h => h.isNull))
    val fast = withTok.filter(!col("__cold"))
      .select(col(idCol), col(tsCol), col("__hot").as("ids"))
    val slow = withTok.filter(col("__cold"))
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol),
        posexplode(col("__tk")).as(Seq("__pos", "__token")))
      .join(residual.withColumnRenamed("token", "__token"), Seq("__token"), "left")
      .groupBy(col(idCol), col(tsCol))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"),
          coalesce(element_at(hotMap, col("__token")), col("tok_id"), lit(0L))
            .as("tid")))),
        p => p.getField("tid")).as("ids"))
    fast.unionByName(slow)
  }

  /** Vocabulary-growth curve (Heaps-law shape): distinct tokens seen in
    * the first N docs, for each threshold. Single-pass formulation:
    * growth(N) = #{tokens whose FIRST occurrence doc < N} — one
    * shuffle to (token → min doc), then the thresholds join runs on
    * the vocab-sized table, never the corpus. At 100 TB this is the
    * difference between one token-count-shaped shuffle and |thresholds|
    * full corpus scans. */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  thresholds: Seq[Long]): DataFrame = {
    val firsts = docs
      .select(col(idCol).as("did"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(min(col("did")).as("fd"))
    firsts
      .crossJoin(broadcast(
        docs.sparkSession.createDataFrame(
          thresholds.map(Tuple1(_))).toDF("n")))
      .filter(col("fd") < col("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("vocab_size"))
  }

  /** Out-of-vocabulary token rate per source against a fixed top-K
    * vocab — the coverage metric that decides tokenizer/vocab size.
    * Integer counts; the single final division is bit-identical across
    * engines. The vocab table is top-K-sized and broadcasts. */
  def oovRate(docs: DataFrame, textCol: String, groupCol: String,
              vocab: DataFrame): DataFrame =
    docs
      .select(col(groupCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(1).as("inv"))),
        Seq("token"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(groupCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
}

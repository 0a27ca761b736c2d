package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-statistics scoring operators — the information-theoretic tier
  * of the text-quality family (TextAnalysis covers the per-row scalar
  * signals; these need corpus or per-doc aggregation).
  *
  * All outputs that pass through a transcendental (log2) are rounded to
  * 6 decimals, not the house 9: log2 is not correctly rounded, so JVM
  * vs C-library results can differ in the final ulps, and the rounding
  * boundary must sit orders of magnitude above that divergence. Counts
  * stay integer-exact until the final per-group expression.
  */
object TextStats {

  /** Shannon entropy (bits/char) per document from exact character
    * counts: H = log2(n) - Σ c·log2(c) / n. One explode + two hash
    * aggregations; the shuffle carries (doc, char, count) — bounded by
    * doc count × charset size, never corpus bytes. */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(round(
        log2(sum(col("c")).cast("double")) -
          sum(col("c").cast("double") * log2(col("c").cast("double"))) /
            sum(col("c")).cast("double"), 6).as("entropy"))

  /** Mean corpus-unigram surprisal per document (avg -log2 p(token) =
    * avg log2(total/count), the cheap LM-perplexity proxy used as a
    * quality gate). The global count table is vocab-sized — orders
    * smaller than the corpus — so joining it back to the exploded
    * tokens broadcasts (or AQE-shuffles on token at extreme vocab),
    * never doc×doc. */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = docs.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("token"))
    val cnt = tk.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).cast("double").as("tot"))
    tk.join(cnt, "token")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(round(avg(log2(col("tot") / col("c").cast("double"))), 6)
        .as("surprisal"))
  }

  /** Top-k collocations by pointwise mutual information over a sliding
    * token window: PMI(a,b) = log2( p(a,b) / (p(a)·p(b)) ) with p from
    * integer window-pair and unigram counts. Pairs are ordered
    * (lesser, greater) so AB/BA collapse, and built BEFORE the explode
    * so the generate emits flat strings — O(n·w) pairs per doc, never
    * doc×doc. `minCount` floors the estimator's variance; ordering uses
    * the rounded score, so ranks are engine-stable. */
  def pmiPairs(docs: DataFrame, textCol: String, window: Int = 5,
               minCount: Long = 5, k: Int = 20): DataFrame = {
    val base = docs
      .select(TextAnalysis.tokens(lower(col(textCol))).as("tk"))
      .select(col("tk"), size(col("tk")).as("n"))
    val pairs = base.filter(col("n") >= 2)
      .select(explode(flatten(transform(sequence(lit(1), col("n") - 1),
        i => transform(sequence(i + 1, least(i + (window - 1), col("n"))),
          j => concat_ws(" ",
            least(element_at(col("tk"), i), element_at(col("tk"), j)),
            greatest(element_at(col("tk"), i), element_at(col("tk"), j))))))
      ).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
    val toks = base.select(explode(col("tk")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tc"))
    val totT = toks.agg(sum(col("tc")).cast("double").as("t_tot"))
    val totP = pairs.agg(sum(col("cnt")).cast("double").as("p_tot"))
    pairs.filter(col("cnt") >= minCount)
      .withColumn("t1", element_at(split(col("pair"), " "), 1))
      .withColumn("t2", element_at(split(col("pair"), " "), 2))
      .join(toks.select(col("token").as("t1"), col("tc").as("c1")), "t1")
      .join(toks.select(col("token").as("t2"), col("tc").as("c2")), "t2")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totP))
      .select(col("pair"), col("cnt"),
        round(log2((col("cnt").cast("double") / col("p_tot")) /
          ((col("c1").cast("double") / col("t_tot")) *
            (col("c2").cast("double") / col("t_tot")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("pair").asc).limit(k)
  }
}

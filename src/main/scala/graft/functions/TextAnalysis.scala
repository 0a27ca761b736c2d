package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents pipeline.
  *
  * All are compositions of built-in (codegen'd) functions — no Scala
  * UDFs — so they stay inside whole-stage codegen and push down through
  * Catalyst.
  */
object TextAnalysis {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: split on word/non-word boundaries so
    * punctuation and words count separately (a cheap proxy for a BPE
    * tokenizer's behavior on ASCII text). */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?<=\\W)(?=\\w)|(?<=\\w)(?=\\W)"),
      t => length(trim(t)) > 0))

  /** Alphabetic character ratio. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Punctuation ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0)).otherwise(
      aggregate(transform(tokens(text), t => length(t).cast("double")),
        lit(0.0), (acc, x) => acc + x) / tokenCount(text).cast("double"))

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "on", "for", "with", "as", "at", "by", "it", "that")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: balanced length, alpha-heavy,
    * some stopwords, low punctuation. Deterministic and
    * SQL-expressible for the oracle. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val q = lenScore * lit(0.25) + alphaRatio(text) * lit(0.35) +
      (lit(1.0) - punctRatio(text)) * lit(0.2) +
      least(stopwordRatio(text) * lit(4.0), lit(1.0)) * lit(0.2)
    round(q, 4)
  }
}

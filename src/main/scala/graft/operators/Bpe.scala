package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextAnalysis

/** BPE merge learning — the tokenizer-training step of a training-data
  * pipeline (Sennrich et al., "Neural Machine Translation of Rare Words
  * with Subword Units", ACL 2016).
  *
  * Scale shape: the corpus is touched ONCE, to build the word-frequency
  * table (one shuffle on the word). Everything iterative — pair
  * counting, the argmax, the merge application — runs on that
  * vocab-sized table (≪ corpus; Zipf guarantees it), so 100 TB of text
  * costs the same loop as 100 MB once the word counts exist. Each
  * round's argmax is ONE row collected to the driver: that row IS the
  * model being learned (the merge table), not data — the corpus never
  * moves. Merge application is a per-row codegen'd `aggregate` fold
  * (leftmost non-overlapping, standard BPE semantics), and each round
  * ends in `localCheckpoint` so the plan doesn't deepen per iteration
  * (see DedupCluster for the measured planning-cost cliff).
  *
  * Determinism: pair counts are integer, ties break on (left, right)
  * lexicographically — byte-identical merge tables on every run, every
  * cluster size.
  */
object Bpe {

  /** The learned merge table: (rank, left, right, pair_count), rank
    * 1-based in merge order. Stops early when no pair reaches
    * `minCount`. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // seed symbols: characters, with an end-of-word marker so merges
    // can distinguish "er" mid-word from "er</w>" word-final
    var vocab = words
      .select(col("cnt"),
        concat(filter(split(col("w"), ""), s => length(s) > 0),
          array(lit("</w>"))).as("syms"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val best = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) done = true
      else {
        val (l, rr, pc) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, rr, pc))
        vocab = vocab
          .select(col("cnt"), applyMerge(col("syms"), l, rr).as("syms"))
          .localCheckpoint(true)
        r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq.map(m => Row(m._1, m._2, m._3, m._4)), 1),
      StructType(Seq(StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Leftmost-non-overlapping merge of adjacent (l, r) into l+r via a
    * fold: "aaa" under (a,a) becomes [aa, a], matching reference BPE. */
  private[graft] def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Segment words with a learned merge table: replays the merges in
    * rank order over each word's character sequence — the inference
    * half of the tokenizer (broadcast-side model, pure projection, no
    * shuffle, no state; the streaming encoder composes with it the same
    * way Vocab.encoderFor ships its vocab). */
  def segment(docs: DataFrame, textCol: String, merges: Seq[(String, String)],
              outCol: String = "pieces"): DataFrame = {
    val start = concat(filter(split(col(textCol), ""), s => length(s) > 0),
      array(lit("</w>")))
    val folded = merges.foldLeft(start) { case (acc, (l, r)) => applyMerge(acc, l, r) }
    docs.withColumn(outCol, folded)
  }
}

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
  * costs the same loop as 100 MB once the word counts exist. Merge
  * application is a per-row codegen'd `aggregate` fold (leftmost
  * non-overlapping, standard BPE semantics), and each pass ends in
  * `localCheckpoint` so the plan doesn't deepen per iteration (see
  * DedupCluster for the measured planning-cost cliff).
  *
  * Driver-loop bound: merges are learned in BATCHES — each pass counts
  * pairs once, collects the top `maxBatch` rows, and accepts the
  * maximal pairwise-SYMBOL-DISJOINT PREFIX of that ranked list. The
  * prefix rule is exactly sequential-parity-preserving, not a
  * heuristic: a batch member's count cannot have changed when its
  * sequential turn comes (it shares no symbol with earlier members),
  * no skipped pair can overtake it (counts only decrease under merges,
  * and a prefix skips nothing), and any NEW pair (x, lr) that could
  * beat member P satisfies count(x,l) ≥ count(x,lr) > count(P) with
  * (x,l) conflicting with (l,r) — so the batch would have stopped
  * before P, a contradiction. BpeSpec asserts the parity empirically
  * (maxBatch=1 vs maxBatch=64, byte-identical merge tables). Cost:
  * ceil(numMerges / batch) passes × 2 jobs (one vocab-sized count +
  * one collect of ≤ maxBatch rows) instead of numMerges × 2 — a real
  * 30k-merge vocab runs in thousands, not tens of thousands, of Spark
  * jobs (empirical batch sizes on text run 4-20).
  *
  * Determinism: pair counts are integer, ties break on (left, right)
  * lexicographically — byte-identical merge tables on every run, every
  * cluster size, every maxBatch.
  */
object Bpe {

  /** The learned merge table: (rank, left, right, pair_count), rank
    * 1-based in merge order. Stops early when no pair reaches
    * `minCount`. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minCount: Long = 2L, maxBatch: Int = 64): DataFrame = {
    require(maxBatch >= 1, "maxBatch must be >= 1")
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
    var done = false
    while (merges.size < numMerges && !done) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l").asc, col("r").asc)
        .limit(maxBatch).collect()
      // maximal symbol-disjoint PREFIX (stop at the FIRST conflict —
      // skipping would break the sequential-parity proof above)
      val used = scala.collection.mutable.Set.empty[String]
      val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var i = 0
      var stop = false
      while (!stop && i < top.length && merges.size + batch.size < numMerges) {
        val (l, rr, pc) = (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
        // pc < minCount ends the BATCH, not the learning: merges already
        // accepted this pass may create NEW pairs above the floor, so
        // only an empty batch (true argmax below floor) terminates
        if (pc < minCount || used(l) || used(rr)) stop = true
        else { batch += ((l, rr, pc)); used += l; used += rr; i += 1 }
      }
      if (batch.isEmpty) done = true
      else {
        batch.foreach { case (l, rr, pc) =>
          merges += ((merges.size + 1, l, rr, pc))
        }
        // disjoint symbols ⇒ the folds commute; ONE select + checkpoint
        // applies the whole batch in a single pass over the vocab
        val foldedSyms = batch.foldLeft(col("syms")) {
          case (acc, (l, rr, _)) => applyMerge(acc, l, rr)
        }
        vocab = vocab
          .select(col("cnt"), foldedSyms.as("syms"))
          .localCheckpoint(true)
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

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
  * pairs once, collects the top `maxBatch` rows, and accepts a prefix
  * of COMPLETE count-tie classes whose members are pairwise disjoint
  * on consumed symbols {l, r} AND produced symbols {l+r} (a merge that
  * CREATES a symbol adds adjacencies for later pairs touching it, just
  * as consuming one removes them); the first conflict drops its whole
  * class and stops the batch, and an empty result falls back to the
  * argmax alone (always sequential-exact). See `disjointPrefix` for
  * the parity proof — per-member symbol-disjointness alone is NOT
  * enough, because a new pair created by an accepted member can TIE a
  * later member's count and win the lexicographic tie-break while its
  * conflict witness sorts after the victim; whole-class scanning is
  * what catches that witness. BpeSpec asserts the parity empirically
  * (maxBatch=1 vs maxBatch=64, byte-identical merge tables). Cost:
  * ceil(numMerges / batch) passes × 2 jobs (one vocab-sized count +
  * one collect of ≤ maxBatch rows) instead of numMerges × 2 — the
  * Zipf head has distinct counts (singleton classes, long clean
  * prefixes); the tied tail degrades toward sequential, which is the
  * price of exactness there.
  *
  * Determinism: pair counts are integer, ties break on (left, right)
  * lexicographically — byte-identical merge tables on every run, every
  * cluster size, every maxBatch.
  */
object Bpe {

  /** End-of-word marker symbol: a single private-use character OUTSIDE
    * the text alphabet by construction — learnMerges/segment strip it
    * from the input first (a single-char deletion, so the strip is
    * idempotent and cannot re-form the marker, unlike stripping a
    * multi-char marker like "</w>" whose characters are ordinary text).
    * Because no seed symbol ever equals the marker char and a produced
    * symbol is a concatenation of contiguous seed chars, NO produced
    * symbol can collide with the marker — the freshness assumption the
    * batching parity proof rests on (count(new pair) ≤ pre-count of its
    * witness) holds unconditionally. */
  val Marker: String = "\uE000"

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
    // seed symbols: CODE POINTS (regexp_extract_all('(?s).') — Java
    // regex `.` matches one code point, so a surrogate pair stays one
    // symbol; `split(w, "")` semantics vary per engine on non-BMP
    // text), with the end-of-word marker so merges can distinguish
    // "er" mid-word from word-final "er"+Marker; the marker char is
    // stripped from the input first so it stays outside the symbol
    // alphabet (see Marker)
    var vocab = words
      .select(col("cnt"),
        concat(codepoints(regexp_replace(col("w"), Marker, "")),
          array(lit(Marker))).as("syms"))
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
      val batch = disjointPrefix(
        top.toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2))),
        minCount, numMerges - merges.size, truncated = top.length == maxBatch)
      if (batch.isEmpty) done = true
      else {
        batch.foreach { case (l, rr, pc) =>
          merges += ((merges.size + 1, l, rr, pc))
        }
        // ONE select + checkpoint applies the whole batch in a single
        // pass over the vocab, folding the merges in RANKED order — a
        // later member may consume a symbol an earlier member produced,
        // so order matters; parity comes from disjointPrefix admitting
        // only batches whose ranked-order fold equals the sequential
        // merge-by-merge replay (see its proof), not from commutativity
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

  /** Maximal sequential-parity-safe batch from one pass's ranked pair
    * list: a prefix of COMPLETE count-tie classes, each scanned end to
    * end against a conflict set holding every accepted member's l, r
    * AND produced symbol l+r. The first conflicting row drops its
    * ENTIRE class and ends the batch; if nothing survives, the argmax
    * alone is returned (one merge is sequential by definition).
    *
    * Why classes, not rows — the parity proof. At member M_m's
    * sequential turn the table differs from the pre-count only by
    * M_1..M_{m-1}: M_m's own count is exact (disjoint from all
    * consumed AND produced symbols), destroyed/decreased pairs can't
    * overtake, and every NEW pair N created by M_j=(l,r) replaces a
    * destroyed witness — (x,lr) replaces (x,l), (lr,y) replaces (r,y)
    * — so count(N) ≤ pre-count(witness) and the witness shares a
    * symbol with M_j. If count(N) > count(M_m), the witness pre-ranked
    * strictly before M_m, was scanned, and conflicted — the batch
    * would have stopped before M_m. If count(N) == count(M_m) (the TIE
    * case the per-row rule misses), the witness sits in M_m's OWN tie
    * class, possibly lex-after M_m — e.g. accepting (i,n) creates
    * (in,</w>) whose witness (n,</w>) sorts after victim
    * (ing,ing</w>) — so the class must be scanned completely before
    * any of it is committed; a conflict anywhere voids the whole
    * class. A class whose count equals the last collected row's count
    * may be truncated by the `maxBatch` window (`truncated`), so it
    * cannot be proven complete and is not committed; likewise a class
    * that doesn't fit in `room` is dropped whole, since a partial
    * class is exactly the unsafe shape.
    *
    * A below-`minCount` class ends the BATCH, not the learning: merges
    * already accepted this pass may create NEW pairs above the floor,
    * so only an empty batch (true argmax below floor) terminates the
    * caller's loop. */
  private[graft] def disjointPrefix(top: Seq[(String, String, Long)], minCount: Long,
                                    room: Int, truncated: Boolean): Seq[(String, String, Long)] = {
    val committed = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val used = scala.collection.mutable.Set.empty[String]
    val cutoff = if (truncated && top.nonEmpty) top.last._3 else Long.MinValue
    var i = 0
    var stop = false
    while (!stop && i < top.length) {
      val c = top(i)._3
      var j = i
      while (j < top.length && top(j)._3 == c) j += 1 // class = rows [i, j)
      if (c < minCount || c == cutoff || committed.size + (j - i) > room) stop = true
      else {
        val classUsed = scala.collection.mutable.Set.empty[String]
        var clean = true
        var k = i
        while (clean && k < j) {
          val (l, rr, _) = top(k)
          if (used(l) || used(rr) || classUsed(l) || classUsed(rr)) clean = false
          else { classUsed += l; classUsed += rr; classUsed += (l + rr); k += 1 }
        }
        if (!clean) stop = true
        else { committed ++= top.slice(i, j); used ++= classUsed; i = j }
      }
    }
    if (committed.isEmpty && room >= 1 && top.nonEmpty && top.head._3 >= minCount)
      Seq(top.head)
    else committed.toSeq
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
    val start = concat(codepoints(regexp_replace(col(textCol), Marker, "")),
      array(lit(Marker)))
    val folded = merges.foldLeft(start) { case (acc, (l, r)) => applyMerge(acc, l, r) }
    docs.withColumn(outCol, folded)
  }

  /** Code-point split: one array element per Unicode code point.
    * `regexp_extract_all('(?s).')` — Java regex `.` consumes a whole
    * code point (a surrogate pair stays together), DOTALL so newlines
    * count too; the identical RE2 pattern in an external oracle yields
    * the same rune split, unlike `split(s, "")` (UTF-16 units on some
    * engines, grapheme clusters on others). */
  private[graft] def codepoints(c: Column): Column =
    regexp_extract_all(c, lit("(?s)."), lit(0))
}

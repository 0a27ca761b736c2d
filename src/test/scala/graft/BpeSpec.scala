package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  test("learnMerges replays the hand-computed BPE on a tiny corpus") {
    // corpus: "low low low lower lower newest newest newest newest"
    //   low ×3, lower ×2, newest ×4 (all one doc; counts are per
    //   word occurrence)
    val docs = Seq("low low low lower lower newest newest newest newest")
      .toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 4, minCount = 1L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (w,e) = 2 (lower) + 4 (newest) = 6 beats (l,o)=(o,w)=5
    assert(merges(0) == ((1, "w", "e", 6L)))
    // round 2: lower→[l,o,we,r,</w>], newest→[n,e,we,s,t,</w>];
    // (l,o)=5 is now the unique max
    assert(merges(1) == ((2, "l", "o", 5L)))
    // round 3: max is 4, tied on every newest-internal pair; the
    // lexicographic tie-break picks left="e": (e,we)
    assert(merges(2) == ((3, "e", "we", 4L)))
    // round 4: newest→[n,ewe,s,t,</w>]; tie at 4 → left="ewe" sorts
    // before "n"/"s"/"t": (ewe,s)
    assert(merges(3) == ((4, "ewe", "s", 4L)))
  }

  test("applyMerge is leftmost-non-overlapping") {
    val df = Seq(Seq("a", "a", "a", "a", "a")).toDF("syms")
    val out = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(out == Seq("aa", "aa", "a"))
  }

  test("segment replays a merge table onto unseen words") {
    val docs = Seq("lowest").toDF("w")
    val out = Bpe.segment(docs, "w", Seq(("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")))
      .head().getSeq[String](1)
    assert(out == Seq("low", "est", "</w>"))
  }

  test("batched passes are parity-exact with the sequential merge loop") {
    // maxBatch=1 IS the sequential reference (one argmax per pass);
    // the symbol-disjoint prefix rule must reproduce it byte-for-byte
    // (see the proof in Bpe's scaladoc) while spending far fewer passes
    val docs = table("documents")
    val sequential = Bpe.learnMerges(docs, "text", 12, maxBatch = 1)
      .collect().map(_.toSeq).toSeq
    val batched = Bpe.learnMerges(docs, "text", 12, maxBatch = 64)
      .collect().map(_.toSeq).toSeq
    assert(batched == sequential && sequential.size == 12)
  }

  test("merge table is deterministic across repeated runs") {
    val docs = table("documents").limit(50)
    val a = Bpe.learnMerges(docs, "text", 5).collect().toSeq
    val b = Bpe.learnMerges(docs, "text", 5).collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}

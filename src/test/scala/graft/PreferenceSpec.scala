package graft

import org.apache.spark.sql.functions._
import graft.operators.Preference

/** Bradley–Terry: the fused one-task MM (production path) must replay
  * the unrolled engine-side trajectory bit for bit — same contract as
  * the fused-vs-unrolled MMR parity in AnnSpec. The DuckDB oracle
  * replays the unrolled CTE chain, so fused ≡ unrolled is what makes
  * the oracle hash-compare meaningful for the shipped plan. */
class PreferenceSpec extends SparkSpec {

  /** Directed doubled-win table: A, B, C with 4 comparisons per pair
    * (n = 2 each); w2(i→j) + w2(j→i) = 2·nn = 8. A dominates, C is a
    * coin vs B. */
  private def handPairs = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", "B", 6L, 4L), ("B", "A", 2L, 4L),
      ("A", "C", 5L, 4L), ("C", "A", 3L, 4L),
      ("B", "C", 4L, 4L), ("C", "B", 4L, 4L)
    ).toDF("i", "jj", "w2", "nn")
  }

  test("fused MM replays the unrolled trajectory row-identically") {
    val fused = Preference.btFused(handPairs).collect().toSet
    val unrolled = Preference.btUnrolled(handPairs).collect().toSet
    assert(fused == unrolled,
      s"fused=$fused\nunrolled=$unrolled")
  }

  test("strengths respect dominance and renormalize to ~1") {
    val rows = Preference.btFused(handPairs)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("A") > rows("B") && rows("A") > rows("C"),
      s"A must dominate: $rows")
    // C edges B: C beat A more than B did (3 vs 2), coin between them
    assert(rows("C") > rows("B"), s"C edges B on the A results: $rows")
    val sp = rows.values.sum
    assert(math.abs(sp - 1.0) < 1e-6, s"sum(p) = $sp after renormalize")
    // wins2 column carries the integer doubled win totals
    val wins = Preference.btFused(handPairs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wins == Map("A" -> 11L, "B" -> 6L, "C" -> 7L), wins.toString)
  }

  test("degenerate tables fail LOUDLY in both paths; duplicates rejected") {
    val s = spark
    import s.implicits._
    def rootMsg(t: Throwable): String = {
      var cur = t; val sb = new StringBuilder
      while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
      sb.toString
    }

    // Z and Y never win anything (their head-to-head rows carry w2=0
    // both ways — violating the doubled-win invariant): both hit
    // strength 0 after one MM step, so the (Z, Y) term is
    // 2·nn/(0+0) = Inf. Under Spark 4 ANSI the UNROLLED twin throws
    // DIVIDE_BY_ZERO at that step; the fused path must not surface a
    // baffling BigDecimal.valueOf(Inf) NumberFormatException — it
    // fails with the degeneracy named.
    val degenerate = Seq(
      ("A", "Z", 8L, 4L), ("Z", "A", 0L, 4L),
      ("A", "Y", 8L, 4L), ("Y", "A", 0L, 4L),
      ("Z", "Y", 0L, 4L), ("Y", "Z", 0L, 4L)
    ).toDF("i", "jj", "w2", "nn")
    val eFused = intercept[org.apache.spark.SparkException] {
      Preference.btFused(degenerate).collect()
    }
    assert(rootMsg(eFused).contains("degenerate MM term"))
    val eUnrolled = intercept[Throwable] {
      Preference.btUnrolled(degenerate).collect()
    }
    assert(rootMsg(eUnrolled).contains("DIVIDE_BY_ZERO"),
      s"unrolled twin crashes at the same step under ANSI: ${rootMsg(eUnrolled)}")

    // duplicate directed pair: the contract is one row per (i, jj) —
    // enforced with the mechanism named, not a silent nn overwrite
    // that diverges from the unrolled twin's per-row term sums
    val dup = handPairs.union(Seq(("A", "B", 6L, 4L)).toDF("i", "jj", "w2", "nn"))
    val eDup = intercept[org.apache.spark.SparkException] {
      Preference.btFused(dup).collect()
    }
    assert(rootMsg(eDup).contains("duplicate directed pair"))

    // nn=0 everywhere for an arm: the update denominator is 0 and the
    // strength undefined — loud in the fused path too
    val uncompared = Seq(
      ("Z", "Y", 0L, 0L), ("Y", "Z", 0L, 0L)
    ).toDF("i", "jj", "w2", "nn")
    val eDeg = intercept[org.apache.spark.SparkException] {
      Preference.btFused(uncompared).collect()
    }
    assert(rootMsg(eDeg).contains("undefined MM update"))
  }

  test("parity holds on the sf0.001 events-derived pair table") {
    // the registered query end-to-end vs the unrolled twin fed the
    // same pair table: build pairs exactly as q_bradley_terry does
    val df = SparkEntry.queries("q_bradley_terry")(spark, sf)
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && math.abs(got.map(_._3).sum - 1.0) < 1e-6)
    // deterministic across two constructions (checkpoint ids differ;
    // values must not)
    val again = SparkEntry.queries("q_bradley_terry")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == again)
  }
}

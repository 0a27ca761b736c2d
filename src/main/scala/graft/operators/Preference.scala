package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.BoundedWindow.boundedGlobal

/** Bradley–Terry pairwise-preference fitting (Bradley & Terry 1952;
  * Hunter 2004 MM) — the model behind RLHF reward fitting and
  * arena-style leaderboards.
  *
  * Input: a DIRECTED doubled-win pair table `(i, jj, w2, nn)` — player
  * i, opponent jj, doubled wins of i over jj (ties split, so
  * w2(i→jj) + w2(jj→i) = 2·nn), and nn = the number of i-vs-jj
  * comparisons. Players are DOMAIN-sized by contract (event arms,
  * model variants), so the k²-row table is never data-sized.
  *
  * Two formulations of the same fixed-step MM trajectory:
  *
  *  - [[btFused]] — the production path: the k²-row table funnels to
  *    ONE task and the whole iteration loop runs fused inside it (one
  *    job). The unrolled DataFrame twin spends ~30 broadcast-join /
  *    checkpoint stages on k-row tables — measured 7.3 s vs ~1.5 s at
  *    sf0.1, all fixed cost, none of it data-sized. Same pattern as
  *    the fused MMR greedy (Ann.scala:83).
  *  - [[btUnrolled]] — the engine-side twin: each MM step as joins +
  *    window normalize with a per-2-steps localCheckpoint (unchecked
  *    lineage triples per step; 3^10 hung analysis — measured). Kept
  *    as the parity reference: PreferenceSpec asserts row-identical
  *    output, and the DuckDB oracle replays the identical unrolled CTE
  *    chain.
  *
  * Both replay the identical arithmetic, bit for bit: every division
  * is rounded to 9 decimals (Spark's round = BigDecimal HALF_UP —
  * replayed locally in the fused path, the q_mmr round9 rule), and
  * every Σ-term accumulator is an exact scale-9 decimal sum
  * (order-free), so fused, unrolled, and the oracle agree on the hash.
  *
  * Degenerate inputs fail LOUDLY in both paths, never silently
  * diverge: a duplicate directed (i, jj) row, a pair of zero-win arms
  * sharing a pair row (both strengths hit 0, the MM term divides by
  * zero), or an arm compared nowhere (nn=0 everywhere) raise a clear
  * error in the fused path; the unrolled twin raises ANSI
  * DIVIDE_BY_ZERO at the same step (PreferenceSpec pins both).
  */
object Preference {

  /** Fixed-iteration MM, fused into one task (see object doc). Output:
    * (arm, wins2 = Σ_j w2(arm→j) as long, p) — strengths renormalized
    * to Σp = 1 after every step, k rows, unordered. */
  def btFused(pairs: DataFrame, iters: Int = 10): DataFrame = {
    val session = pairs.sparkSession
    import session.implicits._
    val typed = pairs.select(col("i").cast("string"),
        col("jj").cast("string"),
        col("w2").cast("decimal(28,0)"), col("nn").cast("decimal(28,0)"))
      .as[(String, String, java.math.BigDecimal, java.math.BigDecimal)]
    typed.groupByKey(_ => true)
      .flatMapGroups { (_, rows) =>
        val rs = rows.toArray // k² rows, domain-sized by contract
        val players = rs.map(_._1).distinct.sorted
        val idx = players.zipWithIndex.toMap
        val k = players.length
        val w2tot = Array.fill(k)(BigInt(0))
        val nnD = Array.ofDim[Double](k, k) // CAST(nn AS DOUBLE)
        val hasPair = Array.ofDim[Boolean](k, k)
        rs.foreach { case (a, b, w2, nn) =>
          val ia = idx(a); val ib = idx(b)
          // at most one row per directed (i, jj): a duplicate would
          // double-count w2tot but OVERWRITE nnD — silently diverging
          // from the unrolled twin, which sums per-row denominator
          // terms. Enforce the stated contract loudly (k² rows — the
          // check is free).
          require(!hasPair(ia)(ib),
            s"btFused: duplicate directed pair ($a, $b) in the doubled-win " +
              "table — pre-aggregate duplicates (groupBy(i, jj).sum) before " +
              "fitting")
          w2tot(ia) += BigInt(w2.toBigInteger)
          nnD(ia)(ib) = nn.doubleValue
          hasPair(ia)(ib) = true
        }
        // CAST(w2tot AS DOUBLE) — BigInteger.doubleValue is the same
        // correctly-rounded nearest conversion both engines apply
        val w2totD = w2tot.map(_.bigInteger.doubleValue)
        var p = Array.fill(k)(round9(1.0 / k.toDouble))
        var t = 0
        while (t < iters) {
          val u = new Array[Double](k)
          var i = 0
          while (i < k) {
            // Σ_j CAST(ROUND(2.0·nn/(p_i+p_j), 9) AS DECIMAL(28,9)) —
            // exact decimal accumulation, order-free
            var dd = java.math.BigDecimal.ZERO
            var j = 0
            while (j < k) {
              if (hasPair(i)(j)) {
                val term = round9(2.0 * nnD(i)(j) / (p(i) + p(j)))
                // Degenerate pair: both arms at strength 0 (a zero-win
                // arm hits p=0 after one MM step; two such arms sharing
                // a pair row violate the doubled-win invariant) makes
                // this term 2·nn/0 = Inf. The unrolled twin throws
                // ANSI DIVIDE_BY_ZERO at the same step; here
                // BigDecimal.valueOf(Inf) would surface as a baffling
                // NumberFormatException — fail loudly with the
                // degeneracy named instead (PreferenceSpec pins both).
                if (term.isNaN || term.isInfinite)
                  throw new IllegalStateException(
                    s"btFused: degenerate MM term for pair " +
                      s"('${players(i)}', '${players(j)}') at iteration $t — " +
                      s"both arms at strength 0 (p_i=${p(i)}, p_j=${p(j)}); " +
                      "the doubled-win invariant w2(i,j)+w2(j,i)=2*nn is " +
                      "violated (both arms have zero total wins yet a shared " +
                      "pair row); drop zero-win arms before fitting. The " +
                      "unrolled twin raises DIVIDE_BY_ZERO here under ANSI.")
                dd = dd.add(java.math.BigDecimal.valueOf(term).setScale(9))
              }
              j += 1
            }
            u(i) = round9(w2totD(i) / dd.doubleValue)
            // dd can still be exactly 0 (every pair row for this arm
            // has nn=0): the strength update is undefined, and the
            // unrolled twin raises DIVIDE_BY_ZERO on w2tot/dd under
            // ANSI. Same loud contract.
            if (u(i).isNaN || u(i).isInfinite)
              throw new IllegalStateException(
                s"btFused: arm '${players(i)}' has an undefined MM update " +
                  s"at iteration $t (denominator ${dd.doubleValue}) — every " +
                  "pair row for it carries nn=0; drop uncompared arms " +
                  "before fitting. The unrolled twin raises DIVIDE_BY_ZERO " +
                  "here under ANSI.")
            i += 1
          }
          var sp = java.math.BigDecimal.ZERO
          var x = 0
          while (x < k) {
            sp = sp.add(java.math.BigDecimal.valueOf(u(x)).setScale(9))
            x += 1
          }
          val spD = sp.doubleValue
          val pn = new Array[Double](k)
          i = 0
          while (i < k) { pn(i) = round9(u(i) / spD); i += 1 }
          p = pn
          t += 1
        }
        players.indices.iterator.map(i => (players(i), w2tot(i).toLong, p(i)))
      }
      .toDF("arm", "wins2", "p")
  }

  /** The engine-side unrolled twin (see object doc): each step is a
    * k²-pair join + window normalize, checkpointed every second step.
    * Parity reference only — same output schema as [[btFused]]. */
  def btUnrolled(pairs0: DataFrame, iters: Int = 10): DataFrame = {
    def nd(c: Column) = c.cast("double")
    val pairs = pairs0.select(col("i").cast("string"),
        col("jj").cast("string"),
        col("w2").cast("decimal(28,0)"), col("nn").cast("decimal(28,0)"))
      .localCheckpoint(true) // feeds every iteration
    val wins = pairs.groupBy(col("i")).agg(sum(col("w2")).as("w2tot"))
    val arms = pairs.select(col("i")).distinct()
    val kTab = arms.agg(count(lit(1)).as("k"))
    var p = arms.crossJoin(broadcast(kTab))
      .select(col("i"), round(lit(1.0) / nd(col("k")), 9).as("p"))
    for (it <- 1 to iters) {
      val d = pairs
        .join(p.select(col("i"), col("p").as("pi")), "i")
        .join(p.select(col("i").as("j2"), col("p").as("pj")),
          col("jj") === col("j2"))
        .select(col("i"),
          round(lit(2.0) * nd(col("nn")) / (col("pi") + col("pj")), 9)
            .cast("decimal(28,9)").as("term"))
        .groupBy(col("i")).agg(sum(col("term")).as("dd"))
      val upd = wins.join(d, "i")
        .select(col("i"),
          round(nd(col("w2tot")) / nd(col("dd")), 9).as("p"))
      // normalizer Σp rides a bounded global window over the k-row
      // state (no agg + crossJoin + broadcast round trip per step)
      val wAll = boundedGlobal("k-row strength table")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // each step references the previous p three times (pi, pj, and
      // inside the normalizer), so unchecked lineage grows ~3x per
      // step (3^10 hung analysis outright — measured); checkpoint the
      // k-row state every SECOND step to hold plan depth bounded
      p = upd
        .withColumn("sp", sum(col("p").cast("decimal(28,9)")).over(wAll))
        .select(col("i"), round(col("p") / nd(col("sp")), 9).as("p"))
      if (it % 2 == 0) p = p.localCheckpoint(true)
    }
    p.join(wins, "i")
      .select(col("i").as("arm"), col("w2tot").cast("long").as("wins2"),
        col("p"))
  }

  /** Spark's `round(x, 9)` replayed locally: BigDecimal.valueOf +
    * HALF_UP, NaN/Inf pass through (RoundBase's DoubleType branch —
    * the q_mmr fused-greedy rule, Ann.scala:148). */
  private def round9(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
}

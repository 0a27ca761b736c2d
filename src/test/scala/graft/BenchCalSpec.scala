package graft

import org.scalatest.funsuite.AnyFunSuite

/** Calibration-sentinel grading (r14 verdict item 2 + advice). Pure
  * functions, no SparkSession: reference adoption from a committed
  * record and the per-probe drift verdict.
  */
class BenchCalSpec extends AnyFunSuite {

  private val record =
    """{"metric":"top10","value":0.22,
      |"calibration":{"pass_1":{"q_top10_tokens":0.36,"q_bpe_encode":2.70,"drift":1.06},
      |"pass_2":{"q_top10_tokens":0.22,"q_bpe_encode":2.75,"drift":1.03},
      |"refs":{"q_top10_tokens":0.10,"q_bpe_encode":2.60}},
      |"contended":false,"_total":244.5}""".stripMargin

  test("calRefFromRecord adopts the min across pass readings, not the refs echo") {
    // refs echo carries 0.10 — folding it in would ratchet downward
    assert(Bench.calRefFromRecord(record, "q_top10_tokens").contains(0.22))
    assert(Bench.calRefFromRecord(record, "q_bpe_encode").contains(2.70))
  }

  test("calRefFromRecord refuses a contended record (ratchet-up guard)") {
    val contended = record.replace("\"contended\":false", "\"contended\":true")
    assert(Bench.calRefFromRecord(contended, "q_top10_tokens").isEmpty)
    assert(Bench.calRefFromRecord(contended, "q_bpe_encode").isEmpty)
  }

  test("calRefFromRecord ignores probe_drift RATIO echoes (r15 false-contention bug)") {
    // per-probe grading writes each probe's NAME with its drift RATIO
    // inside every pass block; caught live: the ~1.0x ratios were
    // adopted as seconds (2.61 -> 1.03 for the bpe probe) and an
    // honest run graded ~2.9x "contended" against a ref that was
    // never a time
    val withRatios =
      """{"metric":"top10","value":0.22,
        |"calibration":{"pass_1":{"q_top10_tokens":0.26,"q_bpe_encode":2.69,
        |"drift":1.0,"probe_drift":{"q_top10_tokens":0.76,"q_bpe_encode":1.03},"drifted":false},
        |"pass_2":{"q_top10_tokens":0.33,"q_bpe_encode":2.72,
        |"drift":1.03,"probe_drift":{"q_top10_tokens":0.95,"q_bpe_encode":1.04},"drifted":false},
        |"refs":{"q_top10_tokens":0.35,"q_bpe_encode":2.61}},
        |"contended":false,"_total":244.5}""".stripMargin
    assert(Bench.calRefFromRecord(withRatios, "q_bpe_encode").contains(2.69))
    assert(Bench.calRefFromRecord(withRatios, "q_top10_tokens").contains(0.26))
  }

  test("calRefFromRecord is None without a calibration block or probe reading") {
    assert(Bench.calRefFromRecord("""{"contended":false}""", "q_top10_tokens").isEmpty)
    assert(Bench.calRefFromRecord(record, "q_nonexistent_probe").isEmpty)
  }

  test("gradePass flags a pass when ANY probe drifts >1.5x, even if the sum hides it") {
    // the r14 record's own pass 1: flagship 1.64x, aggregate 1.06
    val refs = Map("q_top10_tokens" -> 0.22, "q_bpe_encode" -> 2.68)
    val readings = Seq("q_top10_tokens" -> 0.36, "q_bpe_encode" -> 2.70)
    val (ratios, agg, drifted) = Bench.gradePass(readings, refs)
    assert(drifted, s"per-probe grading must catch the masked flagship drift: $ratios")
    assert(agg < 1.5, s"the aggregate alone would NOT have flagged it: $agg")
    assert(ratios.toMap.apply("q_top10_tokens") > 1.6)
  }

  test("gradePass stays quiet when every probe is within 1.5x") {
    val refs = Map("q_top10_tokens" -> 0.22, "q_bpe_encode" -> 2.68)
    val (_, agg, drifted) = Bench.gradePass(
      Seq("q_top10_tokens" -> 0.25, "q_bpe_encode" -> 2.90), refs)
    assert(!drifted)
    assert(math.abs(agg - (0.25 + 2.90) / (0.22 + 2.68)) < 1e-9)
  }
}

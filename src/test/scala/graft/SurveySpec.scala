package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 ↔ `SparkEntry.queries` bijection guard.
  *
  * The coverage bar is defined over SURVEY §2; round 8 shipped three
  * queries that existed only in code and were invisible to it. This
  * spec makes that drift structurally impossible in both directions:
  * every `q_*` key in `SparkEntry.queries` must be referenced by a
  * SURVEY §2 row, and every backticked `q_*` query key in §2 must
  * exist in `queries`. Runs without a SparkSession — pure parsing.
  */
class SurveySpec extends AnyFunSuite {

  private lazy val surveyKeys: Set[String] = {
    val text = {
      val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try src.mkString finally src.close()
    }
    // §2 spans from its header to §3; query keys appear backticked in
    // the "Query key" column (sometimes alongside an operator name).
    val s2 = text.substring(text.indexOf("## §2"), text.indexOf("## §3"))
    "`(q_[a-z0-9_]+)`".r.findAllMatchIn(s2).map(_.group(1)).toSet
  }

  private lazy val queryKeys: Set[String] = SparkEntry.queries.keySet

  test("every SparkEntry query key has a SURVEY §2 row") {
    // q1_agg is the one non-q_-prefixed key; it is referenced in §2.2
    // by name — assert it separately, regex covers the rest.
    val missing = queryKeys.filter(_.startsWith("q_")) -- surveyKeys
    assert(missing.isEmpty,
      s"queries absent from SURVEY §2 (add rows): ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every SURVEY §2 query key exists in SparkEntry.queries") {
    val stale = surveyKeys -- queryKeys
    assert(stale.isEmpty,
      s"SURVEY §2 references unknown query keys (stale rows): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("no duplicate query keys in the SparkEntry source") {
    // A Scala Map literal silently keeps the LAST binding for a
    // repeated key — a new query accidentally reusing an existing name
    // would shadow one of the two with no compile error and no runtime
    // signal (caught live in r9: five added queries collided with
    // existing ones and vanished). Guard at the SOURCE level: every
    // `"name" ->` key may appear at most twice (once in `queries`,
    // once in `oracleSql`).
    val text = {
      val src = scala.io.Source.fromFile(
        "src/main/scala/graft/SparkEntry.scala", "UTF-8")
      try src.mkString finally src.close()
    }
    val counts = "\"(q_[a-z0-9_]+|q1_agg)\" ->".r.findAllMatchIn(text)
      .map(_.group(1)).toSeq.groupBy(identity).view.mapValues(_.size)
    val dups = counts.filter(_._2 > 2).keys.toSeq.sorted
    assert(dups.isEmpty,
      s"query keys bound more than twice in SparkEntry.scala (map " +
        s"last-wins shadowing): ${dups.mkString(", ")}")
  }

  test("every query key has an oracle or a documented rows-only check") {
    // Every key in `queries` should either carry an oracle or be a
    // deliberate rows-only entry. Today every q_* key is oracled;
    // guard that invariant so a future key can't silently ship
    // without its correctness contract.
    val unoracled = queryKeys -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty,
      s"queries without oracle SQL: ${unoracled.toSeq.sorted.mkString(", ")}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-only dtype lint over EVERY oracle string: DuckDB `SUM(BIGINT)`
  * widens to HUGEINT, pandas renders HUGEINT as float64, and the
  * driver's hash canonicalization then sees `42.0` against Spark's
  * `42` — driver-red with rows/schema green (the r7..r9
  * q_kmeans/q_bpe_encode/q_substring_dedup/q_curriculum class). This
  * spec fails `sbt test` the moment a new oracle ships an uncast
  * integer aggregate, instead of round N+2's driver run.
  *
  * The lint DESCRIBEs each oracle in DuckDB (via tools/oracle_lint.py
  * — a regex can't know column types; 72 of the 355 SUM call sites
  * are legitimately uncast). Skips cleanly if python3/duckdb are
  * unavailable; in that case the same lint still runs inside
  * tools/oracle_check.py on every gate.sh pass.
  *
  * The DESCRIBE dump is computed ONCE in a lazy val shared by both
  * tests — each test is self-contained (runs correctly in isolation
  * or any order), not dependent on a sibling test's side effect.
  */
class OracleLintSpec extends AnyFunSuite {

  test("no oracle emits driver-unhashable output types (HUGEINT)") {
    assume(lintRun.isDefined, "python3/duckdb absent")
    val run = lintRun.get
    assert(run.code == 0, s"oracle_lint failed:\n${run.out}")
  }

  test("every query's Spark schema matches its oracle's output columns") {
    // alias drift between a Spark .as(...) and the SQL AS is the most
    // common oracle-compare failure (the driver sorts columns by name
    // before hashing) — catch it plan-only at sbt-test time.
    assume(lintRun.isDefined, "python3/duckdb absent")
    assume(lintRun.get.code == 0, "lint itself failed; reported by the other test")
    val cols = lintRun.get.cols
    val drift = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      try {
        val sparkCols = SparkEntry.queries(name)(spark, SparkSpec.Sf)
          .columns.toSeq.sorted
        val duckCols = cols.getOrElse(name, Nil).sorted
        if (sparkCols != duckCols)
          Some(s"$name: spark=$sparkCols oracle=$duckCols")
        else None
      } catch { case _: Throwable => None } // build failures fail elsewhere
      finally spark.catalog.clearCache()
    }
    assert(drift.isEmpty, drift.mkString("\n"))
  }

  private case class LintRun(code: Int, out: String,
                             cols: Map[String, Seq[String]])

  /** One lint subprocess run, shared by both tests. None = python3 or
    * the duckdb module is unavailable (tests assume-skip). */
  private lazy val lintRun: Option[LintRun] = {
    val havePy = (new ProcessBuilder(
      "bash", "-c", "command -v python3 || true")).start()
    havePy.waitFor()
    val pyPath = scala.io.Source.fromInputStream(havePy.getInputStream)
      .mkString.trim
    if (pyPath.isEmpty) None
    else {
      val probe = new ProcessBuilder("python3", "-c", "import duckdb").start()
      if (probe.waitFor() != 0) None
      else {
        val json = JsonUtil.obj(SparkEntry.oracleSql)
        val f = java.nio.file.Files.createTempFile("oracle_sql", ".json")
        val colsF = java.nio.file.Files.createTempFile("oracle_cols", ".json")
        java.nio.file.Files.writeString(f, json)
        val pb = new ProcessBuilder(
          "python3", "tools/oracle_lint.py", f.toString, SparkSpec.Sf,
          colsF.toString)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
        val code = p.waitFor()
        java.nio.file.Files.deleteIfExists(f)
        val cols =
          if (code == 0) parseCols(java.nio.file.Files.readString(colsF))
          else Map.empty[String, Seq[String]]
        java.nio.file.Files.deleteIfExists(colsF)
        Some(LintRun(code, out, cols))
      }
    }
  }

  private def spark = SparkSpec.spark

  /** Minimal parser for the {"name": ["c1","c2"], ...} dump (no JSON
    * lib on the classpath; names and column identifiers contain no
    * escapes by construction — they are SQL identifiers). */
  private def parseCols(s: String): Map[String, Seq[String]] =
    "\"([^\"]+)\"\\s*:\\s*\\[([^\\]]*)\\]".r.findAllMatchIn(s).map { m =>
      m.group(1) ->
        "\"([^\"]*)\"".r.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
    }.toMap
}

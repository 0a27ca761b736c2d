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
  */
class OracleLintSpec extends AnyFunSuite {

  test("no oracle emits driver-unhashable output types (HUGEINT)") {
    val python = Seq("bash", "-c", "command -v python3 || true")
    val havePy = (new ProcessBuilder(python: _*)).start()
    havePy.waitFor()
    val pyPath = scala.io.Source.fromInputStream(havePy.getInputStream).mkString.trim
    assume(pyPath.nonEmpty, "python3 not on PATH")
    val probe = new ProcessBuilder("python3", "-c", "import duckdb").start()
    assume(probe.waitFor() == 0, "duckdb module unavailable")

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
    oracleCols = if (code == 0) Some(parseCols(
      java.nio.file.Files.readString(colsF))) else None
    java.nio.file.Files.deleteIfExists(colsF)
    assert(code == 0, s"oracle_lint failed:\n$out")
  }

  test("every query's Spark schema matches its oracle's output columns") {
    // alias drift between a Spark .as(...) and the SQL AS is the most
    // common oracle-compare failure (the driver sorts columns by name
    // before hashing) — catch it plan-only at sbt-test time. Depends
    // on the DESCRIBE dump from the previous test; skips if that
    // skipped.
    assume(oracleCols.isDefined, "no DESCRIBE dump (python3/duckdb absent)")
    val cols = oracleCols.get
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

  @volatile private var oracleCols: Option[Map[String, Seq[String]]] = None

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

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
    java.nio.file.Files.writeString(f, json)
    val pb = new ProcessBuilder(
      "python3", "tools/oracle_lint.py", f.toString, SparkSpec.Sf)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val code = p.waitFor()
    java.nio.file.Files.deleteIfExists(f)
    assert(code == 0, s"oracle_lint failed:\n$out")
  }
}

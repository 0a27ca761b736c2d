package graft

/** Repo-wide codegen-compile audit — the r9 graft_md5_60 lesson
  * generalized: a native expression whose emitted Java does not
  * compile (e.g. a nested-module call with no static forwarder) makes
  * Spark log one CodeGenerator ERROR and silently run every affected
  * stage as interpreted projections. Value tests stay green; only the
  * throughput quietly disappears — bootstrap's 20M-hash path ran ~2.6×
  * slower for two rounds before the fallback was noticed.
  *
  * This spec executes EVERY SparkEntry query at sf0.001 with
  * `spark.sql.codegen.fallback=false`, which turns a whole-stage
  * codegen COMPILE failure into a thrown exception (the legitimate
  * huge-method fallback path is unaffected — Spark takes it before
  * consulting the conf). Any future expression that breaks Janino
  * fails here by query name, not in round N+2's bench numbers.
  */
class CodegenAuditSpec extends SparkSpec {

  test("every query executes with codegen fallback disabled") {
    val ss = SparkSpec.spark
    val old = ss.conf.get("spark.sql.codegen.fallback")
    ss.conf.set("spark.sql.codegen.fallback", "false")
    val failures = scala.collection.mutable.ListBuffer[String]()
    try {
      for (name <- SparkEntry.queries.keys.toSeq.sorted) {
        try {
          SparkEntry.queries(name)(ss, sf)
            .write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          // only codegen compile errors matter here; anything else
          // would already fail Verify/oracle and its own spec. Walk the
          // FULL cause chain — Spark wraps compile errors two or more
          // levels deep (SparkException -> ExecutionException -> ...).
          val chain = Iterator.iterate(e)(_.getCause)
            .takeWhile(_ != null).take(10).map(_.toString).mkString(" <- ")
          if (chain.contains("CompileException") || chain.contains("janino") ||
              chain.contains("Janino") || chain.contains("InternalCompilerException"))
            failures += s"$name: ${chain.take(300)}"
        }
        finally ss.catalog.clearCache()
      }
    } finally ss.conf.set("spark.sql.codegen.fallback", old)
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

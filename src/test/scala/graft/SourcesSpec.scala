package graft

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.sources._

class SourcesSpec extends SparkSpec {

  test("TimeWindow.previousHour is the full prior hour") {
    val w = TimeWindow.previousHour(Instant.parse("2024-01-15T10:17:23Z"))
    assert(w.start === Instant.parse("2024-01-15T09:00:00Z"))
    assert(w.end === Instant.parse("2024-01-15T10:00:00Z"))
  }

  test("TableLoader roundtrips csv and json with schema") {
    val dir = tmpDir("loader")
    val src = table("nation")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    src.write.mode("overwrite").json(s"$dir/json")
    val csv = TableLoader.read(spark, "csv", s"$dir/csv", Some(src.schema))
    val json = TableLoader.read(spark, "json", s"$dir/json", Some(src.schema))
    assert(csv.count() === src.count())
    assert(json.count() === src.count())
    assert(csv.schema === src.schema)
  }

  test("TableLoader rejects unknown formats") {
    intercept[IllegalArgumentException] {
      TableLoader.read(spark, "carbonfiber", "/nope")
    }
  }

  test("Sinks.csv writes a single header'd file (reference sink shape)") {
    val dir = tmpDir("csvsink")
    Sinks.csv(SparkEntry.queries("q_top10_tokens")(spark, sf), s"$dir/out")
    val files = new java.io.File(s"$dir/out").listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head === "token,cnt")
    assert(lines.size === 11) // header + top 10
  }

  test("partitioned hour layout roundtrip with partition pruning") {
    val dir = tmpDir("partsrc")
    val events = table("events")
    Sinks.partitionedByHour(events, "ts", dir)
    val all = PartitionedSource.read(spark, dir)
    assert(all.count() === events.count())

    val w = TimeWindow.day(2024, 1, 15)
    val window = PartitionedSource.readWindow(spark, dir, w)
    val expected = events.filter(w.predicate(col("ts"))).count()
    assert(window.count() === expected)
    // pruning: the window predicate must land in the scan's partition
    // filters (inputFiles is listing-level and pruning-blind)
    val plan = window.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("year"), s"expected partition filters, plan line: $pf")
    assert(!pf.matches(".*PartitionFilters: \\[\\s*\\].*"))
  }

  test("BatchJob: window scan -> top10 -> csv + store publish (reference contract)") {
    val dir = tmpDir("batchjob")
    Sinks.partitionedByHour(table("events"), "ts", s"$dir/hours")
    BatchJob.run(spark, s"$dir/hours", s"$dir/out", TimeWindow.day(2024, 1, 15))
    val csv = new java.io.File(s"$dir/out/top10")
      .listFiles.filter(_.getName.endsWith(".csv"))
    assert(csv.length === 1)
    val lines = scala.io.Source.fromFile(csv.head).getLines().toSeq
    assert(lines.head === "token,cnt")
    assert(lines.size > 1)
    val store = new ParquetResultStore(spark, s"$dir/out/results", "token", "win_start")
    assert(store.read().count() === lines.size - 1)
  }

  test("ParquetResultStore range-delete + upsert semantics") {
    val dir = tmpDir("store") + "/results"
    val store = new ParquetResultStore(spark, dir, "k", "ts")
    import SparkSpec.spark.implicits._
    def rows(s: Seq[(String, String, Long)]) =
      s.toDF("k", "tsRaw", "cnt")
        .select(col("k"), col("tsRaw").cast("timestamp").as("ts"), col("cnt"))

    store.upsert(rows(Seq(
      ("a", "2024-01-01 00:10:00", 1L),
      ("b", "2024-01-01 01:10:00", 2L))))
    assert(store.read().count() === 2)

    // upsert replaces by key
    store.upsert(rows(Seq(("a", "2024-01-01 00:20:00", 9L))))
    val after = store.read()
    assert(after.count() === 2)
    assert(after.filter(col("k") === "a").select("cnt").head().getLong(0) === 9L)

    // range-delete retires only the window
    store.rangeDelete(Instant.parse("2024-01-01T00:00:00Z"),
      Instant.parse("2024-01-01T01:00:00Z"))
    val kept = store.read()
    assert(kept.count() === 1)
    assert(kept.select("k").head().getString(0) === "b")
  }
}

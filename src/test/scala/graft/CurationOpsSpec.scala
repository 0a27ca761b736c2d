package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, DedupCluster, RangeJoin, Sampling}

/** Edge-semantics tests for the time-series / clustering / curation
  * operators — cases the row-set oracle can't isolate. */
class CurationOpsSpec extends SparkSpec {

  private val ss = SparkSpec.spark
  import ss.implicits._

  test("asOf: latest at-or-before right row wins; no prior row -> null") {
    val left = Seq((1L, 100L, "l1"), (1L, 205L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (1L, 300L, 30L),
      (2L, 60L, 40L)).toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "ts", "v", "asof_v")
      .select("name", "asof_v").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out("l1") === 10L)   // equal-ts right row matches (ts >= semantics)
    assert(out("l2") === 20L)   // 205 -> latest is 200, not 300
    assert(out("l3") === null)  // right at 60 > left 50: no prior row
  }

  test("asOf: equal right timestamps pick the max value deterministically") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 90L, 5L), (1L, 90L, 9L), (1L, 90L, 7L)).toDF("k", "ts", "v")
    val v = AsOfJoin.asOf(left, right, "k", "ts", "ts", "v", "av")
      .select("av").head().getLong(0)
    assert(v === 9L)
  }

  test("range join: [start, start+span) boundaries are half-open") {
    val iv = Seq((1L, java.sql.Date.valueOf("2024-01-10"))).toDF("ivid", "start")
    val pts = Seq(
      (100L, java.sql.Date.valueOf("2024-01-09")),  // before: out
      (101L, java.sql.Date.valueOf("2024-01-10")),  // start: in
      (102L, java.sql.Date.valueOf("2024-01-16")),  // last day: in
      (103L, java.sql.Date.valueOf("2024-01-17"))   // end: out (half-open)
    ).toDF("pid", "d")
    val got = RangeJoin.pointInInterval(iv, pts, "start", 7, "d", binDays = 7)
      .select("pid").as[Long].collect().sorted
    assert(got === Array(101L, 102L))
  }

  test("range join: no duplicate candidates across bins") {
    val iv = Seq((1L, java.sql.Date.valueOf("2024-01-10"))).toDF("ivid", "start")
    val pts = (0 until 30).map(i =>
      (i.toLong, java.sql.Date.valueOf(s"2024-01-${1 + i % 28}"))).toDF("pid", "d")
    val out = RangeJoin.pointInInterval(iv, pts, "start", 7, "d", binDays = 3)
    assert(out.count() === out.dropDuplicates("ivid", "pid").count())
  }

  test("components: chain A-B-C collapses to one cluster; singletons keep their id") {
    val nodes = (0L to 6L).toDF("id")
    // 0-1-2-3 a path (diameter 3), 4-5 a pair, 6 a singleton
    val edges = Seq((1L, 0L), (1L, 2L), (3L, 2L), (4L, 5L)).toDF("i", "j")
    val got = DedupCluster.components(nodes, "id", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("components: a 300-node chain converges under the default pass cap") {
    // the adversarial shape for plain min-label propagation (needs
    // O(diameter)=300 passes); pointer jumping must close it in
    // O(log d) — well inside the default maxIters=12
    val nodes = (0L until 300L).toDF("id")
    val edges = (0L until 299L).map(i => (i, i + 1)).toDF("i", "j")
    val got = DedupCluster.components(nodes, "id", edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === 300)
    assert(got.forall(_._2 === 0L), got.filter(_._2 != 0L).take(5).mkString(","))
  }

  test("hash sampling is deterministic and close to the nominal rate") {
    val docs = table("documents")
    val a = Sampling.hashSample(docs, "text", "1999").select("doc_id")
      .as[Long].collect().sorted
    val b = Sampling.hashSample(docs, "text", "1999").select("doc_id")
      .as[Long].collect().sorted
    assert(a === b)
    val rate = a.length.toDouble / docs.count()
    assert(rate > 0.02 && rate < 0.30, s"rate $rate")  // nominal ~10%, n=50
  }

  test("weighted sample: k per stratum, deterministic, weight-proportional") {
    import SparkSpec.spark.implicits._
    val docs = table("documents")
    val a = Sampling.weightedSample(docs, "doc_id", "source", "n_chars", 5)
      .select("source", "rnk", "doc_id").collect().map(_.toString).sorted
    val b = Sampling.weightedSample(docs, "doc_id", "source", "n_chars", 5)
      .select("source", "rnk", "doc_id").collect().map(_.toString).sorted
    assert(a === b, "content-stable: identical sample on rerun")
    val perStratum = Sampling.weightedSample(docs, "doc_id", "source", "n_chars", 5)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(perStratum.forall(_ == 5))
    // proportionality: one heavy row among many light ones should be
    // sampled with probability ≈ its weight share; with weight 10^6 vs
    // 99 × weight-1 rows the heavy key must make the top-1 cut
    val skew = ((1 to 99).map(i => (i.toLong, "s", 1L)) :+ (100L, "s", 1000000L))
      .toDF("id", "st", "w")
    val top = Sampling.weightedSample(skew, "id", "st", "w", 1)
      .select("id").head().getLong(0)
    assert(top === 100L, s"heavy row lost the weighted draw: $top")
  }

  test("incremental near-dups = batch pairs with the redundant doc in the incoming batch") {
    import org.apache.spark.sql.functions.col
    val docs = table("documents")
    val existing = docs.filter(col("doc_id") < 25)
    val incoming = docs.filter(col("doc_id") >= 25)
    val inc = graft.operators.Dedup
      .incrementalNearDups(existing, incoming, "doc_id", "text", 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Dedup
      .minHashNearDups(docs, "doc_id", "text", 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch pairs whose redundant (larger-id) member is incoming
    val expected = batch.filter { case (_, j) => j >= 25 }
    assert(inc === expected)
    // no existing-existing pairs ever re-reported
    assert(inc.forall { case (_, j) => j >= 25 })
  }

  test("bloom-pruned join is row-identical to the plain join and actually prunes") {
    import org.apache.spark.sql.functions.col
    val li = table("lineitem")
    val dim = table("orders").filter(col("o_orderkey") % 100 === 0)
      .select("o_orderkey", "o_orderpriority")
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"))
    val bloomed = graft.operators.BloomPrune
      .prunedJoin(li, dim, "l_orderkey", "o_orderkey")
    assert(bloomed.count() === plain.count())
    // the pre-join filter keeps a superset of matches but far fewer
    // rows than the full fact (1% of keys + false positives)
    val kept = graft.operators.BloomPrune
      .pruned(li, dim, "l_orderkey", "o_orderkey").count()
    assert(kept >= plain.count())
    assert(kept < li.count() / 2, s"kept $kept of ${li.count()}")
  }

  test("DSIR importance: target-slice docs outscore the rest on average") {
    import org.apache.spark.sql.functions._
    val docs = table("documents")
    val w = graft.operators.Sampling.importanceWeights(
      docs, "doc_id", "text", col("source") === "src0")
    val labeled = w.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("is_t", col("source") === "src0")
    val means = labeled.groupBy("is_t").agg(avg("importance").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the estimator must separate its own training slice from the rest
    assert(means(true) > means(false),
      s"target mean ${means(true)} <= raw mean ${means(false)}")
    assert(w.count() === docs.count())
  }

  test("DSIR scorer: literal-map projection matches the batch weights and streams") {
    import org.apache.spark.sql.functions._
    val docs = table("documents")
    val scorer = graft.operators.Sampling.importanceScorerFor(
      docs, "doc_id", "text", col("source") === "src0")
    val viaMap = docs.select(col("doc_id"), scorer(col("text")).as("importance"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaJoin = graft.operators.Sampling.importanceWeights(
        docs, "doc_id", "text", col("source") === "src0")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // both round(6); the fold and the avg sum the same doubles in a
    // different order, so allow one ULP of round-6 slack
    assert(viaMap.keySet === viaJoin.keySet)
    viaMap.foreach { case (id, v) =>
      assert(math.abs(v - viaJoin(id)) <= 1e-6, s"doc $id: $v vs ${viaJoin(id)}") }

    // append-mode memory stream: pure projection, zero state
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), scorer(col("text")).as("importance"))
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      val sample = docs.select("doc_id", "text").limit(5)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      in.addData(sample.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("dsir_stream")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed === sample.map(s => s._1 -> viaMap(s._1)).toMap)
    } finally q.stop()
  }

  test("SemDeDup: kept set has no within-cell near-dup pair; drops only dups") {
    import org.apache.spark.sql.functions._
    val e = table("embeddings")
    val kept = graft.operators.SemDedup.kept(e, "vec_id", "embedding",
      nlist = 16, theta = 0.4)
    // no two kept vectors in the same cell may still be near-dups
    val k2 = kept.join(e, Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("embedding"))
    val survivors = k2.as("x").join(k2.as("y"),
        col("x.cell") === col("y.cell") && col("y.vec_id") < col("x.vec_id"))
      .filter(graft.functions.Vectors.cosine(
        col("x.embedding"), col("y.embedding")) >= 0.4)
      .count()
    assert(survivors === 0L)
    // and the keep rule is minimal: every kept doc is either the
    // smallest id of its neighborhood or has no near-dup at all
    assert(kept.count() <= e.count())
  }

  test("SemDeDup skew guard: a giant diffuse cell splits, pair work bounded") {
    import org.apache.spark.sql.functions._
    // A distribution engineered to break the coarse quantizer: stride
    // init (n=400, nlist=16) picks ids 0,25,...,375 as centroids; ids
    // 25..375 point AWAY from everything else (negative first coord),
    // so all ~385 cone vectors (first coord +5, diffuse 63-dim noise)
    // argmax onto centroid 0 — one giant, angularly-spread cell.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { id =>
      val v =
        if (id != 0 && id % 25 == 0) {
          val a = Array.fill(64)(0.0f); a(0) = -10f; a(1 + id / 25) = 1f; a
        } else {
          val a = Array.fill(64)((rnd.nextGaussian() * 2.5).toFloat)
          a(0) = 5f; a
        }
      (id.toLong, v.toSeq)
    }
    val df = ss.createDataFrame(rows).toDF("vec_id", "embedding")
    def pairWork(g: org.apache.spark.sql.DataFrame): Long =
      g.groupBy("rk").count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .head().getLong(0)
    val unguarded = graft.operators.SemDedup.assignedGuarded(
      df, "vec_id", "embedding", nlist = 16, maxCell = 0)
    val guarded = graft.operators.SemDedup.assignedGuarded(
      df, "vec_id", "embedding", nlist = 16, maxCell = 30, subBits = 4)
    // the skew is real: one cell swallowed ≥3/4 of the corpus
    val biggest = unguarded.groupBy("rk").count()
      .agg(max(col("count"))).head().getLong(0)
    assert(biggest >= 300L, s"expected a giant cell, max=$biggest")
    // the guard splits it: candidate-pair work drops by at least 4x
    val (p0, p1) = (pairWork(unguarded), pairWork(guarded))
    assert(p1 * 4 <= p0, s"pair work $p0 -> $p1, expected >=4x reduction")
    // and the guarded kept set is still sound: no same-refined-cell
    // near-dup pair survives
    val kept = graft.operators.SemDedup.kept(df, "vec_id", "embedding",
      nlist = 16, theta = 0.4, maxCell = 30, subBits = 4)
    val k2 = kept.join(guarded.withColumnRenamed("id", "vec_id"), Seq("vec_id"))
    val survivors = k2.as("x").join(k2.as("y"),
        col("x.rk") === col("y.rk") && col("y.vec_id") < col("x.vec_id"))
      .filter(graft.functions.Vectors.cosine(
        col("x.vec"), col("y.vec")) >= 0.4)
      .count()
    assert(survivors === 0L)
  }

  test("curation pipeline: dedup + decontaminate + gate + sample compose") {
    import org.apache.spark.sql.functions.col
    val docs = table("documents")
    val bench = docs.filter(col("doc_id") < 5)
    val train = docs.filter(col("doc_id") >= 5)
    val curated = graft.operators.CurationPipeline.curate(
      train, "doc_id", "text", benchmark = Some(bench))
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < train.count())
    // no survivor shares a 5-gram with the benchmark set
    val overlap = graft.operators.Dedup.shingleDf(
        curated, "doc_id", "text", 5)
      .select(col("id"), org.apache.spark.sql.functions.explode(col("sh")).as("g"))
      .join(graft.operators.Dedup.shingleDf(bench, "doc_id", "text", 5)
        .select(org.apache.spark.sql.functions.explode(col("sh")).as("g")).distinct(), "g")
      .count()
    assert(overlap === 0L)
    // no two survivors are exact duplicates after normalization
    val n = curated.count()
    val distinctNorm = curated.select(
      org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.lower(col("text"))), "\\s+", " ")))
      .distinct().count()
    assert(n === distinctNorm)
    // deterministic: same inputs, same survivors
    val ids2 = graft.operators.CurationPipeline.curate(
      train, "doc_id", "text", benchmark = Some(bench))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === ids2)
  }

  test("curateWithFunnel: observed metrics equal the funnel rows and ride one action") {
    import org.apache.spark.sql.functions.col
    val docs = table("documents")
    val bench = docs.filter(col("doc_id") < 5)
    val train = docs.filter(col("doc_id") >= 5)
    val cfg = graft.operators.CurationPipeline.Config(sampleHex4 = Some("8000"))
    val expected = graft.operators.CurationPipeline.funnel(
        train, "doc_id", "text", bench, cfg)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val (curated, obs) = graft.operators.CurationPipeline.curateWithFunnel(
      train, "doc_id", "text", bench, cfg)
    val survivors = curated.count()  // the ONE action; metrics ride it
    val m = obs.get
    assert(m("n_total") === expected("total"))
    assert(m("n_exact_dedup") === expected("exact_dedup"))
    assert(m("n_near_dedup") === expected("near_dedup"))
    assert(m("n_decontaminated") === expected("decontaminated"))
    assert(m("n_quality_gated") === expected("quality_gated"))
    assert(m("n_sampled") === expected("sampled"))
    assert(survivors === expected("sampled"))
    // the funnel is cumulative: monotone non-increasing stage counts
    val ordered = Seq("total", "exact_dedup", "near_dedup",
      "decontaminated", "quality_gated", "sampled").map(expected)
    assert(ordered === ordered.sorted.reverse)
  }

  test("q_k_anonymity: every published class has n >= k and no row is lost") {
    val rows = SparkEntry.queries("q_k_anonymity")(SparkSpec.spark, sf).collect()
    // the k-anonymity guarantee: every row at level 0/1 is a class of
    // at least k = 10; the level-2 suppressed bucket may be smaller
    // but must be the ONLY sub-k row
    rows.filter(_.getAs[Int]("level") < 2).foreach { r =>
      assert(r.getAs[Long]("n") >= 10L, r.toString)
    }
    assert(rows.count(_.getAs[Int]("level") == 2) <= 1)
    // conservation: published + suppressed masses re-add to the table
    val total = table("customer").count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    assert(rows.nonEmpty)
    // (level-0 survivors need classes >= k — present at sf0.01+, where
    // the oracle checks the full release; this spec pins the
    // guarantee + conservation at any scale)
  }

  test("q_data_mix: ascending water-fill — cap binds below the share, budget conserved") {
    // the synthetic corpus's sources are near-uniform, so the oracle
    // row-set only ever exercises the uncapped regime; this hand case
    // pins the CAPPED branch and the exact share arithmetic.
    // A: 2 tokens (cap 2·2=4 binds); C: 98 and B: 100 split the rest.
    val dir = tmpDir("mix")
    Seq((1L, "a", "t1 t2"),
      (2L, "c", Seq.fill(98)("w").mkString(" ")),
      (3L, "b", Seq.fill(100)("v").mkString(" ")))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_data_mix")(ss, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("a") === ((2L, false, 4.0, 2.0)),
      "small source takes its full 2-epoch cap")
    // budget ⌊200/2⌋ = 100; after the cap, share = (100 − 4)/2 = 48
    assert(out("c") === ((98L, true, 48.0, 0.489795918)))
    assert(out("b") === ((100L, true, 48.0, 0.48)))
    assert(out.values.map(_._3).sum === 100.0, "allocation spends the budget")
  }

  test("q_mutual_info: one-category marginal pins nmi to 0.0, never NaN") {
    // a single-lang corpus has H(lang) = 0, so sqrt(shx·shy) = 0 and
    // the unguarded nmi would be 0/0 = NaN (engine hash parity on NaN
    // is not guaranteed); the repo's degenerate-case convention pins
    // it to 0.0 in BOTH the Spark query and the DuckDB oracle
    val dir = tmpDir("nmi")
    Seq((1L, "en", "wiki"), (2L, "en", "web"), (3L, "en", "web"))
      .toDF("doc_id", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = SparkEntry.queries("q_mutual_info")(ss, dir).collect().head
    assert(row.getAs[Double]("h_lang") === 0.0)
    assert(row.getAs[Double]("nmi") === 0.0, "degenerate marginal pins to 0.0")
    assert(!row.getAs[Double]("nmi").isNaN)
  }

  test("q_pass_at_k: telescoped product hits every branch exactly") {
    val dir = tmpDir("passk")
    // success = value > 80; per user: (n, c) of (12,0) -> 0.0,
    // (12,1) -> 1 - C(11,10)/C(12,10) = 1 - 11/66, (12,3) -> n-c < k
    // -> exactly 1.0, (5,0) -> n < k -> NULL
    val rows =
      (1 to 12).map(i => (1L, 10.0)) ++
      ((1 to 11).map(i => (2L, 10.0)) :+ ((2L, 99.0))) ++
      ((1 to 9).map(i => (3L, 10.0)) ++ Seq.fill(3)((3L, 99.0))) ++
      (1 to 5).map(i => (4L, 10.0))
    rows.toDF("user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_pass_at_k")(ss, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(1L) === ((12L, 0L, Some(0.0))), "no successes: pass@k = 0")
    assert(out(2L) === ((12L, 1L, Some(0.833333333))),
      "1 - C(11,10)/C(12,10) = 1 - 1/6")
    assert(out(3L) === ((12L, 3L, Some(1.0))),
      "n - c < k: some draw must include a success")
    assert(out(4L) === ((5L, 0L, None)), "n < k: estimator undefined")
  }

  test("q_conformal: q-hat is the smallest value covering >= k calibration scores") {
    val out = SparkEntry.queries("q_conformal")(ss, sf).collect()
    assert(out.nonEmpty)
    val ev = table("events").select(col("event_type"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    out.foreach { r =>
      val vals = ev.filter(_._1 == r.getString(0)).map(_._2)
      val n = r.getLong(1); val k = r.getLong(2)
      assert(n === vals.length.toLong)
      assert(k === math.ceil(0.9 * (n + 1)).toLong)
      if (!r.isNullAt(3)) {
        val q = r.getDouble(3)
        assert(vals.count(_ <= q).toLong >= k, "q-hat covers at least k scores")
        assert(vals.count(_ < q).toLong < k, "q-hat is the smallest such value")
      } else assert(n < 9L, "only tiny arms may emit the infinite interval")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Vocab

class VocabSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("build: ids are frequency-ranked with lexicographic tie-break") {
    val df = Seq((1L, "b b b a a c"), (2L, "a d")).toDF("doc_id", "text")
    // counts: a=3 b=3 c=1 d=1 -> a,b tie at 3 (a first), c,d tie at 1
    val v = Vocab.build(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(v === Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
  }

  test("build: minCount prunes the tail before ranking") {
    val df = Seq((1L, "x x y")).toDF("doc_id", "text")
    val v = Vocab.build(df, "text", minCount = 2L).collect()
    assert(v.map(_.getString(0)).toSeq === Seq("x"))
    assert(v.head.getLong(2) === 1L)
  }

  test("encode: exact sequence order with OOV as 0") {
    val corpus = Seq((1L, "the cat sat"), (2L, "the the dog")).toDF("doc_id", "text")
    // counts: the=3, cat=1 dog=1 sat=1 -> the=1, cat=2, dog=3, sat=4
    val vocab = Vocab.build(corpus, "text").filter(col("tok_id") <= 2) // the, cat
    val enc = Vocab.encode(corpus, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(enc(1L) === Seq(1L, 2L, 0L)) // the cat <sat=OOV>
    assert(enc(2L) === Seq(1L, 1L, 0L)) // the the <dog=OOV>
  }

  test("encode on corpus: token count preserved per doc") {
    val docs = table("documents").limit(30)
    val vocab = Vocab.build(docs, "text")
    val enc = Vocab.encode(docs, "doc_id", "text", vocab)
      .select(col("doc_id"), size(col("ids")).as("n_ids"))
    val want = docs.select(col("doc_id"),
      size(graft.functions.TextAnalysis.tokens(lower(col("text")))).as("n_tok"))
    val joined = enc.join(want, "doc_id")
      .filter(col("n_ids") =!= col("n_tok")).count()
    assert(joined === 0)
  }

  test("encoderFor: literal-map encoder matches the join-based encode") {
    val corpus = Seq((1L, "the cat sat"), (2L, "the the dog")).toDF("doc_id", "text")
    val vocab = Vocab.build(corpus, "text").filter(col("tok_id") <= 2)
    val enc = Vocab.encoderFor(vocab)
    val viaMap = corpus.select(col("doc_id"), enc(col("text")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaJoin = Vocab.encode(corpus, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaMap === viaJoin)
  }

  test("encoderFor streams: stateless append-mode encode over a memory stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = table("documents").limit(100)
    val vocab = Vocab.build(corpus, "text")
    val enc = Vocab.encoderFor(vocab)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), enc(col("text")).as("ids"))
      .writeStream.format("memory").queryName("enc_stream")
      .outputMode("append").start()
    try {
      val sample = corpus.select("doc_id", "text").limit(5)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      in.addData(sample.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("enc_stream")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val batch = Vocab.encode(
          corpus.filter(col("doc_id").isin(sample.map(_._1): _*)),
          "doc_id", "text", vocab)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("encodeStream: two-tier encoder matches batch encode past the literal tier") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = table("documents").limit(100)
    val vocab = Vocab.build(corpus, "text")
    val hotK = 10
    assert(vocab.count() > hotK * 3) // the vocab genuinely exceeds the literal tier
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val encoded = Vocab.encodeStream(in.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", "text", "ts", vocab, hotK, "10 minutes")
    val q = encoded.writeStream.format("memory").queryName("enc2_stream")
      .outputMode("append").start()
    try {
      val sample = corpus.select("doc_id", "text").limit(8)
        .collect().map(r => (r.getLong(0),
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), r.getString(1)))
      in.addData(sample.toIndexedSeq)
      q.processAllAvailable()
      // advance the watermark far past the sample so the cold-tier
      // aggregation closes and emits (the sentinel itself stays pending)
      in.addData((999999L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "x"))
      q.processAllAvailable()
      val streamed = spark.table("enc2_stream")
        .filter(col("doc_id") =!= 999999L)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
      val batch = Vocab.encode(
          corpus.filter(col("doc_id").isin(sample.map(_._1): _*)),
          "doc_id", "text", vocab)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(streamed === batch)
      assert(streamed.size === 8)
      // the hot tier really fires: some encoded id <= hotK appears
      assert(streamed.values.exists(_.exists(id => id > 0 && id <= hotK)))
      // and the cold tier really fires: some id past the literal tier
      assert(streamed.values.exists(_.exists(_ > hotK)))
    } finally q.stop()
  }

  test("q_interarrival: histogram mass = events minus one per user") {
    val rows = SparkEntry.queries("q_interarrival")(spark, sf).collect()
    val mass = rows.map(_.getLong(1)).sum
    val ev = table("events")
    val want = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(mass === want)
  }

  test("vocabGrowth: nondecreasing and saturating at total distinct tokens") {
    val docs = table("documents")
    val g = Vocab.vocabGrowth(docs, "doc_id", "text",
        Seq(50L, 100L, 200L, 500L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = Seq(50L, 100L, 200L, 500L).map(g)
    assert(sorted === sorted.sorted, s"growth must be nondecreasing: $sorted")
    val total = docs.select(explode(
        graft.functions.TextAnalysis.tokens(lower(col("text")))).as("t"))
      .select("t").distinct().count()
    assert(sorted.last === total) // 500 covers the whole sf0.001 corpus
  }

  test("oovRate: zero against the full vocab, positive against a truncated one") {
    val docs = table("documents")
    val full = Vocab.build(docs, "text")
    val zero = Vocab.oovRate(docs, "text", "source", full)
      .select("oov_rate").collect().map(_.getDouble(0))
    assert(zero.forall(_ === 0.0))
    val tiny = full.filter(col("tok_id") <= 2)
    val some = Vocab.oovRate(docs, "text", "source", tiny)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(some.forall { case (n, oov, rate) =>
      oov > 0 && rate === oov.toDouble / n.toDouble })
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileSample

/** The mergeable quantile sketch: a bottom-k-by-hash value sample.
  * Determinism under any merge tree is the property the whole oracle
  * contract rests on; the rank-error bound is what makes it a quantile
  * estimator rather than just a sample. */
class QuantileSampleSpec extends SparkSpec {

  private def md5h(prefix: String, c: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(prefix), c)), 1, 15), 16, 10).cast("long")

  private def sample(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Double] =
    df.agg(QuantileSample.quantileSample(
        md5h("t:", col("id")), col("v"), k).as("s"))
      .collect().head.getSeq[Double](0)

  test("sample = values of the k smallest hashes, sorted by value") {
    val s = spark; import s.implicits._
    val rows = (1L to 100L).map(i => (i, i.toDouble))
    val df = rows.toDF("id", "v").repartition(7)
    val got = sample(df, 10)
    // replay: k smallest md5-60bit hashes of "t:"+id, their values
    val want = rows.map { case (i, v) =>
      (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"t:$i").take(15), 16), v)
    }.sortBy(_._1).take(10).map(_._2).sorted
    assert(got === want)
  }

  test("deterministic under any partitioning (merge-tree independence)") {
    val s = spark; import s.implicits._
    val rows = (1L to 20000L).map(i => (i, (i * 2654435761L % 1000).toDouble))
    val df = rows.toDF("id", "v")
    val a = sample(df.repartition(1), 256)
    val b = sample(df.repartition(13), 256)
    val c = sample(df.repartition(32), 256)
    assert(a === b && b === c && a.size === 256)
  }

  test("hash collision keeps the MIN value, independent of merge order") {
    val s = spark; import s.implicits._
    // Force collisions by feeding a NON-unique hash: two ids share each
    // hash value. The buffer must keep min(value) per hash whatever
    // order partitions merge in — the set-function property the oracle
    // (min(value) GROUP BY hv, then bottom-k rank) replays.
    val rows = (1L to 40L).map(i => (i % 7, (100 - i).toDouble)) // 7 hashes
    val df = rows.toDF("hv", "v")
    def run(parts: Int): Seq[Double] =
      df.repartition(parts)
        .agg(QuantileSample.quantileSample(col("hv"), col("v"), 5).as("s"))
        .collect().head.getSeq[Double](0)
    // expected: per hash h in 0..6 the min value; 5 smallest hashes 0..4
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val exp = (0L to 4L).map(want).sorted
    assert(run(1) === exp)
    assert(run(4) === exp)
    assert(run(17) === exp)
  }

  test("sampled median is rank-accurate within ~3/sqrt(k)") {
    val s = spark; import s.implicits._
    val n = 50000
    val rows = (1L to n.toLong).map(i => (i, i.toDouble)) // true median = n/2
    val k = 256
    val smp = sample(rows.toDF("id", "v").repartition(16), k)
    val med = smp((k * 0.5).toInt - 1)
    val rankErr = math.abs(med / n - 0.5)
    assert(rankErr < 3.0 / math.sqrt(k.toDouble), s"median=$med rankErr=$rankErr")
  }

  test("q_quantile_sketch: sampled percentiles track the exact ones") {
    val rows = SparkEntry.queries("q_quantile_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sp50, sp90) = (r.getAs[Double]("sp50"), r.getAs[Double]("sp90"))
      val (ep50, ep90) = (r.getAs[Double]("ep50"), r.getAs[Double]("ep90"))
      // value-scale tolerance: the event values span ~[0, 200]; a
      // 256-sample's p50/p90 should land within ~25% of exact
      assert(math.abs(sp50 - ep50) <= math.max(25.0, 0.25 * ep50),
        s"sp50=$sp50 ep50=$ep50")
      assert(math.abs(sp90 - ep90) <= math.max(25.0, 0.25 * ep90),
        s"sp90=$sp90 ep90=$ep90")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.CmsSketch

class CmsSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, col_ : String,
                     d: Int, w: Int): Seq[Long] =
    df.agg(CmsSketch.cms(col(col_), d, w).as("s"))
      .collect().head.getSeq[Long](0)

  private def estimate(sk: Seq[Long], h: Long, d: Int, w: Int): Long =
    (0 until d).map(i => sk(i * w + ((h >>> (i * 12)) & (w - 1)).toInt)).min

  test("small input: every row total equals n; point estimates exact " +
    "when buckets don't collide") {
    val s = spark; import s.implicits._
    val d = 4; val w = 4096
    val rows = Seq(1L, 1L, 1L, 2L, 2L, 3L)
    val sk = sketch(rows.toDF("x"), "x", d, w)
    (0 until d).foreach { i =>
      assert(sk.slice(i * w, (i + 1) * w).sum === rows.size.toLong)
    }
    assert(estimate(sk, 1L, d, w) === 3L)
    assert(estimate(sk, 2L, d, w) === 2L)
    assert(estimate(sk, 3L, d, w) === 1L)
  }

  test("deterministic under any partitioning (merge-tree independence)") {
    val s = spark; import s.implicits._
    val rows = (1 to 30000).map(i => (i * 2654435761L) % (1L << 60))
    val df = rows.toDF("x")
    val a = sketch(df.repartition(1), "x", 4, 1024)
    val b = sketch(df.repartition(13), "x", 4, 1024)
    val c = sketch(df.repartition(32), "x", 4, 1024)
    assert(a === b && b === c)
  }

  test("one-sided error: estimate >= exact for every key, overshoot " +
    "bounded in expectation by n/w per depth row") {
    val s = spark; import s.implicits._
    val d = 4; val w = 1024
    // zipfian-ish multiset over 5000 distinct md5-hashed keys
    val keys = (1 to 5000).map(i => java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"k$i").take(15), 16))
    val rows = keys.zipWithIndex.flatMap { case (h, i) =>
      Seq.fill(1 + 2000 / (i + 1))(h)
    }
    val n = rows.size
    val exact = rows.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
    val sk = sketch(rows.toDF("x").repartition(8), "x", d, w)
    var overshoot = 0L
    exact.foreach { case (h, c) =>
      val e = estimate(sk, h, d, w)
      assert(e >= c, s"CMS under-estimated: h=$h exact=$c est=$e")
      overshoot += e - c
    }
    // expected overshoot per key per row ~ n/w; min over 4 rows is far
    // smaller — allow the single-row bound with slack 3x
    assert(overshoot.toDouble / exact.size < 3.0 * n.toDouble / w,
      s"mean overshoot ${overshoot.toDouble / exact.size}")
  }

  test("q_cms_counts: estimates cover the exact top-20 counts tightly") {
    val rows = SparkEntry.queries("q_cms_counts")(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("est_n")
      assert(est >= exact)
      assert(est <= exact + 200, s"${r.getAs[String]("token")}: " +
        s"exact=$exact est=$est")
    }
  }
}

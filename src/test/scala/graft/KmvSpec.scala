package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

class KmvSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, col_ : String,
                     k: Int): Seq[Long] =
    df.agg(KmvSketch.kmv(col(col_), k).as("s"))
      .collect().head.getSeq[Long](0)

  test("sketch = the k smallest DISTINCT values, ascending") {
    val s = spark; import s.implicits._
    val rows = Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L, 11L, 1L)
    val got = sketch(rows.toDF("x").repartition(4), "x", 4)
    assert(got === Seq(1L, 3L, 5L, 7L))
  }

  test("below-k input: exact distinct set, duplicates collapse") {
    val s = spark; import s.implicits._
    val got = sketch(Seq(5L, 5L, 2L, 2L, 8L).toDF("x"), "x", 64)
    assert(got === Seq(2L, 5L, 8L))
  }

  test("deterministic under any partitioning (merge-tree independence)") {
    val s = spark; import s.implicits._
    val rows = (1 to 20000).map(i => (i * 2654435761L) % 1000000007L)
    val df = rows.toDF("x")
    val a = sketch(df.repartition(1), "x", 128)
    val b = sketch(df.repartition(13), "x", 128)
    val c = sketch(df.repartition(32), "x", 128)
    assert(a === b && b === c)
    assert(a === rows.distinct.sorted.take(128))
  }

  test("distinct estimate (k-1)*M/theta within ~3/sqrt(k) of truth") {
    val s = spark; import s.implicits._
    val m = 1L << 60
    // pseudo-uniform 60-bit hashes of 40k distinct keys
    val rows = (1 to 40000)
      .map(i => java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"k$i").take(15), 16))
    val k = 256
    val mins = sketch(rows.toDF("x").repartition(8), "x", k)
    val est = (k - 1).toDouble * m.toDouble / mins.last.toDouble
    val err = math.abs(est - 40000.0) / 40000.0
    assert(err < 3.0 / math.sqrt(k.toDouble), s"est=$est err=$err")
  }

  test("q_kmv_overlap: intersection estimate tracks the exact overlap") {
    val exact = SparkEntry.queries("q_vocab_overlap")(spark, sf)
      .collect().head
    val (na, nb, common) =
      (exact.getLong(0), exact.getLong(1), exact.getLong(2))
    val row = SparkEntry.queries("q_kmv_overlap")(spark, sf)
      .filter(col("s1") === "src0" && col("s2") === "src1")
      .collect().head
    val estU = row.getAs[Double]("est_union")
    val estI = row.getAs[Double]("est_inter")
    val trueU = na + nb - common
    // ~1/sqrt(256) sketch error, generous 4-sigma band
    assert(math.abs(estU - trueU) / trueU < 0.25, s"union est=$estU true=$trueU")
    assert(math.abs(estI - common) / common < 0.35, s"inter est=$estI true=$common")
  }
}

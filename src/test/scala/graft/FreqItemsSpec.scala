package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItems

class FreqItemsSpec extends SparkSpec {

  private def summary(df: org.apache.spark.sql.DataFrame, col_ : String, k: Int) =
    df.agg(FreqItems.freqItems(col(col_), k).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item"), col("e.lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when cardinality < k (distributed merge path)") {
    val s = spark; import s.implicits._
    val rows = (1 to 5000).map(i => s"v${i % 7}")
    val df = rows.toDF("x").repartition(8)
    val got = summary(df, "x", 64)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === truth)
  }

  test("Misra-Gries guarantees under eviction: heavy items present, lb within n/k") {
    val s = spark; import s.implicits._
    // zipf-ish: item i appears 2000/i times, plus 3000 singletons
    val heavy = (1 to 20).flatMap(i => Seq.fill(2000 / i)(s"h$i"))
    val noise = (1 to 3000).map(i => s"n$i")
    val rows = scala.util.Random.shuffle(heavy ++ noise)
    val n = rows.size
    val k = 50
    val df = rows.toDF("x").repartition(8)
    val got = summary(df, "x", k)
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.size <= k - 1)
    got.foreach { case (item, lb) =>
      val t = truth(item)
      assert(lb <= t, s"$item lb=$lb > true=$t")
      assert(t - lb <= n.toLong / k, s"$item error ${t - lb} > n/k ${n / k}")
    }
    // every item with true count > n/k must be reported
    truth.filter(_._2 > n.toLong / k).keys.foreach { item =>
      assert(got.contains(item), s"heavy item $item missing")
    }
  }

  test("nulls are skipped; empty input yields empty summary") {
    val s = spark; import s.implicits._
    val df = Seq[Option[String]](Some("a"), None, Some("a"), None).toDF("x")
    assert(summary(df, "x", 8) === Map("a" -> 2L))
    assert(summary(Seq.empty[String].toDF("x"), "x", 8) === Map.empty)
  }
}

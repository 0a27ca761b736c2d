package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.plans.GroupTopK

class GroupTopKSpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    table("orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  private def customTopK(k: Int) =
    GroupTopK.topKPerGroup(
      table("orders").select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      k, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc))

  test("row-identical to the window row_number plan") {
    for (k <- Seq(1, 3, 7)) {
      val a = customTopK(k).collect().map(_.toSeq).toSet
      val b = windowTopK(k).collect().map(_.toSeq).toSet
      assert(a === b, s"k=$k")
    }
  }

  test("plans as partial + final exec with one exchange between") {
    val p = customTopK(3).queryExecution.executedPlan.toString
    val first = p.indexOf("GroupTopK [")
    val second = p.indexOf("GroupTopK [", first + 1)
    assert(first >= 0 && second > first, p)
    val ex = p.indexOf("Exchange hashpartitioning(o_custkey", first)
    assert(ex > first && ex < second, p) // shuffle sits between final and partial
  }

  test("single hot group stays exact (skew shape)") {
    val s = spark; import s.implicits._
    val df = (1 to 10000).map(i => (1L, i.toLong)).toDF("g", "v")
      .union(Seq((2L, 5L), (2L, 1L)).toDF("g", "v"))
      .repartition(8)
    val out = GroupTopK.topKPerGroup(df, 2, Seq(col("g")),
      Seq(col("v").asc)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 5L)))
  }

  test("groups with fewer than k rows emit all rows; null keys group") {
    val s = spark; import s.implicits._
    val df = Seq[(Option[Long], Long)]((Some(1L), 10L), (None, 3L), (None, 7L), (None, 1L))
      .toDF("g", "v").repartition(4)
    val out = GroupTopK.topKPerGroup(df, 2, Seq(col("g")), Seq(col("v").asc))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (-1L, 1L), (-1L, 3L)))
  }

  test("final pass emits each group's rows in order") {
    val rows = customTopK(3).collect()
    val byKey = rows.groupBy(_.getLong(0))
    byKey.foreach { case (_, rs) =>
      val prices = rs.map(r => (r.getDouble(2), -r.getLong(1))).toSeq
      assert(prices === prices.sortBy(p => (-p._1, -p._2)))
    }
  }
}

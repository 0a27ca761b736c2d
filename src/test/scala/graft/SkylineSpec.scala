package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Global skyline: the distributed two-stage plan must equal the
  * sequential running-max window formulation exactly. */
class SkylineSpec extends SparkSpec {

  test("global frontier equals the single-sort window formulation") {
    val li = table("lineitem")
      .select(col("l_extendedprice").as("price"), col("l_quantity").as("qty"),
        col("l_orderkey"), col("l_linenumber"))
    val w = Window
      .orderBy(col("price"), col("qty").desc, col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = li
      .withColumn("best", max(col("qty")).over(w))
      .filter(col("best").isNull || col("qty") > col("best"))
      .select("price", "qty", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
    val got = Skyline
      .frontier2d(li, "price", "qty", Seq("l_orderkey", "l_linenumber"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    spark.catalog.clearCache()
  }

  test("frontier2d refuses a partition count past the driver bound loudly") {
    val li = table("lineitem")
      .select(col("l_extendedprice").as("price"), col("l_quantity").as("qty"),
        col("l_orderkey"), col("l_linenumber"))
    // AQE may coalesce the small test input to one range partition, so
    // drive the guard with a zero bound — the trip path is the same
    val e = intercept[IllegalArgumentException] {
      Skyline.frontier2d(li, "price", "qty",
        Seq("l_orderkey", "l_linenumber"), maxDriverEntries = 0)
    }
    assert(e.getMessage.contains("maxDriverEntries"))
  }

  test("frontier is non-dominated: no survivor beats another") {
    val li = table("lineitem")
      .select(col("l_extendedprice").as("price"), col("l_quantity").as("qty"),
        col("l_orderkey"), col("l_linenumber"))
    val f = Skyline.frontier2d(li, "price", "qty", Seq("l_orderkey", "l_linenumber"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    for (a <- f; b <- f if a != b)
      assert(!(b._1 <= a._1 && b._2 >= a._2),
        s"$a dominated by $b")
    spark.catalog.clearCache()
  }
}

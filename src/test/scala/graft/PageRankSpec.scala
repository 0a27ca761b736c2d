package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {

  private def ranksOf(edges: Seq[(String, String)],
                      iters: Int = 3): Map[String, Double] = {
    import SparkSpec.spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("symmetric cycle converges to uniform ranks") {
    val r = ranksOf(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    assert(r.size === 3)
    assert(r.values.toSet.size === 1) // symmetry => identical ranks
    // simplified PR without dangling redistribution still sums ≈ 1 here
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("star hub outranks leaves") {
    val leaves = Seq("x", "y", "z")
    val r = ranksOf(leaves.flatMap(l => Seq(l -> "hub", "hub" -> l)))
    assert(r("hub") > r("x"))
    assert(leaves.map(r).toSet.size === 1)
  }

  test("ranks are deterministic across runs and repartitionings") {
    import SparkSpec.spark.implicits._
    val e = (0 until 50).map(i => (s"n${i % 7}", s"n${(i * 3 + 1) % 7}"))
    val a = ranksOf(e)
    val b = PageRank.ranks(e.toDF("src", "dst").repartition(7), 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }
}

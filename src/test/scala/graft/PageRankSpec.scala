package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, PageRank}

class PageRankSpec extends SparkSpec {

  private def bfsOf(edges: Seq[(String, String)], seeds: Seq[String],
                    maxHops: Int): Map[String, Int] = {
    import SparkSpec.spark.implicits._
    Graph.bfs(edges.toDF("src", "dst"), seeds.toDF("node"), maxHops)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  test("BFS labels min hop distance and stops at the bound") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e",
      "b" -> "d") // shortcut: d reachable at 2, not 3
    val d = bfsOf(chain, Seq("a"), 3)
    assert(d === Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 2, "e" -> 3))
    val bounded = bfsOf(chain, Seq("a"), 1)
    assert(bounded === Map("a" -> 0, "b" -> 1))
  }

  test("BFS early-exits on exhausted frontier and handles multi-seeds") {
    // two components; seeds in both; 10 hops >> diameter
    val e = Seq("a" -> "b", "x" -> "y")
    val d = bfsOf(e, Seq("a", "x"), 10)
    assert(d === Map("a" -> 0, "x" -> 0, "b" -> 1, "y" -> 1))
    // isolated seed: just itself at 0
    assert(bfsOf(e, Seq("zz"), 5) === Map("zz" -> 0))
  }

  test("BFS leaves no pinned checkpoint blocks behind except the result") {
    import SparkSpec.spark.implicits._
    val sc = SparkSpec.spark.sparkContext
    // delta-based: other suites share this session and may hold caches
    val before = sc.getPersistentRDDs.keySet
    val res = Graph.bfs(Seq("a" -> "b", "b" -> "c").toDF("src", "dst"),
      Seq("a").toDF("node"), 4)
    res.count()
    val added = sc.getPersistentRDDs.keySet -- before
    // result's own checkpoint may remain cached; nothing else should
    assert(added.size <= 1, s"leaked RDDs: $added")
  }

  private def kcoreOf(edges: Seq[(String, String)], k: Int,
                      rounds: Int): Map[String, Long] = {
    import SparkSpec.spark.implicits._
    Graph.kcore(edges.toDF("a", "b"), k, rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("kcore keeps exactly the 3-core of a clique with pendants") {
    // K4 on a..d plus a pendant tail d-e-f: the 3-core is the clique
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d", "d" -> "e", "e" -> "f")
    val core = kcoreOf(k4, 3, rounds = 3)
    assert(core === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("kcore peels a path iteratively; bounded rounds truncate the peel") {
    // path a-b-c-d-e under k=2: each round exposes the next endpoints,
    // so the full peel to empty needs several rounds
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    assert(kcoreOf(path, 2, rounds = 4) === Map.empty)
    // one round only drops the current endpoints' edges: b-c-d survive
    val once = kcoreOf(path, 2, rounds = 1)
    assert(once.keySet === Set("b", "c", "d"))
  }

  test("kcore leaves no pinned checkpoint blocks behind except the result") {
    import SparkSpec.spark.implicits._
    val sc = SparkSpec.spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val res = Graph.kcore(Seq("a" -> "b", "a" -> "c", "b" -> "c")
      .toDF("a", "b"), 2, rounds = 3)
    res.count()
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"leaked RDDs: $added")
  }

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

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, AnnIvf, AnnLsh}

class AnnSpec extends SparkSpec {

  lazy val emb = table("embeddings")
  lazy val queries = emb.filter(col("vec_id") < 5)

  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  lazy val truth: Map[Long, Set[Long]] =
    neighborSets(Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))

  private def recall(approx: Map[Long, Set[Long]]): Double = {
    val hits = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).count(t.contains) }.sum
    hits.toDouble / truth.values.map(_.size).sum
  }

  test("brute force returns k ranked neighbors per query") {
    assert(truth.size === 5)
    assert(truth.values.forall(_.size == 10))
  }

  test("LSH ANN recall vs brute force") {
    val r = recall(neighborSets(
      AnnLsh.annTopK(emb, queries, "vec_id", "embedding", 10)))
    // synthetic embeddings have moderate nearest-neighbor cosines
    // (~0.5), the hard regime for hyperplane LSH — the point here is
    // the mechanism + determinism, not tuned recall
    assert(r > 0.15, s"LSH recall $r")
  }

  test("IVF ANN recall vs brute force") {
    val r = recall(neighborSets(
      AnnIvf.annTopK(emb, queries, "vec_id", "embedding", 10, nlist = 16, nprobe = 8)))
    assert(r > 0.5, s"IVF recall $r")
  }

  test("IVF assigns every vector to exactly one cell") {
    val centroids = AnnIvf.fit(emb, "vec_id", "embedding", 16)
    val assigned = AnnIvf.assign(emb, centroids, "vec_id", "embedding")
    assert(assigned.count() === emb.count())
    assert(assigned.select("id").distinct().count() === emb.count())
  }
}

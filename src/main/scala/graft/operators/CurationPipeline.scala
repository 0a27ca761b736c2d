package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The composed training-data curation flow — the end-to-end shape a
  * 100 TB pipeline runs, built entirely from this library's operators:
  *
  *   1. exact dedup (normalized-text hash, keep first)
  *   2. near-dup clustering (MinHash-LSH pairs → connected components,
  *      keep each cluster's min id)
  *   3. benchmark decontamination (word 5-gram overlap semi-join)
  *   4. quality gates (composite score, repetition ratio, token count)
  *   5. deterministic content-hash sampling to the target rate
  *
  * Every stage is a narrow filter or a bucket-bounded join — nothing
  * materializes doc × doc, nothing collects to the driver, and the
  * whole flow is one lazy plan per stage boundary.
  *
  * Stages are computed as per-doc survival FLAGS on one frame rather
  * than as a chain of destructive filters: each keep/drop id set
  * (exact keepers, near-dup keepers, contaminated ids) is derived
  * once and left-joined back, then every stage verdict is a boolean
  * column. `curate` filters that frame; `funnel` aggregates it; and
  * `curateWithFunnel` does both in ONE action via `Dataset.observe` —
  * the funnel report rides the curation pass as accumulator metrics
  * instead of re-running a count per stage (at 100 TB, six extra
  * cumulative corpus scans).
  */
object CurationPipeline {

  case class Config(minHashTheta: Double = 0.8,
                    minQuality: Double = 0.4,
                    maxDupRatio: Double = 0.8,
                    minTokens: Int = 5,
                    sampleHex4: Option[String] = None)

  private val FLAGS = Seq("pass_exact", "pass_neardup", "pass_decontam",
    "pass_gate", "pass_sample")

  /** Stage-1 keeper ids: the min id per normalized-text hash. */
  private def exactKeepers(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(regexp_replace(trim(lower(col(textCol))), "[ \\t\\n\\x0B\\f\\r]+", " ")).as("h"))
      .agg(min(col(idCol)).as("keep_id"))
      .select(col("keep_id").as(idCol))

  /** Stage-2 keeper ids among `exact` survivors: each near-dup
    * component's min id (LSH pairs → connected components).
    * `exactIds` is the materialized keeper-id table — the exact node
    * universe of `exact` (r18, guide §3.3: passing the docs ⋈ keep1
    * join here made components re-run that corpus join just to read
    * the id column it already had). */
  private def nearDupKeepers(exact: DataFrame, exactIds: DataFrame,
                             idCol: String, textCol: String,
                             theta: Double): DataFrame = {
    val pairs = Dedup.minHashNearDups(exact, idCol, textCol, theta)
      .select(col("i"), col("j"))
    DedupCluster.components(exactIds, idCol, pairs)
      .filter(col("id") === col("cluster_id"))
      .select(col("id").as(idCol))
  }

  /** Stage-3 drop ids: docs sharing any word 5-gram with the benchmark. */
  private def contaminatedIds(df: DataFrame, idCol: String, textCol: String,
                              bench: DataFrame): DataFrame = {
    val benchSh = Dedup.shingleDf(bench, idCol, textCol, 5)
      .select(explode(col("sh")).as("g")).distinct()
    Dedup.shingleDf(df, idCol, textCol, 5)
      .select(col("id"), explode(col("sh")).as("g"))
      .join(benchSh, "g").select(col("id").as(idCol)).distinct()
  }

  /** One frame = `docs` + quality stats + cumulative survival flags
    * `pass_exact … pass_sample` (each stage ANDs the previous stage's
    * verdict, so `pass_sample` marks the final survivors). Each keep /
    * drop id set is derived exactly once; the flags themselves are
    * narrow codegen'd column math over three id-keyed left joins. */
  def flagged(docs: DataFrame, idCol: String, textCol: String,
              benchmark: Option[DataFrame] = None,
              config: Config = Config()): DataFrame = {
    // r18 (guide §3.3): keep1 is an id-sized table whose defining agg
    // (md5-normalize over the FULL corpus) is consumed three times —
    // the dedup join feeding LSH, the `deduped` contamination input,
    // and the flag join. Materialize it once; pre-r18 each consumer
    // re-ran the corpus-sized normalize+agg pass (3 corpus passes at
    // 100 TB for one id list).
    val keep1 = exactKeepers(docs, idCol, textCol).localCheckpoint(true)
    val exact = docs.join(keep1, idCol)
    val keep2 = nearDupKeepers(exact, keep1, idCol, textCol,
      config.minHashTheta)
    // contamination is a per-doc property, but deriving it from the
    // deduped survivors (not all of `docs`) keeps the shingle explode
    // proportional to what lives past dedup — the big win at scale.
    val deduped = exact.join(keep2, idCol)
    val withKeeps = docs
      .join(keep1.withColumn("_k1", lit(true)), Seq(idCol), "left")
      .join(keep2.withColumn("_k2", lit(true)), Seq(idCol), "left")
    val withCont = benchmark match {
      case Some(bench) => withKeeps.join(
        contaminatedIds(deduped, idCol, textCol, bench)
          .withColumn("_ct", lit(true)), Seq(idCol), "left")
      case None => withKeeps.withColumn("_ct", lit(false))
    }
    val tk = TextAnalysis.tokens(lower(col(textCol)))
    val samplePass = config.sampleHex4 match {
      case Some(hex) => Sampling.hashFilter(col(textCol), hex)
      case None => lit(true)
    }
    withCont
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("dup_ratio",
        lit(1.0) - size(array_distinct(tk)).cast("double") /
          greatest(size(tk), lit(1)).cast("double"))
      .withColumn("pass_exact", coalesce(col("_k1"), lit(false)))
      .withColumn("pass_neardup", col("pass_exact") && coalesce(col("_k2"), lit(false)))
      .withColumn("pass_decontam", col("pass_neardup") && !coalesce(col("_ct"), lit(false)))
      .withColumn("pass_gate", col("pass_decontam") &&
        col("quality") >= config.minQuality &&
        col("dup_ratio") <= config.maxDupRatio &&
        col("n_tokens") >= config.minTokens)
      .withColumn("pass_sample", col("pass_gate") && samplePass)
      .drop("_k1", "_k2", "_ct")
  }

  /** Curate `docs` (columns idCol, textCol) against an optional
    * benchmark set. Returns the surviving docs with their quality
    * stats attached. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             benchmark: Option[DataFrame] = None,
             config: Config = Config()): DataFrame =
    flagged(docs, idCol, textCol, benchmark, config)
      .filter(col("pass_sample"))
      .drop(FLAGS: _*)

  /** The curation FUNNEL: survivor count after every stage — the
    * accounting dashboard a production pipeline publishes per run
    * (which gate is eating the corpus?). One row per stage, cumulative
    * semantics (each stage filters the previous stage's survivors);
    * every count is an integer so the whole report is engine-exact.
    *
    * ONE pass: the six counts are conditional aggregates over the
    * flagged frame — each stage's keep-set sub-DAG runs once, versus
    * the naive shape where six `count()` branches each re-derive the
    * cumulative pipeline (recompute-×6 inverts at 100 TB). */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             benchmark: DataFrame, config: Config = Config()): DataFrame = {
    val counts = flagged(docs, idCol, textCol, Some(benchmark), config)
      .agg(count(lit(1)).as("c0"),
        count_if(col("pass_exact")).as("c1"),
        count_if(col("pass_neardup")).as("c2"),
        count_if(col("pass_decontam")).as("c3"),
        count_if(col("pass_gate")).as("c4"),
        count_if(col("pass_sample")).as("c5"))
    val names = Seq("total", "exact_dedup", "near_dedup", "decontaminated",
      "quality_gated", "sampled")
    counts.select(explode(array(names.zipWithIndex.map { case (nm, i) =>
      struct(lit(i).as("stage"), lit(nm).as("name"), col(s"c$i").as("n_docs"))
    }: _*)).as("f")).select(col("f.stage"), col("f.name"), col("f.n_docs"))
  }

  /** Curate AND account in one action: returns the curated frame with
    * the funnel counts attached as `Dataset.observe` metrics — running
    * any action on the returned frame populates the Observation with
    * keys `n_total, n_exact_dedup, … n_sampled` for free (accumulator
    * collection during the pass, zero extra jobs). The production
    * shape of [[funnel]]. */
  def curateWithFunnel(docs: DataFrame, idCol: String, textCol: String,
                       benchmark: DataFrame, config: Config = Config()
                      ): (DataFrame, Observation) = {
    val f = flagged(docs, idCol, textCol, Some(benchmark), config)
    val (instrumented, Some(obs)) = PipelineMetrics.observed(f, "curation_funnel", Map(
      "n_total" -> count(lit(1)),
      "n_exact_dedup" -> count_if(col("pass_exact")),
      "n_near_dedup" -> count_if(col("pass_neardup")),
      "n_decontaminated" -> count_if(col("pass_decontam")),
      "n_quality_gated" -> count_if(col("pass_gate")),
      "n_sampled" -> count_if(col("pass_sample"))))
    (instrumented.filter(col("pass_sample")).drop(FLAGS: _*), obs)
  }
}

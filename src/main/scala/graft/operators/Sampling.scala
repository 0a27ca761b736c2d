package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions.md5Prefix60

/** Deterministic content-hash sampling for training-data curation.
  *
  * `sample()`/`TABLESAMPLE` draw a different subset on every run and
  * every partitioning; a hash predicate on content draws the SAME
  * subset on any engine, any run, any cluster size — reproducible
  * splits, and a doc keeps its fate when the corpus is re-scanned
  * incrementally. Pure narrow filter: pushes into the scan, no shuffle,
  * no state.
  */
object Sampling {

  /** Keep rows whose md5(key) hex prefix sorts below `thresholdHex4`
    * (4 hex digits => rate ≈ parse(thresholdHex4, 16) / 65536; "1999"
    * ≈ 10%). Lexicographic compare of lowercase hex == numeric compare,
    * identical in any engine with md5. */
  def hashFilter(key: Column, thresholdHex4: String): Column =
    substring(md5(key.cast("string")), 1, 4) < lit(thresholdHex4.toLowerCase)

  def hashSample(df: DataFrame, keyCol: String, thresholdHex4: String): DataFrame =
    df.filter(hashFilter(col(keyCol), thresholdHex4))

  /** Exactly-k-per-stratum deterministic sample: rank rows inside each
    * stratum by md5(key) — a uniform, content-stable order — and keep
    * the first k. The fixed-size counterpart of `hashSample` (reservoir
    * sampling without the nondeterminism), the standard way to cut
    * per-source eval sets. One shuffle on the stratum; rank is a
    * per-group top-k, never a global sort. */
  def topKPerStratum(df: DataFrame, keyCol: String, stratumCol: String,
                     k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k).drop("_rk")
  }

  /** Weighted k-sample per stratum without replacement — Efraimidis &
    * Spirakis (IPL 2006): each row draws a deterministic uniform u from
    * md5(key) and ranks by ln(u)/w descending (equivalent to u^(1/w) —
    * heavier rows win more often, exactly proportionally). The content-
    * stable weighted counterpart of `topKPerStratum`: same one shuffle
    * on the stratum, per-group top-k rank, no global sort, reruns give
    * the same sample. u = (h + 0.5) / 2^60 from a 60-bit md5 prefix —
    * exact integer-to-double on any engine; only ln is transcendental,
    * and it decides only the ORDER, never an emitted value. */
  def weightedSample(df: DataFrame, keyCol: String, stratumCol: String,
                     weightCol: String, k: Int): DataFrame = {
    // fused native md5-60bit (value-identical to the
    // conv(substring(md5)) composition the oracles replay; the
    // long->double and decimal-string->double conversions both
    // correctly round the same 60-bit integer)
    val h = md5Prefix60(concat(lit("ws:"),
      col(keyCol).cast("string"))).cast("double")
    val esKey = log((h + lit(0.5)) /
      lit(1152921504606846976L).cast("double")) /
      col(weightCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(esKey.desc, col(keyCol).asc)
    // ES-sampling is defined for POSITIVE weights only — zero/negative
    // weights have zero selection probability, and their sort keys are
    // -Inf/NaN (double division never throws, even under ANSI) whose
    // ordering placement is engine-dependent; they are excluded, and
    // the oracle applies the same predicate.
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Per-stratum deterministic rates: stratum -> 4-hex-digit threshold,
    * e.g. downsample an over-represented source while keeping all of a
    * rare one. Unlisted strata are dropped. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           rates: Map[String, String]): DataFrame = {
    val threshold = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, hex)) =>
        when(col(stratumCol) === stratum, lit(hex.toLowerCase)).otherwise(acc)
    }
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 4) < threshold)
  }

  /** Deterministic k-fold assignment (cross-validation / sharded-eval
    * cut): fold = md5("fold:" + key) mod k — content-stable like every
    * split here (a doc keeps its fold across runs, engines, cluster
    * sizes, and incremental re-scans), uniform across folds, and a pure
    * projection (no shuffle, no state). */
  def kFold(df: DataFrame, keyCol: String, k: Int,
            foldCol: String = "fold"): DataFrame =
    df.withColumn(foldCol,
      md5Prefix60(concat(lit("fold:"), col(keyCol).cast("string"))) % k)

  /** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
    * 1998: a key lands on the shard whose md5(key:shard) score is
    * highest. The point vs `hash(key) % shards`: when the shard count
    * changes k -> k+1, mod reassigns ~k/(k+1) of all keys (every
    * output file rewrites), HRW moves EXACTLY the keys the new shard
    * now wins — 1/(k+1) of them, the provable minimum. That is the
    * reshard-stability primitive an incremental 100 TB pipeline needs:
    * growing the shard fan-out re-writes one new shard's worth of
    * data, not the corpus. Pure narrow projection (the score array is
    * shards-sized, built per row, no shuffle, no state); content-
    * stable like every assignment here — same key, same shard, on any
    * engine, any run, any cluster size. */
  def rendezvousShard(df: DataFrame, keyCol: String, shards: Int,
                      shardCol: String = "shard"): DataFrame = {
    val scores = transform(sequence(lit(0), lit(shards - 1)),
      sid => md5(concat(col(keyCol).cast("string"), lit(":"),
        sid.cast("string"))))
    df.withColumn(shardCol,
      (array_position(scores, array_max(scores)) - 1).cast("int"))
  }

  /** Temperature-weighted source mixing — the pretraining-mixture draw:
    * stratum s gets a sampling budget ∝ tokens(s)^0.5 (temperature
    * smoothing: α=0.5 upweights small sources vs proportional α=1),
    * spent as a deterministic per-stratum md5 rate, so the mixture is
    * reproducible across runs, engines, and cluster sizes, and a doc
    * keeps its fate on incremental re-scans.
    *
    * Thresholds are computed cross-engine-exactly: per-stratum weights
    * are round(sqrt(tokens), 6) doubles summed in DECIMAL (order-
    * independent, exact), the rate expression is a fixed IEEE tree
    * (bit-identical in any engine), and the resulting 32-bit threshold
    * compares as 8 lowercase hex chars against the md5 prefix. The
    * stats pass is one tiny aggregation (|strata| rows, broadcast
    * back); the sample itself is a narrow filter — no corpus shuffle.
    *
    * `budget` is the target sample fraction of total docs (caps at
    * keep-everything per stratum, where the leftover budget is NOT
    * redistributed — one pass, no iterative water-filling). */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
                     weight: Column, budget: Double = 0.3): DataFrame = {
    // r18 (guide §3.3): stats feeds tot and thr — checkpoint the
    // strata-sized rollup once (2 corpus scans → 1)
    val stats = df.groupBy(col(stratumCol).as("_st"))
      .agg(count(lit(1)).as("_n"),
        round(sqrt(sum(weight).cast("double")), 6).as("_w"))
      .localCheckpoint(true)
    val tot = stats.agg(
      sum(col("_n")).as("_ntot"),
      sum(col("_w").cast("decimal(18,6)")).cast("double").as("_sw"))
    val thr = stats.crossJoin(broadcast(tot))
      .select(col("_st"),
        floor((floor(col("_ntot").cast("double") * budget) * col("_w") /
          (col("_sw") * col("_n").cast("double"))) * lit(4294967296.0))
          .cast("long").as("_t"))
    df.join(broadcast(thr), col(stratumCol) === col("_st"))
      .filter(col("_t") > 4294967295L ||
        substring(md5(col(keyCol).cast("string")), 1, 8) <
          lower(lpad(hex(col("_t")), 8, "0")))
      .drop("_st", "_t")
  }

  /** DSIR-style importance weights for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023 — the hashed-n-gram variant at unigram granularity):
    * score each doc by the mean per-token log-likelihood ratio between
    * a TARGET distribution (the high-quality slice you want more of)
    * and the RAW corpus distribution, both estimated over `buckets`
    * hashed token buckets with add-1 smoothing. Docs that look like the
    * target score > 0; resampling by this weight tilts the pretraining
    * mixture toward the target domain without hand-written rules.
    *
    * Scale shape: ONE conditional bucket-count aggregation gets both
    * distributions (raw + target in the same pass; the bucket table is
    * `buckets`-sized and broadcasts back), then one per-doc mean — two
    * tokenize scans total (counts + scoring), deliberately NOT a
    * persist: at corpus scale re-reading a pruned columnar scan beats
    * caching one row per token (the unigramSurprisal tradeoff).
    * Determinism:
    * bucket ids are md5-prefix mod buckets (the kFold idiom — exact in
    * any engine); counts and totals are integers; each log-ratio is a
    * pure scalar double expression shared with the oracle, and the
    * per-doc mean surfaces through round(6) (the unigramSurprisal
    * rule). */
  /** The md5-mod token-bucket id — shared by the batch scorer and the
    * streaming literal-map scorer so both hash identically. */
  private def bucketOf(token: Column, buckets: Int): Column =
    md5Prefix60(token) % buckets

  /** (doc_id, is_t, b): one row per token occurrence. */
  private def tokenBuckets(docs: DataFrame, idCol: String, textCol: String,
                           targetFilter: Column, buckets: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), targetFilter.as("is_t"),
        explode(graft.functions.TextAnalysis.tokens(lower(col(textCol))))
          .as("token"))
      .select(col("doc_id"), col("is_t"), bucketOf(col("token"), buckets).as("b"))

  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetFilter: Column, buckets: Int = 1024): DataFrame = {
    val tk = tokenBuckets(docs, idCol, textCol, targetFilter, buckets)
    // r18 (guide §3.3): cnts feeds tot and lrs — checkpoint the
    // buckets-sized table once (each re-run was a tokenize pass)
    val cnts = tk.groupBy(col("b")).agg(count(lit(1)).as("rc"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"))
      .localCheckpoint(true)
    val tot = cnts.agg(sum(col("rc")).as("rt"), sum(col("tc")).as("tt"))
    val bL = buckets.toLong
    val lrs = cnts.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("tc") + 1L).cast("double") /
            (col("tt") + bL).cast("double")) -
          log((col("rc") + 1L).cast("double") /
            (col("rt") + bL).cast("double"))).as("lr"))
    tk.join(broadcast(lrs), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("lr")), 6).as("importance"))
  }

  /** Streaming-side DSIR scorer (the Vocab.encoderFor pattern): the
    * bucket log-ratio table collects into a LITERAL map — buckets-sized
    * by construction, the same bound its broadcast join already assumes
    * — so scoring an incoming doc is a pure projection: append-mode
    * streamable, zero state, zero shuffle. Unseen buckets (tokens the
    * reference corpus never hashed) fall back to the add-1-smoothing
    * default lr = ln(rt+B) − ln(tt+B), the exact value the batch
    * formula assigns a zero-count bucket. Per-bucket lr values are
    * computed with the same double ops as the batch plan, so scores
    * match importanceWeights to the shared round(6). */
  def importanceScorerFor(docs: DataFrame, idCol: String, textCol: String,
                          targetFilter: Column, buckets: Int = 1024)
      : Column => Column = {
    val tk = tokenBuckets(docs, idCol, textCol, targetFilter, buckets)
    val rows = tk.groupBy(col("b")).agg(count(lit(1)).as("rc"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rt = rows.map(_._2).sum
    val tt = rows.map(_._3).sum
    val bL = buckets.toLong
    def lr(rc: Long, tc: Long): Double =
      math.log((tc + 1L).toDouble / (tt + bL).toDouble) -
        math.log((rc + 1L).toDouble / (rt + bL).toDouble)
    val m: Map[Long, Double] = rows.map { case (b, rc, tc) => b -> lr(rc, tc) }.toMap
    val mapCol = typedLit(m)
    val default = lit(lr(0L, 0L))
    text => {
      val toks = graft.functions.TextAnalysis.tokens(lower(text))
      val s = aggregate(toks, lit(0.0), (acc, t) =>
        acc + coalesce(element_at(mapCol, bucketOf(t, buckets)), default))
      round(s / greatest(size(toks), lit(1)).cast("double"), 6)
    }
  }
}

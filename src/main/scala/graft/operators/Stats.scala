package graft.operators

import scala.jdk.CollectionConverters._

import graft.functions.GraftFunctions.rolling_hash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Distribution / statistics operators for profiling training corpora at
  * scale (north-star extension; complements [[Audit]]). Everything here is a
  * single map-side-combinable aggregation — one shuffle, no collect.
  */
object Stats {

  /** Exact linear-interpolation percentiles per group (SQL
    * `percentile_cont` semantics). Exact percentile buffers each group's
    * values, so it is the small-group / final-report path; for a 100 TB
    * column use [[approxPercentiles]] — same shape, sketch-based. */
  def percentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  ps: Seq[Double], out: String = "pct"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.GraftFunctions.exact_percentiles(col(valueCol), ps).as(out))

  /** t-digest-style approximate percentiles — constant memory per group,
    * the 100 TB scale path (not oracle-comparable: sketch contents are
    * engine-specific). */
  def approxPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(ps.map(lit): _*), lit(accuracy)).as("pct"))

  /** Fixed-width histogram: bucket = floor(value / width). Pure integer
    * bucketing keyed before a count aggregate — reproducible across engines
    * and map-side combinable. */
  def histogram(df: DataFrame, value: Column, width: Double): DataFrame =
    df.groupBy(floor(value / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Pearson correlation + population covariance/stddev of two columns per
    * group — the moment sketches merge associatively, so this is one
    * partial-aggregated shuffle at any scale. */
  def corrStats(df: DataFrame, groupCols: Seq[String],
                x: String, y: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(corr(col(x), col(y)), 6).as("corr_xy"),
        round(covar_pop(col(x), col(y)), 4).as("covar_xy"),
        round(stddev_pop(col(x)), 6).as("sd_x"),
        round(stddev_pop(col(y)), 6).as("sd_y"))

  /** Per-group simple linear regression, closed form: slope, intercept and
    * r-squared of `y ~ x` from the SQL-standard `regr_*` aggregates — ONE
    * map-side-combinable hash aggregate, so a million-group regression over
    * 100 TB is a single pass with group-count-sized shuffle (the
    * "fit a trend per key" primitive: bytes-over-time per source, score
    * drift per shard). Estimates are rounded to 6 dp for cross-engine
    * float parity, like [[corrStats]]. */
  def groupLinearFit(df: DataFrame, groupCols: Seq[String],
                     x: String, y: String): DataFrame =
    // backtick-quoted so names with spaces/dots resolve as plain columns
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(expr(s"regr_slope(`$y`, `$x`)"), 6).as("slope"),
        round(expr(s"regr_intercept(`$y`, `$x`)"), 6).as("intercept"),
        round(expr(s"regr_r2(`$y`, `$x`)"), 6).as("r2"))

  /** Universal-hash mix constants for [[hashBucket]] — public so the DuckDB
    * oracle SQL reproduces the exact bucket assignment. */
  val MixA: Long = 73244475L
  val MixB: Long = 987654321L

  /** CDF of Poisson(1) at 0..3 — the [[bootstrapMeanCI]] weight thresholds,
    * public so the DuckDB oracle interpolates the IDENTICAL literals. */
  val PoissonCdf1: Seq[Double] = Seq(0.36787944117144233, 0.7357588823428847,
    0.9196986029286058, 0.9810118431238462)

  /** Poisson-bootstrap confidence interval for a per-group mean
    * (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
    * 2012 — the distributed bootstrap): classical resampling-with-
    * replacement needs the row count up front and a shared RNG; the
    * Poisson(1) approximation gives every row an INDEPENDENT deterministic
    * weight per replica, so the whole estimator is one embarrassingly
    * parallel pass. Weights are reproducible across engines, runs, and
    * retries, like every sampler here: the key hashes ONCE per row, then
    * replica `b` derives its uniform from `((h+b)^2 mod p) * A + B mod p` —
    * the SQUARE makes the inter-replica step row-dependent (an affine-in-b
    * derivation would shift every row's uniforms by the same constant,
    * making replicas deterministic rotations of each other and corrupting
    * the bootstrap variance; pairwise-decorrelated, not cryptographic) —
    * through the inverse Poisson(1) CDF (weight 4+ is truncated to 4;
    * P = 1 - CDF(3) ~ 1.9%, negligible for CI purposes and keeps the
    * threshold chain short). Null `valueCol` rows are excluded up front
    * (the avg-ignores-null convention — their weight would otherwise drag
    * every replica mean toward zero while the reported mean excluded
    * them); a null KEY fails loudly (it would silently take the fall-
    * through maximum weight in every replica).
    *
    * Scale shape: the per-row pass is ONE
    * [[graft.functions.BootstrapMeans]] aggregate whose buffer holds all
    * `2·replicas` running sums — no rows × replicas blowup anywhere;
    * partials combine map-side, so the only exchange carries one
    * O(replicas)-double buffer per (group, partial); the percentile over
    * replica means buffers `replicas` values per group —
    * driver-bounded by construction. Output
    * (groupCols, n, mean, ci_lo, ci_hi), 6-dp rounded. */
  def bootstrapMeanCI(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      key: Column, replicas: Int = 100,
                      alpha: Double = 0.05): DataFrame = {
    require(replicas >= 2, s"bootstrapMeanCI needs >= 2 replicas, got $replicas")
    require(alpha > 0 && alpha < 1, s"bootstrapMeanCI alpha must be in (0,1), got $alpha")
    // the string hash runs ONCE per row; each replica derives its uniform
    // arithmetically (hashing (key | b) strings per (row x replica) was
    // 100x the character work). (h + b) < p + replicas, so the square
    // stays under 2^63 for any sane replica count.
    val base = df
      .where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("_x") :+
        when(key.isNull, expr("raise_error('bootstrapMeanCI: null resampling key')"))
          .otherwise(mixHash(key.cast("string"))).as("_h"): _*)
    // One fused aggregate pass computes every replica's (Σw, Σw·x) from
    // the per-row hash — rows, not rows × replicas, cross the plan (the
    // earlier explode form pushed 60M rows through a (group, replica)-
    // keyed hash aggregate at sf0.1; the replica loop is now register
    // arithmetic inside BootstrapMeans). Zero-weight replicas come back
    // null — the same CASE the oracle mirrors (DuckDB's IEEE division
    // would otherwise produce a NaN that sorts greatest) — and explode
    // keeps null ELEMENTS as rows, so the percentile sees the identical
    // replica set.
    val repMeans = base.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.GraftFunctions
        .bootstrap_means(col("_x"), col("_h"), replicas).as("_bms"))
      .select(groupCols.map(col) :+ explode(col("_bms")).as("_bm"): _*)
    val ci = repMeans.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(_bm, ${alpha / 2})").as("_lo"),
        expr(s"percentile(_bm, ${1 - alpha / 2})").as("_hi"))
    df.groupBy(groupCols.map(col): _*)
      // count(valueCol): n is the number of values the mean AND the
      // replicas actually use, not the raw row count
      .agg(count(col(valueCol)).as("n"), avg(col(valueCol)).as("_mean"))
      .join(broadcast(ci), groupCols)
      .select(groupCols.map(col) :+ col("n") :+
        round(col("_mean"), 6).as("mean") :+
        round(col("_lo"), 6).as("ci_lo") :+
        round(col("_hi"), 6).as("ci_hi"): _*)
  }

  /** Portable uniform bucket in [0, buckets): a universal-hash finisher
    * `(h·A + B) mod p` (p = the rolling hash's prime modulus) applied
    * BEFORE the bucket modulus. The raw polynomial hash is NOT uniform
    * under a small modulus on structured keys: keys sharing a long prefix
    * (URLs, "doc 1"/"doc 2", …) land in narrow contiguous value bands, so
    * `rh(k) % m` keeps all-or-none of each band — a 200:1-skew fixture
    * starved an entire stratum that way. The affine map over the prime
    * field is a bijection that scatters contiguous bands across the full
    * range (Carter–Wegman universal hashing); the max intermediate
    * `(p-1)·A + B` is ~2^56, comfortably inside 63-bit arithmetic on both
    * engines. Pure codegen'd column arithmetic — no UDF, no shuffle. */
  /** The raw universal-hash finisher over the full prime field — the ONE
    * Scala site of the mix ([[hashBucket]] and [[takePerStratum]] both
    * derive from it; the DuckDB twin is SparkEntry's `dmix` fragment). */
  def mixHash(key: Column): Column =
    (rolling_hash(key) * MixA + MixB) % graft.functions.RollingHash.Mod

  def hashBucket(key: Column, buckets: Int): Column = mixHash(key) % buckets

  /** Deterministic hash sample: keep rows whose [[hashBucket]] of `key`
    * falls in the lowest `pct` buckets of 100. Unlike `rand()`-based
    * sampling this is reproducible across engines, runs, and retries — the
    * property a training-data pipeline needs so re-runs don't churn the
    * corpus. */
  def sampleByHash(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.where(hashBucket(key, 100) < pct)

  /** Stratified deterministic sampling: per-stratum keep rates (percent of
    * 100), default for unlisted strata. The data-mix lever of a training
    * pipeline (e.g. upsample low-resource languages) — same reproducibility
    * guarantee as [[sampleByHash]], still one codegen'd scan, no shuffle. */
  def stratifiedSampleByHash(df: DataFrame, key: Column, strata: Column,
                             rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (value, pct)) => when(strata === value, lit(pct)).otherwise(acc)
    }
    df.where(hashBucket(key, 100) < rate)
  }

  /** Deterministic EXACT-COUNT per-stratum sample: exactly min(k, |stratum|)
    * rows per stratum, the rows whose universal-mixed hash of `key` ranks
    * lowest (ties broken by `key`, then `tieBreak`) — the "exactly 1000
    * eval docs per language" operator. Rate-based sampling
    * ([[stratifiedSampleByHash]], [[mixtureResample]]) can only pin an
    * EXPECTED count; this pins the exact count, still reproducible across
    * engines, runs, and retries, and PREFIX-STABLE: the k-sample is a
    * subset of the (k+n)-sample, so growing an eval set never churns the
    * rows already in it. Pass a unique `tieBreak` column when `key` can
    * repeat (identical texts hash identically) — without it the pick among
    * exact duplicates is undefined.
    *
    * Scale shape: one stratum-keyed Exchange + per-partition sort (the
    * standard top-k-per-group window); no collect, no driver state. A
    * skewed stratum costs sort time, not memory — rank state is O(1). */
  def takePerStratum(df: DataFrame, strata: Column, key: Column, k: Int,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    val h = mixHash(key)
    val w = Window.partitionBy(strata)
      .orderBy(h.asc +: key.asc +: tieBreak.map(col(_).asc): _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** WEIGHTED sampling without replacement, exactly min(k, |group|) rows
    * per group with inclusion probability proportional to `weightCol`
    * (Efraimidis–Spirakis 2006's A-ES scheme): rank rows by
    * `ln(u) / w` descending — equivalent to the paper's `u^(1/w)` key —
    * where `u` is the deterministic universal-mix hash of `hashKey`
    * ([[mixHash]], the engine-portable randomness every sampler here
    * uses), so the sample is reproducible across engines, runs, and
    * retries, and PREFIX-STABLE (the k-sample is a subset of the
    * (k+n)-sample, [[takePerStratum]]'s eval-set property). The
    * weighted counterpart of [[takePerStratum]]'s uniform draw, and the
    * keep-k form of [[graft.operators.Dedup.softDedupWeights]]' keep-
    * probabilities — "sample 10k docs per language, longer/cleaner docs
    * proportionally more often" is this operator.
    *
    * Rows with weight <= 0 are never sampled (dropped before ranking —
    * the A-ES key is undefined there). `tieBreak` is REQUIRED non-empty:
    * rows with identical (hashKey, weight) — exact-duplicate texts, which
    * a crawl corpus always contains — have identical A-ES keys, so
    * without a total tie-break the pick among them is engine/run
    * dependent, silently breaking the reproducibility contract. Pass a
    * unique id column. Scale shape: one codegen'd key
    * projection + one group-keyed rank window carrying df's columns;
    * nothing corpus-sized beyond the one exchange, no fit pass at all. */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
                             hashKey: Column, weightCol: String, k: Int,
                             tieBreak: Seq[String]): DataFrame = {
    require(k >= 1, s"weightedSamplePerGroup needs k >= 1, got $k")
    require(tieBreak.nonEmpty,
      "weightedSamplePerGroup needs a non-empty tieBreak (a unique id " +
        "column): equal-key duplicate rows are otherwise ordered " +
        "arbitrarily, breaking run-to-run reproducibility")
    require(!df.columns.contains("sample_rank") && !df.columns.contains("_es"),
      "weightedSamplePerGroup emits sample_rank and reserves _es")
    val u = (hashBucket(hashKey, 1000000) + lit(0.5)) / lit(1000000.0)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_es").desc +: tieBreak.map(col(_).asc): _*)
    df.where(col(weightCol) > 0)
      .withColumn("_es", log(u) / col(weightCol))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
      .drop("_es")
  }

  /** Token-budget mixture plan — the Llama/DoReMi-style data-mix
    * calculator: given per-stratum target weights and a TOTAL token
    * budget, report per stratum the available tokens, the target tokens
    * (`share x budget`), the epochs needed (`target / available` — above
    * 1 means repeating the source), the sub-1-epoch keep rate, and an
    * `over_cap` flag where epochs exceed `maxEpochs` (the
    * data-constrained-scaling guardrail: repeating a source beyond ~4
    * epochs stops helping, Muennighoff et al. 2023 — the weights or the
    * budget must change, and this is the report that says so BEFORE a
    * run burns compute). [[mixtureResampleToWeights]] answers the dual
    * question (largest duplication-free N at the exact mix); this one
    * fixes the budget and allows repetition.
    *
    * Weight shares normalize over the sorted-key sum (deterministic fold
    * order — FP-reproducible against the oracle). One stratum-keyed
    * map-side-combinable aggregate + a broadcast weights join; the
    * output is |strata|-row. Strata without a weight drop (inner join),
    * matching [[mixtureResampleToWeights]]' contract. */
  def tokenBudgetPlan(docs: DataFrame, strataCol: Column, tokenCountCol: Column,
                      weights: Map[String, Double], budgetTokens: Long,
                      maxEpochs: Double = 4.0): DataFrame = {
    require(weights.nonEmpty, "tokenBudgetPlan needs >= 1 target weight")
    require(budgetTokens > 0, s"tokenBudgetPlan needs budgetTokens > 0, got $budgetTokens")
    require(maxEpochs > 0, s"tokenBudgetPlan needs maxEpochs > 0, got $maxEpochs")
    weights.foreach { case (s, w) =>
      require(w > 0 && !w.isNaN && !w.isInfinite,
        s"tokenBudgetPlan: weight for stratum '$s' must be finite and > 0, got $w")
    }
    val wSum = weights.toSeq.sortBy(_._1).map(_._2).sum
    val spark = docs.sparkSession
    import scala.jdk.CollectionConverters._
    val wdf = spark.createDataFrame(
      weights.toSeq.sortBy(_._1).map { case (s, w) => Row(s, w / wSum) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("stratum",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_share",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    docs.groupBy(strataCol.cast("string").as("stratum"))
      .agg(sum(tokenCountCol).cast("long").as("avail_tokens"))
      .join(broadcast(wdf), "stratum")
      .select(col("stratum"), col("avail_tokens"),
        round(col("_share"), 6).as("share"),
        round(col("_share") * budgetTokens, 0).cast("long").as("target_tokens"),
        round(col("_share") * budgetTokens / col("avail_tokens"), 6).as("epochs"))
      .withColumn("keep_rate", round(least(lit(1.0), col("epochs")), 6))
      .withColumn("over_cap", col("epochs") > maxEpochs)
  }

  /** Mixture rebalancing: deterministically downsample every stratum to the
    * size of the SMALLEST one (keep rate = ceil(1e6·min/count) parts per
    * million), so the output is a near-uniform mix — the data-side fix for
    * domain/language imbalance before training. Unlike
    * [[stratifiedSampleByHash]] the rates are DERIVED from the data, so
    * re-running after ingest keeps the mix balanced without retuning
    * constants; row selection stays hash-deterministic, so retries and
    * engine swaps keep the same rows.
    *
    * Rate resolution matters on real web-corpus skew: an integer PERCENT
    * (floor(100·min/cnt)) hits 0 for any stratum more than 100× the smallest
    * and silently deletes it — and >100× is routine for en vs a low-resource
    * language. Per-million rates push that cliff to 1e6×, and the CEIL keeps
    * the expected kept count of every stratum ≥ min (never 0): a stratum
    * keeps ceil(1e6·min/cnt)/1e6 · cnt ≥ min expected rows, capped at 100%
    * for the smallest stratum itself.
    *
    * Scale shape: the fit is one map-side-combined count per stratum (a
    * stratum-sized frame), re-aggregated to the min and broadcast back; the
    * corpus side is one codegen'd scan + filter — never shuffled. Output
    * keeps the input schema plus `keep_ppm`.
    */
  def mixtureResample(df: DataFrame, strata: Column, key: Column): DataFrame = {
    val counts = df.groupBy(strata.as("_stratum"))
      .agg(count(lit(1)).as("_cnt"))
    // global-window min over the STRATUM-SIZED fit frame, not a separate
    // agg + join-back: the latter duplicates the whole count subtree in
    // the plan (no exchange reuse under AQE) and scans the corpus twice
    val rates = counts
      .withColumn("_min", min(col("_cnt")).over(Window.partitionBy()))
      .select(col("_stratum"),
        least(ceil(lit(1000000.0) * col("_min") / col("_cnt")), lit(1000000L))
          .cast("long").as("keep_ppm"))
    df.join(broadcast(rates), strata === col("_stratum"))
      .where(hashBucket(key, 1000000) < col("keep_ppm"))
      .drop("_stratum")
  }

  /** Mixture resampling to SPECIFIED target shares — the real pretraining
    * mix (e.g. 60% web / 30% code / 10% books), where [[mixtureResample]]
    * only flattens to uniform. `weights` maps stratum value (as string) to
    * its target share; shares are normalized, so 60/30/10 and 6/3/1 mean
    * the same mix. Rows are NEVER duplicated (upsampling caps at 1×): the
    * output is the LARGEST corpus with exactly the target mix that
    * sampling-without-replacement allows — total `N = min over strata of
    * count_s / share_s`, so the scarcest-relative-to-its-target stratum
    * (the bottleneck) keeps 100% (its rate caps at exactly 1e6 ppm) and
    * every other stratum downsamples to `N·share_s` expected rows. Strata
    * absent from `weights` are dropped (share 0). Selection stays
    * hash-deterministic per row — same engine/retry/rerun keeps the same
    * rows, and the kept set only shrinks monotonically as a stratum's
    * rate falls. Rates use the same ppm resolution + `ceil` floor as
    * [[mixtureResample]] (integer-percent cliffs delete low-resource
    * strata; see that scaladoc).
    *
    * Scale shape: identical to [[mixtureResample]] — one map-side-combined
    * count per stratum, rates derived on the (stratum-sized) fit frame
    * with the weights riding as a broadcast literal table, one broadcast
    * join back; the corpus is scanned once and never shuffled. Output
    * keeps the input schema plus `keep_ppm`.
    */
  def mixtureResampleToWeights(df: DataFrame, strata: Column, key: Column,
                               weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "mixtureResampleToWeights needs >= 1 target weight")
    weights.foreach { case (s, w) =>
      require(w > 0 && !w.isNaN && !w.isInfinite,
        s"mixtureResampleToWeights: weight for stratum '$s' must be finite and > 0, got $w")
    }
    val wSum = weights.values.sum
    val spark = df.sparkSession
    val wdf = spark.createDataFrame(weights.toSeq.map { case (s, w) =>
      Row(s, w / wSum)
    }.asJava, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_stratum",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_share",
        org.apache.spark.sql.types.DoubleType, nullable = false))))
    val counts = df.groupBy(strata.cast("string").as("_stratum"))
      .agg(count(lit(1)).as("_cnt"))
      .join(wdf, "_stratum") // inner: unweighted strata drop here
    // largest total N with the exact mix and no duplication — a global
    // window over the stratum-sized fit, for the same single-subtree
    // reason as [[mixtureResample]]
    val rates = counts
      .withColumn("_n", min(col("_cnt") / col("_share")).over(Window.partitionBy()))
      .select(col("_stratum"),
        least(ceil(lit(1000000.0) * col("_n") * col("_share") / col("_cnt")),
          lit(1000000L)).cast("long").as("keep_ppm"))
    df.join(broadcast(rates), strata.cast("string") === col("_stratum"))
      .where(hashBucket(key, 1000000) < col("keep_ppm"))
      .drop("_stratum")
  }

  /** Temperature-based mixture resampling — the multilingual-pretraining
    * alpha-sampling rule (Conneau et al. 2020 §3.1 "Scaling to a hundred
    * languages"; also mT5): target share of stratum `s` is
    * `count_s^alpha / sum(count^alpha)`, smoothing the empirical mix
    * toward uniform as `alpha` falls. The two existing mixers are its
    * endpoints — `alpha = 1` reproduces the input mix exactly (every rate
    * caps at 1e6 ppm: nothing dropped), `alpha = 0` is uniform shares,
    * i.e. [[mixtureResample]]'s flatten-to-smallest. In between, dominant
    * strata downsample and low-resource strata keep 100% of their rows
    * (never duplicated — same 1× upsample cap, largest-N derivation, ppm
    * resolution, and hash-deterministic row selection as
    * [[mixtureResampleToWeights]], whose scaladoc documents the cliffs).
    *
    * Scale shape: identical to [[mixtureResampleToWeights]] minus the
    * weights table — one map-side-combined count per stratum, shares and
    * rates derived on the stratum-sized fit frame (two whole-frame
    * windows over a handful of rows), one broadcast join back; the corpus
    * is scanned once and never shuffled. Output keeps the input schema
    * plus `keep_ppm`.
    *
    * Oracle parity note: shares go through `pow`/`sum`-of-doubles, so a
    * cross-engine ULP difference could in principle flip a `ceil` cliff;
    * with ~1e-15 relative error against ppm-integer cliffs the flip
    * probability is ~1e-9 per stratum, and the one systematic boundary
    * (the bottleneck stratum's rate ≈ exactly 1e6) is safe on both sides
    * of the cliff because `least(…, 1e6)` collapses them. */
  def mixtureResampleTemperature(df: DataFrame, strata: Column, key: Column,
                                 alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1 && !alpha.isNaN,
      s"mixtureResampleTemperature needs 0 <= alpha <= 1, got $alpha")
    val counts = df.groupBy(strata.cast("string").as("_stratum"))
      .agg(count(lit(1)).as("_cnt"))
    val whole = Window.partitionBy()
    val rates = counts
      .withColumn("_share",
        pow(col("_cnt"), lit(alpha)) / sum(pow(col("_cnt"), lit(alpha))).over(whole))
      .withColumn("_n", min(col("_cnt") / col("_share")).over(whole))
      .select(col("_stratum"),
        least(ceil(lit(1000000.0) * col("_n") * col("_share") / col("_cnt")),
          lit(1000000L)).cast("long").as("keep_ppm"))
    df.join(broadcast(rates), strata.cast("string") === col("_stratum"))
      .where(hashBucket(key, 1000000) < col("keep_ppm"))
      .drop("_stratum")
  }

  /** Budget-capped corpus selection — the data-curation closing move:
    * rank rows by `order` (typically quality DESC with an id tiebreak) and
    * keep the maximal prefix whose running `valueCol` total stays within
    * `budget` ("fill a 1B-token budget with the best documents first").
    * Exact greedy-prefix semantics: a row is kept iff its inclusive
    * running total `out` <= `budget`, which equals the single-partition
    * window `sum(v) OVER (ORDER BY …)` filter value-for-value but runs as
    * [[Batching.prefixSumBy]]'s two-phase distributed scan. `valueCol`
    * must be a non-negative long — a negative value would make the
    * running total non-monotone and the kept set would no longer be a
    * prefix of the ranking.
    *
    * Scale shape: one range-partitioned global sort (the honest cost of
    * an exact budget cut) + two passes over the sorted data; no
    * single-partition stage. For a cheaper approximate cut at 100 TB,
    * derive a score threshold from a quantile sketch
    * ([[approxPercentiles]]) and filter — O(scan) but only
    * approximately budget-sized; this operator is the exact path. */
  def selectByBudget(df: DataFrame, order: Seq[Column], valueCol: String,
                     budget: Long, out: String = "cum"): DataFrame = {
    require(budget >= 0, s"selectByBudget needs budget >= 0, got $budget")
    Batching.prefixSumBy(df, order, valueCol, out).where(col(out) <= budget)
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    * pick the raw-pool documents that look most like a TARGET corpus under
    * hashed-n-gram importance weights, by Gumbel-top-k resampling. The
    * data-SELECTION stage of an LLM pipeline ([[mixtureResample]] reweights
    * known strata; this learns what to keep from an in-domain exemplar
    * corpus): fit two add-`alpha`-smoothed multinomials over hashed unigram
    * buckets — p from `targetPred` docs, q from the rest (the pool) — then
    * each pool doc's log importance weight is Σ_tokens log(p(b)/q(b)), and
    * the kept set is the top ceil(|pool|·keepFrac) by `log_weight + Gumbel`
    * where the Gumbel noise is HASH-SEEDED from the text ([[mixHash]]'s
    * universal mix, u = (bucket+0.5)/1e6, g = −ln(−ln u)) — Gumbel-top-k
    * equals sampling WITHOUT replacement ∝ exp(log_weight), but stays
    * reproducible across engines, runs, and retries like every sampler
    * here. Output: kept docs as (idCol, n_tokens, log_weight, sel_key),
    * both doubles 6-dp-rounded, ties broken by id.
    *
    * One EAGER action at call time (the pool count sizing k — a
    * metadata-cheap columnar count; batch-only contract like
    * [[Quality.fitLinearProbe]]).
    *
    * Scale shape: one corpus explode feeds a map-side-combinable aggregate
    * reducing to `nBuckets` rows; the bucket→log-ratio table is broadcast
    * back (nBuckets ≤ a few thousand — never a shuffle of the corpus), so
    * the per-doc weight is explode + broadcast-join + one id-keyed
    * aggregate; selection is distributed top-k (TakeOrderedAndProject —
    * no global sort, no single partition). The explode is shared CTE-style
    * between fit and scoring: Spark recomputes it once per aggregate over
    * the same scan, both arms map-side. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, nBuckets: Int = 256, alpha: Double = 0.5,
                 keepFrac: Double = 0.25): DataFrame = {
    require(nBuckets > 0, s"dsirSelect needs nBuckets > 0, got $nBuckets")
    require(alpha > 0, s"dsirSelect needs alpha > 0, got $alpha")
    require(keepFrac > 0 && keepFrac <= 1,
      s"dsirSelect needs keepFrac in (0, 1], got $keepFrac")
    val toks = docs.select(col(idCol), targetPred.as("_tgt"),
        explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .select(col(idCol), col("_tgt"), (rolling_hash(col("_w")) % nBuckets).as("_b"))
    val counts = toks.groupBy("_b").agg(
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"),
      sum(when(col("_tgt"), 0L).otherwise(1L)).as("_cr"))
    val tot = counts.agg(sum("_ct").as("_nt"), sum("_cr").as("_nr"))
    val ratio = counts.crossJoin(broadcast(tot))
      .select(col("_b"),
        (log((col("_ct") + alpha) / (col("_nt") + alpha * nBuckets)) -
          log((col("_cr") + alpha) / (col("_nr") + alpha * nBuckets))).as("_lw"))
    val perDoc = toks.where(!col("_tgt"))
      .join(broadcast(ratio), Seq("_b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("_lw").as("_logw"))
    val keyed = perDoc.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col(idCol), col("n_tokens"),
        round(col("_logw"), 6).as("log_weight"),
        round(col("_logw") -
          log(-log((hashBucket(col(textCol), 1000000) + 0.5d) / 1000000.0d)), 6)
          .as("sel_key"))
    // limit() is Int-bound: beyond ~2^31 kept docs the .toInt would wrap
    // silently — fail loudly and point at the batch-size contract instead
    // (at 100 TB, run dsirSelect per corpus shard like fitLinearProbe's
    // documented batching, not over one 2B+-doc pool).
    val kLong = math.ceil(docs.where(!targetPred).count() * keepFrac).toLong
    require(kLong <= Int.MaxValue,
      s"dsirSelect keep count $kLong exceeds Int.MaxValue (limit() is " +
        "Int-bound) — shard the pool and select per shard")
    keyed.orderBy(col("sel_key").desc, col(idCol)).limit(kLong.toInt)
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns —
    * the re-identification-risk gate a release pipeline runs on
    * metadata BEFORE it ships (Sweeney 2002; Machanavajjhala et al.
    * 2007): regex PII scrubs (q52/q152) catch direct identifiers, but a
    * row whose (nation, segment, ...) combination is shared by fewer
    * than `k` people is re-identifiable by LINKING, and a class whose
    * `sensitiveCol` takes fewer than `l` distinct values leaks the
    * sensitive attribute even at k-anonymity (the homogeneity attack).
    * Emits one row per equivalence class: class size, distinct
    * sensitive values, both flags — the classes failing either bound
    * are exactly the rows to generalize or suppress.
    *
    * Scale shape: ONE (QI-keyed) hash aggregate — count + exact
    * count-distinct over the class — then flag arithmetic; the shuffle
    * carries one row per CLASS. Exact distinct within a class is
    * group-bounded (a class's sensitive-value set, not the corpus's);
    * for classes that could themselves explode, swap in
    * `approx_count_distinct` the way q34/q59 document. */
  def kAnonymity(df: DataFrame, qidCols: Seq[String], sensitiveCol: Column,
                 k: Int, l: Int): DataFrame = {
    require(qidCols.nonEmpty, "kAnonymity needs at least one quasi-identifier column")
    require(k >= 1, s"kAnonymity needs k >= 1, got $k")
    require(l >= 1, s"kAnonymity needs l >= 1, got $l")
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitiveCol).as("l_distinct"))
      .withColumn("k_anonymous", col("class_size") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
  }
}

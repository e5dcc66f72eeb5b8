package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering — the multi-dimensional
  * counterpart of [[Compaction]]'s small-files pass and the third lake-
  * maintenance lever next to [[BucketedLayout]] (join locality) and
  * [[SplitLayout]] (scan width): cluster rows so that parquet min/max
  * zone maps prune file reads for range predicates on SEVERAL columns at
  * once (Delta `OPTIMIZE ZORDER BY` / Iceberg `rewrite_data_files`
  * z-order strategy do exactly this).
  *
  * A linear sort on column A gives perfect pruning on A and none on B; a
  * Z-order interleaves the bucket-rank bits of A and B into one key, so
  * sorting by that key keeps rows close in BOTH dimensions — every file
  * covers a small (A, B) rectangle and a 2-D box predicate touches only
  * the files whose rectangle intersects it. At 100 TB the scan byte
  * count for a selective 2-D slice (one user cohort in one time window,
  * one geo cell in one date range) drops by the product of the two
  * per-dimension selectivities instead of the better single one.
  *
  * Two bucket maps, same interleave:
  *  - EQUI-WIDTH ([[withZKey]]) over the column's observed [min, max] in
  *    pure int64 arithmetic — `((x - min) * 2^bits) div (max - min + 1)` —
  *    exactly reproducible across engines (no float boundaries; the q195
  *    oracle recomputes it in SQL). The demonstration/oracle choice, and
  *    fine for near-uniform keys.
  *  - RANK-BUCKETED ([[withRankZKey]]) via sampled quantile bounds, the
  *    `repartitionByRange` discipline — the PRODUCTION choice for skewed
  *    keys: equi-width collapses a Zipfian column into a handful of
  *    populated buckets (most of the value range is empty) and the 2-D
  *    pruning evaporates; rank buckets hold ~equal ROW MASS each, so the
  *    z-curve keeps spreading rows across all 2^bits cells per dimension
  *    no matter how skewed the values (ClusteringSpec measures the
  *    difference on a Zipfian user_id).
  * Both fits follow the [[graft.operators.Encode]] fit-then-transform
  * contract (one bounded fit — an aggregate row / a quantile sketch —
  * broadcast into a narrow projection), never a window: a `percent_rank`
  * over the corpus would be a single-partition sort, the exact
  * anti-pattern this module exists to avoid.
  */
object Clustering {

  /** Largest total key width that still fits a signed long with headroom. */
  private val MaxKeyBits = 62

  /** Equi-width int64 bucket of `x` over the CLOSED range [mn, mx] into
    * `2^bits` buckets: `((x - mn) * 2^bits) div (mx - mn + 1)`. Pure
    * integer arithmetic — engine-exact. `x` must lie within [mn, mx]
    * (callers fit mn/mx on the same frame they bucket). The caller must
    * keep `(mx - mn) * 2^bits` inside int64 — epoch-microsecond spans up
    * to ~290 years hold at bits <= 10. */
  def equiWidthBucket(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bucket bits must be in [1, 20], got $bits")
    // `div` = IntegralDivide: exact int64 quotient. A double `/` + floor
    // would be inexact once (x - mn) * 2^bits exceeds 2^53 — epoch-micros
    // spans get there.
    call_function("div", (x - mn) * lit(1L << bits), mx - mn + lit(1L))
  }

  /** Morton interleave of pre-bucketed int64 columns, each in
    * [0, 2^bits): bit `i` of bucket `j` lands at key bit
    * `i * n + (n - 1 - j)`, so the FIRST column owns the most significant
    * bit of each group — the conventional z-curve orientation. Pure
    * shift/mask/sum arithmetic: codegen'd in Spark, re-expressible
    * verbatim in ANSI SQL for the oracle. */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "zValue needs at least one bucket column")
    require(bits >= 1 && buckets.size * bits <= MaxKeyBits,
      s"zValue: ${buckets.size} cols x $bits bits exceeds $MaxKeyBits key bits")
    val n = buckets.size
    val terms = for {
      (b, j) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + (n - 1 - j))
    terms.reduce(_ + _)
  }

  /** Fit min/max for `cols` on `df` and return `df` extended with
    * per-column `_zb_<col>` buckets and the interleaved `zkey`. One
    * aggregate row crosses to the driver-free broadcast join; the bucket
    * and interleave math is a narrow codegen'd projection. */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty, "withZKey needs at least one column")
    val fitted = df.agg(
      cols.flatMap(c => Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c"))).head,
      cols.flatMap(c => Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c"))).tail: _*)
    // enforce the int64 contract LOUDLY: for a wide-range column (e.g.
    // hash-valued longs) `(x - mn) * 2^bits` silently wraps in non-ANSI
    // Spark, producing negative buckets and a garbage layout while a SQL
    // oracle on the same math errors — a cross-engine divergence. The
    // check rides on the 1-row stats frame, so it costs one comparison,
    // not one per data row.
    val maxSpan = Long.MaxValue >> bits
    val stats = fitted.select(cols.flatMap { c =>
      // try_subtract: mx - mn can ITSELF overflow int64 (full-range signed
      // xxhash64 keys straddling ±2^62 — the exact case this guard cites).
      // A plain `-` either wraps negative (non-ANSI: the wrapped span would
      // sail through the `> maxSpan` compare) or throws Spark's opaque
      // ARITHMETIC_OVERFLOW before the guard runs (ANSI, the session
      // default); try_subtract nulls on overflow under BOTH modes, so the
      // null/negative branches below always reach OUR loud message.
      val span = try_subtract(col(s"_mx_$c").cast("long"), col(s"_mn_$c").cast("long"))
      Seq(
        when(span.isNull && col(s"_mx_$c").isNotNull ||
            span < 0 || span > lit(maxSpan), raise_error(concat(
          lit(s"withZKey: column $c span "),
          coalesce(span.cast("string"), lit("(wrapped past int64)")),
          lit(s" exceeds $maxSpan at $bits bits — the bucket product would " +
            "overflow int64; use withRankZKey for wide-range keys"))))
          .otherwise(col(s"_mn_$c")).as(s"_mn_$c"),
        col(s"_mx_$c").as(s"_mx_$c"))
    }: _*)
    val joined = df.crossJoin(broadcast(stats))
    val bucketed = cols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(s"_zb_$c",
        equiWidthBucket(col(c), col(s"_mn_$c"), col(s"_mx_$c"), bits))
    }
    bucketed
      .withColumn("zkey", zValue(cols.map(c => col(s"_zb_$c")), bits))
      .drop(cols.flatMap(c => Seq(s"_mn_$c", s"_mx_$c")): _*)
  }

  /** Rank bucket of `x` against ascending `splits` (the 2^bits - 1
    * quantile cut points): bucket = how many splits x has passed — the
    * last index with `splits(i) <= x`, found by BINARY LIFTING over the
    * literal array (`bits` codegen'd compare/select rounds instead of a
    * linear `filter` scan: at bits = 10 that is 10 comparisons per row
    * per column, not 1023 — measured 4x off the ranked layout's write
    * cost). Duplicate splits (a single value carrying more than one
    * bucket's worth of mass — the Zipf hot key) merge naturally: no
    * bucket map can split one value; lifting lands on the LAST duplicate,
    * which equals the linear count (pinned in ClusteringSpec). A null x
    * buckets to null, matching [[equiWidthBucket]]'s null flow. */
  def rankBucket(x: Column, splits: Seq[Double]): Column = {
    val m = splits.length
    if (m == 0) return when(x.isNotNull, lit(0L))
    require(splits.zip(splits.tail).forall { case (a, b) => a <= b },
      "rankBucket needs ascending splits")
    val arr = typedlit(splits)
    val xd = x.cast("double")
    var levels = 0
    while ((1L << levels) <= m) levels += 1
    // the lifting runs as an `aggregate` FOLD over a literal step array
    // (2^(levels-1) .. 1), not as unrolled nested whens: unrolling embeds
    // the previous level's expression (and the full splits literal) in
    // every branch, an exponentially-sized tree that OOMs analysis at
    // bits = 10 — the fold's lambda is one fixed-size tree evaluated
    // `levels` times per row
    val steps = typedlit((0 until levels).map(lv => 1L << (levels - 1 - lv)))
    when(x.isNotNull,
      aggregate(steps, lit(0L), (acc, step) => {
        val cand = acc + step
        when(cand <= lit(m.toLong) &&
          xd >= element_at(arr, cand.cast("int")), cand).otherwise(acc)
      }))
  }

  /** Rank-bucketed z-key — the skew-robust production bucket map: per
    * column, fit `2^bits - 1` quantile cut points with the same sampled-
    * bounds discipline as `repartitionByRange` (one Greenwald-Khanna
    * sketch pass; `relativeError` trades fit cost for boundary
    * precision — measured on the 6.4M-row zorderskew probe: eps 0.001
    * writes at ~3.3x the equi-width cost and prunes a dense 2-D box to
    * 3/64 files, eps 0.002-0.005 halve the fit cost but smear the dense
    * region's boundaries enough to double the touched files; a layout
    * pass is write-once/read-many, so the default buys pruning), then
    * bucket each row by rank among the cut points and
    * interleave with [[zValue]] exactly as the equi-width path does.
    * Equal row mass per bucket means a Zipfian column still uses all
    * 2^bits cells of its dimension, so box-predicate pruning holds where
    * equi-width collapses. The fit is driver-bounded (cols x (2^bits - 1)
    * doubles ride into the projection as literals); the apply is a
    * narrow projection — zero joins, zero shuffles.
    *
    * Trade-off vs [[withZKey]], stated: quantile boundaries are sketch-
    * derived doubles, not engine-exact int64 arithmetic — use the
    * equi-width map when a cross-engine oracle must recompute the key
    * (q195), the rank map when the data is real (skewed). */
  def withRankZKey(df: DataFrame, cols: Seq[String], bits: Int,
                   relativeError: Double = 0.001): DataFrame = {
    require(cols.nonEmpty, "withRankZKey needs at least one column")
    // The rank path caps LOWER than equi-width's 20: each column embeds a
    // (2^bits - 1)-element double literal into the codegen'd fold (and an
    // approxQuantile fit of the same width) — at bits = 20 that is ~8 MB
    // of plan PER COLUMN. bits = 12 is 4095 splits, ample for file-level
    // pruning (files per dimension, not rows); equi-width keeps 20 because
    // its fit is one min/max row and its plan carries two scalars.
    require(bits >= 1 && bits <= 12,
      s"withRankZKey: bits must be in [1, 12] (2^bits - 1 splits embed in " +
        s"the plan as literals; got $bits — use withZKey for finer grids)")
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val splits = df.na.drop(cols)
      .stat.approxQuantile(cols.toArray, probs, relativeError)
    withRankZKeySplits(df, cols.zip(splits.map(_.toSeq)))
  }

  /** Rank-bucketed z-key from EXPLICIT per-column cut points — the same
    * apply-side projection as [[withRankZKey]] with the quantile fit
    * factored out. Two callers: a pre-fitted production layout pass
    * (fit once on a sample, apply to the full corpus), and the
    * cross-engine gate (exact percentile cuts both engines can state —
    * sketch-derived quantiles are approximate, explicit splits make the
    * bucket assignment engine-exact, q211). Splits must be ascending;
    * every column's count must be the same 2^bits - 1 so the interleave
    * width is uniform. */
  def withRankZKeySplits(df: DataFrame,
                         colSplits: Seq[(String, Seq[Double])]): DataFrame = {
    require(colSplits.nonEmpty, "withRankZKeySplits needs at least one column")
    val m = colSplits.head._2.length
    require(colSplits.forall(_._2.length == m),
      "withRankZKeySplits: all columns must carry the same split count " +
        s"(got ${colSplits.map(_._2.length).mkString(",")})")
    val bits = java.lang.Long.numberOfTrailingZeros((m + 1).toLong)
    require((1L << bits) == (m + 1).toLong && bits >= 1 && bits <= 12,
      s"withRankZKeySplits: split count must be 2^bits - 1 with bits in " +
        s"[1, 12], got $m")
    colSplits.foldLeft(df) { case (acc, (c, sp)) =>
        acc.withColumn(s"_zb_$c", rankBucket(col(c), sp))
      }
      .withColumn("zkey",
        zValue(colSplits.map { case (c, _) => col(s"_zb_$c") }, bits))
  }

  /** Rewrite `df` into `nFiles` parquet files clustered on the z-curve
    * over `cols`: range-partition by `zkey` (sampled bounds — even output
    * files under any key skew) and sort within each partition, so every
    * file's parquet column stats cover a tight rectangle in ALL `cols`.
    * Same rows and schema; like [[Compaction]], row order is a layout
    * property. The zkey itself is dropped on write — it is derivable
    * layout metadata, not data. `ranked` picks the bucket map: false =
    * engine-exact equi-width (uniform keys, oracle demos), true =
    * quantile rank buckets (skewed keys — the production default for
    * real distributions). */
  def zOrderWrite(df: DataFrame, cols: Seq[String], bits: Int,
                  outDir: String, nFiles: Int,
                  ranked: Boolean = false): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    (if (ranked) withRankZKey(df, cols, bits) else withZKey(df, cols, bits))
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop((cols.map(c => s"_zb_$c") :+ "zkey"): _*)
      .write.parquet(outDir)
  }

  /** Per-file [min, max] envelopes of `cols` for every parquet data file
    * under `dir` — the zone-map view a scan planner prunes with. One
    * scan, aggregated by `input_file_name`. */
  def fileEnvelopes(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileEnvelopes needs at least one column")
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))).head,
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))).tail: _*)
  }

  /** How many of `dir`'s files a conjunctive box predicate
    * `lo_j <= col_j <= hi_j` would touch, judged by the per-file
    * envelopes — the number a parquet reader cannot do better than and a
    * well-clustered layout drives toward `selectivity * files`. Driver
    * returns (touched, total). */
  def filesTouched(spark: SparkSession, dir: String,
                   box: Seq[(String, Long, Long)]): (Long, Long) = {
    require(box.nonEmpty, "filesTouched needs at least one (col, lo, hi)")
    val env = fileEnvelopes(spark, dir, box.map(_._1))
    val hit = box.map { case (c, lo, hi) =>
      col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)
    }.reduce(_ && _)
    val row = env.agg(
      sum(when(hit, 1L).otherwise(0L)).as("touched"),
      count(lit(1)).as("total")).head()
    (row.getLong(0), row.getLong(1))
  }
}

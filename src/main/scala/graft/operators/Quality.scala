package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Model-based quality scoring — the FineWeb-Edu / DCLM pipeline stage:
  * fit a lightweight classifier on a LABELED slice of the corpus, then
  * score and threshold every document with it. The heuristic filters
  * ([[TextAnalysis.gopherQualityFlags]], [[TextAnalysis.repetitionStats]],
  * [[TextAnalysis.charTrigramLogProb]]) provide the feature vector; this
  * operator learns how to WEIGH them instead of hard-coding the paper
  * thresholds (reference has no text pipeline at all — north-star stage,
  * SURVEY §2 extension family).
  *
  * The probe is ordinary least squares on 0/1 labels (a linear-probability
  * classifier) fit by the centered normal equations: one aggregate pass
  * computes the feature covariance matrix and feature-label covariances
  * (`covar_pop` — d(d+3)/2 scalars for d features), the d x d solve runs
  * on the driver. Closed-form, deterministic, and SQL-expressible — the
  * DuckDB oracle reproduces the same fit via Cramer's rule, so unlike
  * logistic regression (iterative, step-size-dependent) the whole
  * fit-then-score pipeline hash-matches across engines.
  *
  * Scale shape: the fit is ONE map-side-partial aggregate over the labeled
  * slice reducing to a single driver row of d(d+3)/2+d+1 doubles (labeled
  * slices are corpus-fractions, but even the full 100 TB corpus reduces to
  * that one row); scoring is a pure codegen'd projection (literal weights,
  * no broadcast, no shuffle). The feature ASSEMBLY is the only wide part:
  * two narrow id-keyed joins of zero-shuffle projections plus the char-LM's
  * explode+fit (the dominant arm — see [[TextAnalysis.charTrigramLogProb]]'s
  * own scale notes).
  */
object Quality {

  /** Per-document quality feature vector from the three oracled heuristic
    * families: `stop_frac` (Gopher stopword fraction), `dup_word_frac`
    * (repetition), `lm_logp` (char-trigram LM mean log-prob, `lmFloor` for
    * docs too short to emit a trigram). All three are 6-dp-rounded by
    * their source operators, so downstream fits see engine-reproducible
    * values. Output: (idCol, stop_frac, dup_word_frac, lm_logp).
    *
    * Scale shape: gopher and repetition are zero-shuffle projections of
    * the same scan; joining them costs two narrow (id, double) exchanges.
    * The char-LM arm carries the real cost (corpus explode + vocab-sized
    * fit) — this operator adds nothing wide of its own. */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String,
                      lmFloor: Double = -10.0): DataFrame = {
    val g = TextAnalysis.gopherQualityFlags(docs, idCol, textCol)
      .select(col(idCol),
        round(col("n_stopwords").cast("double") / col("n_words"), 6).as("stop_frac"))
    val r = TextAnalysis.repetitionStats(docs, idCol, textCol)
      .select(col(idCol), col("dup_word_frac"))
    val lm = TextAnalysis.charTrigramLogProb(docs, idCol, textCol)
      .select(col(idCol), col("avg_logp"))
    g.join(r, Seq(idCol))
      .join(lm, Seq(idCol), "left")
      .withColumn("lm_logp", coalesce(col("avg_logp"), lit(lmFloor)))
      .drop("avg_logp")
  }

  /** Fit OLS weights for `labelCol ~ featureCols` by the centered normal
    * equations: solve `S b = c` where `S[i][j] = covar_pop(f_i, f_j)` and
    * `c[i] = covar_pop(f_i, label)`, then `b0 = mean(label) - b . means`.
    * Returns `(b0, b1..bd)`.
    *
    * One EAGER aggregate job at call time (same driver-scalar contract as
    * [[TextAnalysis.contaminationHits]]'s bound probe — batch only): the
    * whole labeled slice reduces map-side to one row of d(d+3)/2 + d + 1
    * doubles; the d x d solve (Gaussian elimination, partial pivoting)
    * runs on the driver at d ~ a handful. Fails loudly on a singular
    * system (a constant feature or an exact linear dependence) instead of
    * returning NaN weights. */
  /** The fit's ONE aggregate as a frame — factored out so
    * PlanPosture can pin its shape (single exchange, map-side partials)
    * without re-deriving the agg list. */
  private[graft] def fitAggFrame(labeled: DataFrame, featureCols: Seq[String],
                                 labelCol: String): DataFrame = {
    val d = featureCols.length
    val aggs =
      featureCols.map(f => avg(col(f)).as(s"_m_$f")) ++
        Seq(avg(col(labelCol)).as("_m_y")) ++
        (for { i <- 0 until d; j <- i until d } yield
          covar_pop(col(featureCols(i)), col(featureCols(j))).as(s"_s_${i}_$j")) ++
        featureCols.indices.map(i =>
          covar_pop(col(featureCols(i)), col(labelCol)).as(s"_c_$i"))
    labeled.agg(aggs.head, aggs.tail: _*)
  }

  def fitLinearProbe(labeled: DataFrame, featureCols: Seq[String],
                     labelCol: String): Array[Double] = {
    require(featureCols.nonEmpty, "fitLinearProbe needs at least one feature")
    val d = featureCols.length
    val row = fitAggFrame(labeled, featureCols, labelCol).head()
    def get(n: String): Double = {
      val v = row.getAs[Any](n)
      require(v != null, s"fitLinearProbe: aggregate $n is null (empty labeled slice?)")
      v.asInstanceOf[Double]
    }
    val means = featureCols.map(f => get(s"_m_$f")).toArray
    val meanY = get("_m_y")
    val s = Array.tabulate(d, d)((i, j) =>
      if (i <= j) get(s"_s_${i}_$j") else get(s"_s_${j}_$i"))
    val c = Array.tabulate(d)(i => get(s"_c_$i"))
    val b = solve(s.map(_.clone()), c.clone(), featureCols)
    val b0 = meanY - b.indices.map(i => b(i) * means(i)).sum
    b0 +: b
  }

  /** In-place Gaussian elimination with partial pivoting; d is tiny. */
  private def solve(a: Array[Array[Double]], y: Array[Double],
                    names: Seq[String]): Array[Double] = {
    val d = y.length
    for (k <- 0 until d) {
      val p = (k until d).maxBy(i => math.abs(a(i)(k)))
      require(math.abs(a(p)(k)) > 1e-12,
        s"fitLinearProbe: singular normal equations at pivot $k — feature " +
          s"'${names(k)}' is constant or linearly dependent on the others")
      if (p != k) { val t = a(p); a(p) = a(k); a(k) = t
        val ty = y(p); y(p) = y(k); y(k) = ty }
      for (i <- k + 1 until d) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until d) a(i)(j) -= f * a(k)(j)
        y(i) -= f * y(k)
      }
    }
    val b = new Array[Double](d)
    for (k <- d - 1 to 0 by -1) {
      var acc = y(k)
      for (j <- k + 1 until d) acc -= a(k)(j) * b(j)
      b(k) = acc / a(k)(k)
    }
    b
  }

  /** Round fitted weights to `dp` decimals. Cross-engine parity hinges on
    * this: the Spark fit (Gaussian elimination) and an oracle's closed-form
    * solve differ at ~1e-12 from float arithmetic order; snapping both to
    * the same 1e-6 grid BEFORE scoring makes the weight literals — and
    * therefore every downstream IEEE score computed in the same expression
    * order — bit-identical across engines. */
  def roundWeights(w: Array[Double], dp: Int = 6): Array[Double] =
    w.map(x => BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Codegen'd linear score `w0 + w1*f1 + ... + wd*fd` (left-to-right —
    * the same association an SQL `+` chain has, for bit parity). */
  def linearScore(weights: Array[Double], featureCols: Seq[String]): Column = {
    require(weights.length == featureCols.length + 1,
      s"need ${featureCols.length + 1} weights (b0 + one per feature), got ${weights.length}")
    featureCols.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (f, i)) => acc + lit(weights(i + 1)) * col(f)
    }
  }

  /** Score a feature frame with fitted weights and threshold the
    * 6-dp-rounded score: adds `score` and `keep` (`score >= threshold`).
    * The threshold compares the ROUNDED score so the keep boundary is
    * engine-reproducible. Pure projection — zero shuffles. */
  def scoreQuality(feats: DataFrame, weights: Array[Double],
                   featureCols: Seq[String], threshold: Double): DataFrame =
    feats
      .withColumn("score", round(linearScore(weights, featureCols), 6))
      .withColumn("keep", col("score") >= threshold)

  /** Classifier evaluation on a labeled HELD-OUT slice — the stage that
    * decides whether a fitted quality probe is trustworthy enough to gate
    * a corpus: threshold-free ranking power (ROC-AUC) plus the confusion
    * matrix and derived rates at the operating threshold. One row out:
    * `(n_pos, n_neg, auc, tp, fp, fn, tn, prec, rec, f1, acc)`.
    *
    * AUC uses the rank formula with tie-aware AVERAGE ranks:
    * `AUC = (Σ rank(pos) − P(P+1)/2) / (P·N)` — the exact probability a
    * random positive outranks a random negative, identical to trapezoidal
    * ROC integration. Every intermediate is an exact binary fraction
    * (counts and half-integer ranks far below 2^52), so sums are
    * order-independent IEEE-exact and the result hash-matches any engine
    * with no float-boundary risk; only the final ratios are 6-dp-rounded.
    *
    * Scale shape: one map-side-partial aggregate collapses the corpus to
    * per-distinct-SCORE counts (scores are 6-dp-rounded upstream, so this
    * frame is score-vocabulary-sized, not corpus-sized — q129's
    * rank-over-distinct-tokens precedent); the cumulative-rank window over
    * that frame and the final global fold are both bounded by distinct
    * score count. Nothing corpus-sized crosses a single partition. */
  def evalBinaryClassifier(scored: DataFrame, scoreCol: String, labelCol: String,
                           threshold: Double): DataFrame = {
    val per = scored.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col(labelCol).cast("double")).as("np"))
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    val rk = per.withColumn("below", coalesce(sum(col("n")).over(w), lit(0.0)))
    rk.agg(
        sum(col("np")).as("p"),
        sum(col("n") - col("np")).as("nn"),
        sum(col("np") * (col("below") + (col("n") + 1) / 2)).as("sr"),
        sum(when(col("s") >= threshold, col("np")).otherwise(0.0)).as("tpd"),
        sum(when(col("s") >= threshold, col("n") - col("np")).otherwise(0.0)).as("fpd"))
      .select(
        col("p").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        round((col("sr") - col("p") * (col("p") + 1) / 2) / (col("p") * col("nn")), 6).as("auc"),
        col("tpd").cast("long").as("tp"),
        col("fpd").cast("long").as("fp"),
        (col("p") - col("tpd")).cast("long").as("fn"),
        (col("nn") - col("fpd")).cast("long").as("tn"),
        round(col("tpd") / (col("tpd") + col("fpd")), 6).as("prec"),
        round(col("tpd") / col("p"), 6).as("rec"),
        // F1 = 2TP / (2TP + FP + FN) = 2TP / (P + TP + FP): the exact
        // closed form, not a ratio of already-rounded prec/rec
        round(lit(2) * col("tpd") / (col("p") + col("tpd") + col("fpd")), 6).as("f1"),
        round((col("tpd") + col("nn") - col("fpd")) / (col("p") + col("nn")), 6).as("acc"))
  }

  /** Per-group ADAPTIVE quantile gate (CCNet's per-language perplexity
    * terciles, Dolma's per-language thresholds): keep rows whose score
    * clears their OWN group's `p`-quantile instead of one global
    * constant. A global threshold tuned on the dominant language silently
    * guts low-resource slices whose score distribution sits elsewhere —
    * the per-group fit makes the keep RATE (not the keep VALUE) uniform
    * across groups.
    *
    * Same fit-then-broadcast-apply shape as the scalers: ONE group-keyed
    * percentile aggregate (exact `percentile` — DuckDB `quantile_cont`
    * parity — or the Greenwald-Khanna `percentile_approx` sketch via
    * `exact = false`, the 100-TB path; see [[Encode.percentileFit]]),
    * broadcast-joined back; zero fact-side shuffle, no window. Adds
    * `threshold` (6 dp) and `keep` (`score >= threshold`, compared on the
    * ROUNDED threshold so the boundary is engine-reproducible). */
  def perGroupQuantileFilter(df: DataFrame, scoreCol: String,
                             groupCols: Seq[String], p: Double,
                             exact: Boolean = true,
                             accuracy: Int = 10000): DataFrame = {
    require(p >= 0 && p <= 1, s"perGroupQuantileFilter needs p in [0, 1], got $p")
    require(!df.columns.contains("threshold") && !df.columns.contains("keep"),
      "perGroupQuantileFilter emits 'threshold' and 'keep' columns")
    val fit = Encode.percentileFit(scoreCol, Seq(p), exact, accuracy).as("_q")
    val thresholds =
      if (groupCols.isEmpty) df.agg(fit)
      else df.groupBy(groupCols.map(col): _*).agg(fit)
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(thresholds))
      else df.join(broadcast(thresholds), groupCols)
    joined
      .withColumn("threshold", round(element_at(col("_q"), 1), 6))
      .withColumn("keep", col(scoreCol) >= col("threshold"))
      .drop("_q")
  }
}

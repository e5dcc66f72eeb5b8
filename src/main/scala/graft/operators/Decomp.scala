package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral decomposition operators over embedding columns — PCA,
  * whitening, and Mahalanobis outlier scoring: the dimensionality-
  * reduction / distribution-shape tier of the curation ladder that the
  * ANN ([[Similarity]]) and semantic-dedup (q94) families sit on top of.
  * A training-data pipeline uses these to (a) audit how much of an
  * embedding space is actually used (spectrum / effective rank — a
  * collapsed encoder shows up as 2-3 dominant eigenvalues), (b) whiten
  * before cosine ANN so one loud direction doesn't dominate every score,
  * and (c) rank distributional outliers for curation triage.
  *
  * Scale shape (the fit-is-broadcast-sized discipline): the ONLY pass
  * over the corpus is the [[graft.functions.MatrixGram]] aggregate —
  * one d(d+3)/2-double buffer per task, merged map-side, a single
  * O(d²)-byte row to the driver. The eigendecomposition is driver-side
  * cyclic Jacobi on the d×d covariance (d ≤ [[MaxDims]], microseconds at
  * embedding widths), and the apply pass is a codegen'd projection —
  * centered dot products against literal component arrays — with no
  * shuffle and no UDF. The same split as every fit-then-transform
  * operator here ([[Encode.standardScale]], [[Similarity]]'s Lloyd
  * fits): corpus passes are linear and shuffle-free; only
  * vocabulary/dimension-sized state crosses stages.
  *
  * Reference anchor: the reference's MinMax/Standard scalers
  * (read_csv_s3_train.py:106-109) are the diagonal special case of this
  * family — per-dimension affine normalization; PCA/whitening is the
  * full-covariance generalization an embedding column needs.
  */
object Decomp {

  /** Covariance fits above this dimension refuse loudly: the Gram buffer
    * is d(d+1)/2 doubles per task and Jacobi is O(d³) per sweep —
    * comfortable at embedding widths (512 ⇒ ~1 MB, sub-second), absurd
    * at a million (a caller pointing this at a sparse one-hot column
    * should hear that, not OOM). */
  val MaxDims = 1024

  /** Population mean vector and covariance matrix of `vecCol`, via one
    * [[graft.functions.MatrixGram]] pass. Returns (n, mean[d],
    * cov[d][d]) — covariance is ddof=0 (population; matches DuckDB
    * `covar_pop` and sklearn scalers' convention used across this
    * engine). Null vectors are skipped by the aggregate. */
  def fitMeanCov(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val row = df.agg(graft.functions.GraftFunctions.matrix_gram(col(vecCol)).as("g"))
      .selectExpr("g.n", "g.sum", "g.prod").head()
    require(!row.isNullAt(0), s"fitMeanCov: no non-null vectors in $vecCol")
    val n = row.getLong(0)
    val sums = row.getSeq[Double](1).toArray
    val prods = row.getSeq[Double](2).toArray
    require(sums.length <= MaxDims,
      s"fitMeanCov: $vecCol has ${sums.length} dims; the covariance path is " +
        s"built for embedding widths (<= $MaxDims) — reduce dimensionality first")
    val (mean, cov) = momentsToMeanCov(n, sums, prods)
    (n, mean, cov)
  }

  /** Raw Gram moments → (mean, population covariance). Shared by
    * [[fitMeanCov]] and the fold-additive paths: moments are ADDITIVE,
    * so leave-fold-out statistics never need a second corpus pass. */
  private def momentsToMeanCov(n: Long, sums: Array[Double],
                               prods: Array[Double]): (Array[Double], Array[Array[Double]]) = {
    val d = sums.length
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      val base = i * d - i * (i - 1) / 2 - i
      var j = i
      while (j < d) {
        val c = prods(base + j) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    (mean, cov)
  }

  /** Deterministic symmetric eigendecomposition by cyclic Jacobi
    * rotations (Golub & Van Loan §8.5): sweeps the strict upper triangle
    * in a FIXED row-major order until off-diagonal mass is dead (or 64
    * sweeps — cubic convergence reaches machine precision in ~8 for any
    * well-scaled covariance). Returns eigenvalues DESCENDING with their
    * eigenvectors as rows, each vector sign-normalized so its
    * largest-|coordinate| entry is positive — a total, engine-free
    * determinism convention (replay-identical across runs/JVMs, the
    * property every fit in this engine guarantees). */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val eps = 1e-14 * math.max(1.0, a.map(r => r.map(math.abs).max).max)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > eps) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > eps) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // (eigenvalue desc, then first-index asc on exact ties) + sign fix
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val pivot = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(pivot) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** The fitted transform: mean, eigenvalues (desc), components (rows,
    * orthonormal), and the fit size. */
  final case class PcaModel(n: Long, mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]]) {
    def d: Int = mean.length
    /** Fraction of total variance carried by each component. */
    def varianceRatio: Array[Double] = {
      val tot = eigenvalues.sum
      if (tot <= 0) eigenvalues.map(_ => 0.0) else eigenvalues.map(_ / tot)
    }
  }

  /** Fit PCA on `vecCol`: one corpus pass ([[fitMeanCov]]) + driver
    * Jacobi. Deterministic (fixed sweep order, sign-normalized
    * components). */
  def fitPca(df: DataFrame, vecCol: String): PcaModel = {
    val (n, mean, cov) = fitMeanCov(df, vecCol)
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(n, mean, vals, vecs)
  }

  /** Centered dot product of `vecCol` against one literal direction —
    * pure higher-order-function arithmetic (zip_with + aggregate), fully
    * codegen'd, no UDF, no shuffle. */
  private def projectOne(vecCol: String, mean: Array[Double],
                         comp: Array[Double]): Column = {
    val meanLit = array(mean.map(lit): _*)
    val compLit = array(comp.map(lit): _*)
    aggregate(
      zip_with(zip_with(col(vecCol), meanLit, (x, mu) => x - mu),
        compLit, (c, w) => c * w),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Project onto the top-`k` principal components: adds `pc1..pck`
    * columns. The apply half of [[fitPca]] — a narrow codegen'd
    * projection, the J3 broadcast-stats-to-rows shape with the stats
    * baked in as literals. */
  def pcaProject(df: DataFrame, vecCol: String, model: PcaModel, k: Int): DataFrame = {
    require(k >= 1 && k <= model.d, s"pcaProject needs 1 <= k <= ${model.d}, got $k")
    (1 to k).foldLeft(df) { (acc, i) =>
      acc.withColumn(s"pc$i",
        projectOne(vecCol, model.mean, model.components(i - 1)))
    }
  }

  /** PCA-whitened vectors: `W_k = (v−μ)·e_k / √λ_k` over the top-`k`
    * components (λ ridge-floored like [[mahalanobis]]) — output
    * covariance is the k×k identity by construction, which is the
    * preconditioner for cosine ANN / SemDeDup when a few loud directions
    * would otherwise dominate every similarity. Adds `<vecCol>_w`
    * (array<double>[k]); a fused zero-shuffle kernel
    * ([[graft.functions.EigenProject]]). `‖whiten(v)‖²` at k = d equals
    * [[mahalanobis]]'s `maha2` — pinned in DecompSpec. */
  def whiten(df: DataFrame, vecCol: String, model: PcaModel, k: Int,
             relEps: Double = 1e-9): DataFrame = {
    require(k >= 1 && k <= model.d, s"whiten needs 1 <= k <= ${model.d}, got $k")
    require(relEps > 0, s"whiten needs relEps > 0, got $relEps")
    val lmax = model.eigenvalues.headOption.getOrElse(0.0)
    require(lmax > 0, "whiten needs a non-degenerate fit (all-constant vectors?)")
    val floor = relEps * lmax
    df.withColumn(s"${vecCol}_w",
      graft.functions.GraftFunctions.eigen_project(col(vecCol), model.mean,
        model.components.take(k).map(_.toSeq).toSeq,
        model.eigenvalues.take(k).map(l => 1.0 / math.sqrt(math.max(l, floor)))))
  }

  /** A fitted multi-target ridge probe: `k` linear models over the same
    * `d`-dim input, solved jointly from one Gram pass. `weights(c)` is
    * the d-vector for target `c`; `r2(c)` is its in-sample coefficient
    * of determination (0 when the target is constant). */
  final case class RidgeProbeModel(n: Long, lambda: Double,
                                   muX: Array[Double], muY: Array[Double],
                                   weights: Array[Array[Double]],
                                   r2: Array[Double]) {
    def d: Int = muX.length
    def k: Int = muY.length
    /** `intercept_c = μy_c − β_c·μx` — scores are exact on the mean. */
    def intercepts: Array[Double] = Array.tabulate(k) { c =>
      var s = muY(c); var j = 0
      while (j < d) { s -= weights(c)(j) * muX(j); j += 1 }
      s
    }
  }

  /** Fit `k` ridge-regression probes `y_c ≈ β_c·x + b_c` over `vecCol`
    * in ONE corpus pass: the joint Gram of `[x ; y_1..y_k]` (the same
    * [[graft.functions.MatrixGram]] kernel, `(d+k)(d+k+3)/2` doubles per
    * task) yields `Cov(X,X)`, `Cov(X,y_c)` and `Var(y_c)` together; the
    * solve is driver-side spectral ridge through [[jacobiEigen]]:
    * `β_c = Σ_j e_j (e_j·b_c)/(λ_j + λ)`. With `lambda = 0` the
    * rank-deficient directions are dropped (pseudo-inverse), never
    * inverted. This is the linear-probe / quality-classifier fit of an
    * LLM curation pipeline (one-vs-rest over class indicators = LDA-style
    * multiclass probe) and the distributed analogue of the reference's
    * (lat, lon) regression head (model_architecture.py:92-111) — the
    * data-side fit is exact and single-pass where the reference iterates.
    * Certifiable by construction: the residual normal equations give
    * `Cov(x, y_c − ŷ_c) = λ β_c` exactly (pinned in DecompSpec and
    * self-certified at scale by q187). */
  def fitRidgeProbes(df: DataFrame, vecCol: String, targets: Seq[Column],
                     lambda: Double, relEps: Double = 1e-9): RidgeProbeModel = {
    val k = targets.size
    require(k >= 1, "fitRidgeProbes needs at least one target")
    require(lambda >= 0, s"fitRidgeProbes needs lambda >= 0, got $lambda")
    val joint = df.select(concat(col(vecCol).cast("array<double>"),
      array(targets.map(_.cast("double")): _*)).as("_xy"))
    val (n, mean, cov) = fitMeanCov(joint, "_xy")
    solveRidge(n, mean, cov, k, lambda, relEps)
  }

  /** The driver-side half of [[fitRidgeProbes]]: spectral ridge solve
    * from joint moments over `[x ; y_1..y_k]`. Shared with
    * [[fitRidgeProbesPerFold]], whose leave-fold-out moments come from
    * Gram ADDITIVITY rather than extra corpus passes. */
  private def solveRidge(n: Long, mean: Array[Double], cov: Array[Array[Double]],
                         k: Int, lambda: Double, relEps: Double): RidgeProbeModel = {
    val d = mean.length - k
    require(d >= 1, s"solveRidge: vector is empty after removing $k targets")
    val muX = mean.take(d)
    val muY = mean.drop(d)
    val cxx = Array.tabulate(d, d)((i, j) => cov(i)(j))
    val (evals, evecs) = jacobiEigen(cxx)
    val floor = relEps * math.max(evals.headOption.getOrElse(0.0), 0.0)
    val weights = Array.tabulate(k) { c =>
      val b = Array.tabulate(d)(j => cov(j)(d + c))
      val beta = new Array[Double](d)
      var j = 0
      while (j < d) {
        val lam = evals(j)
        // include a direction only when its regularized denominator
        // clears the spectral floor: `lambda > 0` alone would admit a
        // numerically-NEGATIVE zero eigenvalue (Jacobi rounding on a
        // rank-deficient Cxx gives lam ~ -1e-16) with a tiny lambda and
        // divide by ~0 along the null direction. Denominator clamps lam
        // at 0 so ridge regularization is exactly max(lam, 0) + lambda.
        if (lam > floor || lambda + math.max(lam, 0.0) > floor) {
          val e = evecs(j)
          var eb = 0.0
          var t = 0
          while (t < d) { eb += e(t) * b(t); t += 1 }
          val coef = eb / (math.max(lam, 0.0) + lambda)
          t = 0
          while (t < d) { beta(t) += coef * e(t); t += 1 }
        }
        j += 1
      }
      beta
    }
    val r2 = Array.tabulate(k) { c =>
      val varY = cov(d + c)(d + c)
      if (varY <= 0) 0.0
      else {
        val beta = weights(c)
        var btb = 0.0 // βᵀ Cxx β
        var bb = 0.0 // βᵀ b
        var i = 0
        while (i < d) {
          bb += beta(i) * cov(i)(d + c)
          var j = 0
          var row = 0.0
          while (j < d) { row += cxx(i)(j) * beta(j); j += 1 }
          btb += beta(i) * row
          i += 1
        }
        1.0 - (varY - 2.0 * bb + btb) / varY
      }
    }
    RidgeProbeModel(n, lambda, muX, muY, weights, r2)
  }

  /** The apply half of [[fitRidgeProbes]]: adds `outCol` =
    * `array<double>[k]` of probe scores `β_c·(v−μx) + μy_c`
    * (≡ `β_c·v + intercept_c`) — one fused
    * [[graft.functions.EigenProject]] pass (weights as the basis, unit
    * scales; the projection is already centered, so the add-back is
    * `μy`, not the raw intercept) plus a k-wide offset add. Zero
    * shuffle; model rides as literals. */
  def probeScores(df: DataFrame, vecCol: String, model: RidgeProbeModel,
                  outCol: String = "probe_scores"): DataFrame = {
    val proj = graft.functions.GraftFunctions.eigen_project(col(vecCol),
      model.muX, model.weights.map(_.toSeq).toSeq,
      Seq.fill(model.k)(1.0))
    df.withColumn(outCol,
      zip_with(proj, array(model.muY.map(lit).toIndexedSeq: _*), (s, b) => s + b))
  }

  /** Leave-one-fold-out ridge probes for ALL `nFolds` folds from ONE
    * corpus pass: the joint Gram of `[x ; y_1..y_k]` is aggregated PER
    * FOLD (`groupBy(fold).agg(matrix_gram)` — the buffer is nFolds ×
    * O((d+k)²) doubles, still broadcast-sized), and because Gram moments
    * are additive, fold `f`'s held-out moments are simply
    * `total − fold_f` — no re-scan per fold. This is k-fold
    * cross-validation of the quality-classifier probe at corpus scale:
    * full CV costs ONE fit pass + ONE scoring pass, where the naive
    * protocol pays `nFolds` fit passes. Out-of-fold accuracy vs train
    * accuracy is the standard probe-overfitting audit (a probe that
    * only separates classes in-fold is memorizing, not measuring).
    * Returns fold-indexed models (`models(f)` is fit on everything
    * EXCEPT fold f). `foldCol` must evaluate to ints in [0, nFolds). */
  def fitRidgeProbesPerFold(df: DataFrame, vecCol: String, targets: Seq[Column],
                            foldCol: Column, nFolds: Int, lambda: Double,
                            relEps: Double = 1e-9): Array[RidgeProbeModel] = {
    val k = targets.size
    require(k >= 1, "fitRidgeProbesPerFold needs at least one target")
    require(nFolds >= 2, s"fitRidgeProbesPerFold needs nFolds >= 2, got $nFolds")
    require(lambda >= 0, s"fitRidgeProbesPerFold needs lambda >= 0, got $lambda")
    val joint = df.select(foldCol.cast("int").as("_fold"),
      concat(col(vecCol).cast("array<double>"),
        array(targets.map(_.cast("double")): _*)).as("_xy"))
    val rows = joint.groupBy("_fold")
      .agg(graft.functions.GraftFunctions.matrix_gram(col("_xy")).as("g"))
      .where(col("g").isNotNull) // a fold of only-null vectors has no moments
      .selectExpr("_fold", "g.n", "g.sum", "g.prod").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Double](2).toArray, r.getSeq[Double](3).toArray))
    require(rows.nonEmpty, "fitRidgeProbesPerFold: no non-null vectors")
    rows.foreach { case (f, _, s, _) =>
      require(f >= 0 && f < nFolds,
        s"foldCol produced $f outside [0, $nFolds)")
      require(s.length <= MaxDims + k, s"vector too wide (${s.length - k} dims)")
    }
    val width = rows.head._3.length
    val nTot = rows.map(_._2).sum
    val sumTot = new Array[Double](width)
    val prodTot = new Array[Double](rows.head._4.length)
    rows.foreach { case (_, _, s, p) =>
      var i = 0
      while (i < width) { sumTot(i) += s(i); i += 1 }
      i = 0
      while (i < p.length) { prodTot(i) += p(i); i += 1 }
    }
    val byFold = rows.map(r => r._1 -> r).toMap
    Array.tabulate(nFolds) { f =>
      val (nf, sf, pf) = byFold.get(f)
        .map(r => (r._2, r._3, r._4))
        .getOrElse((0L, new Array[Double](width), new Array[Double](prodTot.length)))
      val nHeld = nTot - nf
      require(nHeld > 0, s"fold $f holds the entire corpus; cannot fit its model")
      val sums = Array.tabulate(width)(i => sumTot(i) - sf(i))
      val prods = Array.tabulate(prodTot.length)(i => prodTot(i) - pf(i))
      val (mean, cov) = momentsToMeanCov(nHeld, sums, prods)
      solveRidge(nHeld, mean, cov, k, lambda, relEps)
    }
  }

  /** The apply half of [[fitRidgeProbesPerFold]]: scores each row with
    * ITS OWN fold's held-out model — out-of-fold scores, the honest
    * generalization estimate. One lazily-branched CASE over per-fold
    * [[probeScores]] columns: CaseWhen evaluates only the matched
    * branch, so each row pays exactly its fold's k·d products (an
    * all-folds fused projection would compute nFolds× that and slice).
    * Zero shuffle; a fold value outside [0, nFolds) scores null —
    * `foldCol` must be the same expression the fit partitioned on. */
  def probeScoresByFold(df: DataFrame, vecCol: String, foldCol: Column,
                        models: Array[RidgeProbeModel],
                        outCol: String = "probe_scores"): DataFrame = {
    require(models.nonEmpty, "probeScoresByFold needs at least one model")
    val d = models.head.d
    val k = models.head.k
    require(models.forall(m => m.d == d && m.k == k),
      "probeScoresByFold: models disagree on dimensions")
    val fold = foldCol.cast("int")
    val perFold = models.map { m =>
      zip_with(
        graft.functions.GraftFunctions.eigen_project(col(vecCol), m.muX,
          m.weights.map(_.toSeq).toSeq, Seq.fill(m.k)(1.0)),
        array(m.muY.map(lit).toIndexedSeq: _*), (s, b) => s + b)
    }
    val sel = models.indices.tail.foldLeft(when(fold === 0, perFold(0))) {
      (acc, f) => acc.when(fold === f, perFold(f))
    }
    df.withColumn(outCol, sel)
  }

  /** Squared Mahalanobis distance of each vector from the fitted mean,
    * through the eigenbasis: `Σ_j (v·e_j)² / max(λ_j, floor)` with
    * `floor = relEps × λ_max` — the rank-deficient directions are
    * floored, not inverted, so near-null eigenvalues cannot explode the
    * score (the standard ridge regularization). Adds `maha2`.
    *
    * This is the distribution-aware outlier score: unlike the L2-norm
    * audit (q165), a point far along a HIGH-variance direction scores
    * low while the same distance along a tight direction scores high —
    * exactly the "weird for this corpus" ranking curation wants. */
  def mahalanobis(df: DataFrame, vecCol: String, model: PcaModel,
                  relEps: Double = 1e-9): DataFrame = {
    require(relEps > 0, s"mahalanobis needs relEps > 0, got $relEps")
    val lmax = model.eigenvalues.headOption.getOrElse(0.0)
    require(lmax > 0, "mahalanobis needs a non-degenerate fit (all-constant vectors?)")
    val floor = relEps * lmax
    // Native fused kernel, not a nested higher-order-function tree: HOF
    // lambdas evaluate interpreted even inside WholeStageCodegen, and the
    // score is d² lambda calls per row that way (measured 2.47 s vs
    // ~0.4 s at 64-dim × sf0.1 — MahalanobisScore scaladoc).
    df.withColumn("maha2",
      graft.functions.GraftFunctions.mahalanobis_score(col(vecCol),
        model.mean, model.components.map(_.toSeq).toSeq,
        model.eigenvalues.map(l => 1.0 / math.max(l, floor))))
  }
}

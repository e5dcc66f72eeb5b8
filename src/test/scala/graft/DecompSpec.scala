package graft

import graft.operators.Decomp
import org.apache.spark.sql.functions._

class DecompSpec extends SparkSuite {
  import spark.implicits._

  private def vecsDf(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

  test("matrix_gram moments match brute force exactly on literal vectors") {
    val rows = Seq(
      Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f),
      Array(-1.0f, 0.5f, 2.0f), Array(0.0f, 0.0f, 0.0f))
    val (n, mean, cov) = Decomp.fitMeanCov(vecsDf(rows), "v")
    assert(n === 4)
    val d = 3
    val exp = Array.tabulate(d)(i => rows.map(_(i).toDouble).sum / 4)
    assert(mean === exp)
    for (i <- 0 until d; j <- 0 until d) {
      val cij = rows.map(r => r(i).toDouble * r(j)).sum / 4 - exp(i) * exp(j)
      assert(math.abs(cov(i)(j) - cij) < 1e-12, s"cov($i,$j)")
      assert(cov(i)(j) === cov(j)(i))
    }
  }

  test("matrix_gram skips null vectors and survives partition merges") {
    val df = spark.range(0, 1000, 1, 7) // 7 partitions force real merges
      .select(col("id"),
        when(col("id") % 10 === 0, lit(null))
          .otherwise(array((col("id") % 13).cast("double"),
            (col("id") % 7).cast("double"))).as("v"))
    val (n, mean, _) = Decomp.fitMeanCov(df, "v")
    assert(n === 900)
    val exp = df.where(col("v").isNotNull)
      .select(avg(element_at(col("v"), 1))).head().getDouble(0)
    assert(math.abs(mean(0) - exp) < 1e-9)
  }

  test("jacobiEigen: analytic 2x2, orthonormality, reconstruction, determinism") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1
    val (vals, vecs) = Decomp.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s = math.sqrt(0.5)
    assert(math.abs(vecs(0)(0) - s) < 1e-12 && math.abs(vecs(0)(1) - s) < 1e-12)
    // a less trivial symmetric 4x4: check V orthonormal and A = VT diag V
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0), Array(1.0, 3.0, 0.2, 0.1),
      Array(0.5, 0.2, 2.0, 0.3), Array(0.0, 0.1, 0.3, 1.0))
    val (l, v) = Decomp.jacobiEigen(a)
    assert(l.sliding(2).forall(p => p(0) >= p(1)), "eigenvalues descending")
    assert(math.abs(l.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-10, "trace preserved")
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => v(i)(k) * v(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10, s"VVt($i,$j)")
      val rec = (0 until 4).map(k => v(k)(i) * l(k) * v(k)(j)).sum
      assert(math.abs(rec - a(i)(j)) < 1e-10, s"reconstruct($i,$j)")
    }
    // Av = lambda v for the top pair
    for (i <- 0 until 4) {
      val av = (0 until 4).map(j => a(i)(j) * v(0)(j)).sum
      assert(math.abs(av - l(0) * v(0)(i)) < 1e-10, s"Av=lv at $i")
    }
    // deterministic: bit-identical on re-run
    val (l2, v2) = Decomp.jacobiEigen(a)
    assert(l === l2)
    assert(v.flatten === v2.flatten)
  }

  test("fitPca recovers an axis-aligned anisotropic cloud's directions") {
    // x-variance 25, y-variance 1, zero mean: PC1 = +x with lambda ~25
    val pts = for (i <- 0 until 200) yield {
      val t = (i - 99.5) / 57.734 // ~uniform[-sqrt(3), sqrt(3)]: var 1
      Array((5.0 * t).toFloat, ((if (i % 2 == 0) t else -t) * 1.0).toFloat)
    }
    val model = Decomp.fitPca(vecsDf(pts), "v")
    assert(model.n === 200)
    assert(model.eigenvalues(0) > 20 && model.eigenvalues(0) < 30)
    assert(math.abs(math.abs(model.components(0)(0)) - 1.0) < 1e-6, "PC1 = x axis")
    assert(math.abs(model.components(0)(1)) < 1e-6)
    assert(model.components(0)(0) > 0, "sign-normalized positive")
    val vr = model.varianceRatio
    assert(math.abs(vr.sum - 1.0) < 1e-12)
    assert(vr(0) > 0.9)
  }

  test("pcaProject adds centered projections; mahalanobis ranks the planted outlier first") {
    // tight cloud along x (var 25) with y noise (var ~0.01), one point at
    // (0, 3): small L2 norm but far along the TIGHT direction
    val base = for (i <- 0 until 99) yield
      Array((5.0 * (i - 49) / 28.6).toFloat, (0.1 * ((i % 3) - 1)).toFloat)
    val pts = base :+ Array(0.0f, 3.0f)
    val df = vecsDf(pts)
    val model = Decomp.fitPca(df, "v")
    val proj = Decomp.pcaProject(df, "v", model, 2)
    assert(proj.columns.contains("pc1") && proj.columns.contains("pc2"))
    // projections are centered: mean(pc1) ~ 0
    val m1 = proj.agg(avg("pc1")).head().getDouble(0)
    assert(math.abs(m1) < 1e-6)
    val top = Decomp.mahalanobis(df, "v", model)
      .orderBy(desc("maha2")).select("id").head().getLong(0)
    assert(top === 99L, "planted tight-direction outlier wins")
    // ...even though its L2 norm is far from the largest
    val topByNorm = df.select(col("id"),
      aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x).as("n2"))
      .orderBy(desc("n2")).select("id").head().getLong(0)
    assert(topByNorm !== 99L, "norm audit alone would miss it")
  }

  test("whiten: identity covariance, zero mean, and ||w||^2 == maha2 at full rank") {
    // three genuinely independent directions (a linearly dependent column
    // would be rank-deficient: its eigenvalue hits the ridge floor and
    // whitening correctly does NOT stretch it to variance 1)
    val pts = for (i <- 0 until 120) yield {
      val t = (i - 59.5) / 34.64
      Array((3.0 * t).toFloat, (t * t - 1.0).toFloat,
        (((i * 37) % 7 - 3) * 0.2 + 0.1 * t).toFloat)
    }
    val df = vecsDf(pts)
    val model = Decomp.fitPca(df, "v")
    val w = Decomp.whiten(df, "v", model, 3)
    val (_, wMean, wCov) = Decomp.fitMeanCov(w, "v_w")
    for (i <- 0 until 3) {
      assert(math.abs(wMean(i)) < 1e-9, s"whitened mean($i)")
      for (j <- 0 until 3)
        assert(math.abs(wCov(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-6,
          s"whitened cov($i,$j) = ${wCov(i)(j)}")
    }
    // full-rank whitened norm IS the Mahalanobis distance
    val both = Decomp.mahalanobis(w, "v", model)
      .select(col("id"), col("maha2"),
        aggregate(transform(col("v_w"), x => x * x), lit(0.0), (a, x) => a + x).as("wn2"))
      .collect()
    both.foreach(r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-8, s"row ${r.getLong(0)}"))
  }

  test("fitRidgeProbes recovers an exact linear law (OLS, closed form)") {
    // y = 3x1 - 2x2 + 5, x1/x2 genuinely independent
    val pts = for (i <- 0 until 60) yield
      Array((i % 8).toFloat, ((i * 5) % 7).toFloat)
    val df = vecsDf(pts).withColumn("y",
      lit(3.0) * element_at(col("v"), 1) - lit(2.0) * element_at(col("v"), 2) + 5.0)
    val m = Decomp.fitRidgeProbes(df, "v", Seq(col("y")), lambda = 0.0)
    assert(math.abs(m.weights(0)(0) - 3.0) < 1e-9)
    assert(math.abs(m.weights(0)(1) + 2.0) < 1e-9)
    assert(math.abs(m.intercepts(0) - 5.0) < 1e-9)
    assert(math.abs(m.r2(0) - 1.0) < 1e-12)
    // scores reproduce y exactly through the EigenProject path
    val bad = Decomp.probeScores(df, "v", m)
      .where(abs(element_at(col("probe_scores"), 1) - col("y")) > 1e-8).count()
    assert(bad === 0L)
  }

  test("fitRidgeProbes: ridge residuals satisfy Cov(x, r) == lambda * beta") {
    val lambda = 0.1
    val pts = for (i <- 0 until 80) yield {
      val a = (i % 9).toFloat; val b = ((i * 7) % 11).toFloat
      Array(a, b, (a * b % 5))
    }
    val df = vecsDf(pts).withColumn("y",
      element_at(col("v"), 1) * 1.5 - element_at(col("v"), 3) * 0.7 +
        element_at(col("v"), 2) * element_at(col("v"), 2) * 0.1) // not exactly linear
    val m = Decomp.fitRidgeProbes(df, "v", Seq(col("y")), lambda)
    val scored = Decomp.probeScores(df, "v", m)
      .withColumn("r", col("y") - element_at(col("probe_scores"), 1))
    val (_, _, jc) = Decomp.fitMeanCov(
      scored.select(concat(col("v").cast("array<double>"), array(col("r"))).as("xr")), "xr")
    for (j <- 0 until 3)
      assert(math.abs(jc(j)(3) - lambda * m.weights(0)(j)) < 1e-9,
        s"normal-equation gradient, dim $j")
  }

  test("fitRidgeProbes: collinear inputs solve via pseudo-inverse, no explosion") {
    // x2 = 2*x1 exactly -> Cxx is rank 1; target in the column space
    val pts = for (i <- 0 until 40) yield Array((i % 6).toFloat, 2.0f * (i % 6))
    val df = vecsDf(pts).withColumn("y", element_at(col("v"), 1) * 4.0 + 1.0)
    val m = Decomp.fitRidgeProbes(df, "v", Seq(col("y")), lambda = 0.0)
    assert(m.weights(0).forall(w => math.abs(w) < 100), "bounded weights")
    assert(math.abs(m.r2(0) - 1.0) < 1e-9, "target in column space is still exact")
  }

  test("multiclass one-vs-rest probe separates clustered classes") {
    val rnd = new scala.util.Random(7)
    val pts = for (c <- 0 until 3; _ <- 0 until 40) yield {
      val base = Seq(Array(10f, 0f), Array(0f, 10f), Array(-10f, -10f))(c)
      (c, base.map(x => x + rnd.nextFloat() - 0.5f))
    }
    val df = pts.toSeq.toDF("label", "v")
    val oneHot = (0 until 3).map(c => when(col("label") === c, 1.0).otherwise(0.0))
    val m = Decomp.fitRidgeProbes(df, "v", oneHot, lambda = 1e-3)
    val wrong = Decomp.probeScores(df, "v", m)
      .withColumn("pred",
        expr("array_position(probe_scores, array_max(probe_scores))") - 1)
      .where(col("pred") =!= col("label")).count()
    assert(wrong === 0L, "well-separated clusters must probe at 100%")
  }

  test("per-fold probes: leave-fold-out model == direct fit on the complement") {
    val pts = for (i <- 0 until 90) yield {
      val a = (i % 9).toFloat; val b = ((i * 7) % 11).toFloat
      Array(a, b, ((a + b) % 4))
    }
    val df = vecsDf(pts).withColumn("y",
      element_at(col("v"), 1) * 2.0 - element_at(col("v"), 2) + 0.5)
    val fold = pmod(col("id"), lit(3))
    val models = Decomp.fitRidgeProbesPerFold(df, "v", Seq(col("y")),
      fold, 3, lambda = 0.01)
    for (f <- 0 until 3) {
      // fold additivity must reproduce the direct complement fit EXACTLY
      // up to moment-summation order (the Gram doubles differ only by
      // per-partition add order)
      val direct = Decomp.fitRidgeProbes(df.where(pmod(col("id"), lit(3)) =!= f),
        "v", Seq(col("y")), lambda = 0.01)
      assert(models(f).n === direct.n)
      for (j <- 0 until 3)
        assert(math.abs(models(f).weights(0)(j) - direct.weights(0)(j)) < 1e-9,
          s"fold $f weight $j")
      assert(math.abs(models(f).intercepts(0) - direct.intercepts(0)) < 1e-9)
    }
    // out-of-fold scoring uses each row's own fold model
    val scored = Decomp.probeScoresByFold(df, "v", fold, models)
      .select(col("id"), element_at(col("probe_scores"), 1).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oneModelScores = Decomp.probeScores(df.where(pmod(col("id"), lit(3)) === 1), "v",
      models(1))
      .select(col("id"), element_at(col("probe_scores"), 1).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    oneModelScores.foreach { case (id, s) =>
      assert(math.abs(scored(id) - s) < 1e-9, s"row $id fold-1 score")
    }
  }

  test("per-fold probes detect memorization: random labels score at chance out-of-fold") {
    val rnd = new scala.util.Random(5)
    // 40-dim noise, 60 points, random binary labels: the full-fit probe
    // can overfit in-sample, but out-of-fold accuracy must sit near 0.5
    val pts = for (_ <- 0 until 60) yield Array.fill(40)(rnd.nextFloat() * 2 - 1)
    val labels = pts.map(_ => rnd.nextInt(2))
    val df = pts.zip(labels).zipWithIndex
      .map { case ((v, l), i) => (i.toLong, v, l) }.toDF("id", "v", "label")
    val oneHot = (0 until 2).map(c => when(col("label") === c, 1.0).otherwise(0.0))
    val full = Decomp.fitRidgeProbes(df, "v", oneHot, lambda = 1e-6)
    val trainAcc = Decomp.probeScores(df, "v", full)
      .withColumn("pred", expr("array_position(probe_scores, array_max(probe_scores))") - 1)
      .where(col("pred") === col("label")).count().toDouble / 60
    val models = Decomp.fitRidgeProbesPerFold(df, "v", oneHot,
      pmod(col("id"), lit(5)), 5, lambda = 1e-6)
    val oofAcc = Decomp.probeScoresByFold(df, "v", pmod(col("id"), lit(5)), models)
      .withColumn("pred", expr("array_position(probe_scores, array_max(probe_scores))") - 1)
      .where(col("pred") === col("label")).count().toDouble / 60
    assert(trainAcc > 0.8, s"40-dim probe on 60 random points must overfit in-sample ($trainAcc)")
    assert(oofAcc < 0.75, s"out-of-fold accuracy must collapse toward chance ($oofAcc)")
    assert(trainAcc - oofAcc > 0.15, s"the CV gap is the memorization signal ($trainAcc vs $oofAcc)")
  }

  test("review hardening: null elements loud, tiny-lambda null directions clamped") {
    // a null ELEMENT must error loudly, not zero-impute into the moments
    val withNullElem = spark.range(1).select(
      array(lit(1.0), lit(null).cast("double"), lit(3.0)).as("v"))
    val e = intercept[Exception](Decomp.fitMeanCov(withNullElem, "v"))
    assert(e.getMessage != null || e.getCause != null)
    // collinear inputs + an absurdly small positive lambda: the negative
    // rounding-noise eigenvalue must be clamped, never inverted
    val pts = for (i <- 0 until 40) yield Array((i % 6).toFloat, 2.0f * (i % 6))
    val df = vecsDf(pts).withColumn("y", element_at(col("v"), 1) * 4.0 + 1.0)
    val m = Decomp.fitRidgeProbes(df, "v", Seq(col("y")), lambda = 1e-18)
    assert(m.weights(0).forall(w => math.abs(w) < 100),
      s"tiny lambda must not explode null directions: ${m.weights(0).mkString(",")}")
  }

  test("fitMeanCov refuses over-wide vectors loudly") {
    val wide = Seq((1L, Array.fill(Decomp.MaxDims + 1)(0.0f))).toDF("id", "v")
    val e = intercept[Exception](Decomp.fitMeanCov(wide, "v"))
    assert(e.getMessage.contains("dims"))
  }

  test("matrix_gram is callable from SQL (registerAll)") {
    graft.functions.GraftFunctions.registerAll(spark)
    vecsDf(Seq(Array(1.0f, 2.0f), Array(3.0f, 4.0f))).createOrReplaceTempView("dg_v")
    val r = spark.sql("SELECT matrix_gram(v) AS g FROM dg_v")
      .selectExpr("g.n", "g.sum").head()
    assert(r.getLong(0) === 2)
    assert(r.getSeq[Double](1) === Seq(4.0, 6.0))
  }
}

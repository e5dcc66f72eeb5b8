package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("fitLinearProbe recovers exact weights on noiseless linear data") {
    // y = 2 + 3*x1 - 0.5*x2 exactly: OLS must return those weights to
    // float precision regardless of the elimination's pivot order
    val rows = for (i <- 1 to 40; j <- 1 to 3) yield {
      val x1 = i * 0.1; val x2 = j * 1.7
      (x1, x2, 2.0 + 3.0 * x1 - 0.5 * x2)
    }
    val df = rows.toDF("x1", "x2", "y")
    val w = Quality.fitLinearProbe(df, Seq("x1", "x2"), "y")
    assert(math.abs(w(0) - 2.0) < 1e-9 && math.abs(w(1) - 3.0) < 1e-9 &&
      math.abs(w(2) + 0.5) < 1e-9)
    // scoring with the exact weights reproduces y
    val scored = df.withColumn("s", Quality.linearScore(w, Seq("x1", "x2")))
    assert(scored.where(abs(col("s") - col("y")) > lit(1e-9)).count() === 0L)
  }

  test("fitLinearProbe fails loudly on a constant (singular) feature") {
    val df = Seq((1.0, 7.0, 0.0), (2.0, 7.0, 1.0), (3.0, 7.0, 0.0))
      .toDF("x1", "x2", "y")
    val e = intercept[IllegalArgumentException] {
      Quality.fitLinearProbe(df, Seq("x1", "x2"), "y")
    }
    assert(e.getMessage.contains("singular"))
  }

  test("quality probe ranks seeded junk below clean text (q130 contract)") {
    val docs = graft.meta.Tables.documents(spark, sf).select("doc_id", "text")
    val junk = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(expr("repeat('zzq glorp wib ', 20)"),
          substring(col("text"), 1, 40)).as("text"))
    val corpus = docs.unionByName(junk)
    val featCols = Seq("stop_frac", "dup_word_frac", "lm_logp")
    val feats = graft.operators.Relational.detach(
      Quality.qualityFeatures(corpus, "doc_id", "text"))
    val labeled = feats.where(col("doc_id") % 2 === 0)
      .withColumn("label", when(col("doc_id") >= 2000000L, 0.0).otherwise(1.0))
    val w = Quality.roundWeights(Quality.fitLinearProbe(labeled, featCols, "label"))
    val scored = Quality.scoreQuality(feats, w, featCols, 0.5)
      .select(col("doc_id"), col("score"), col("keep")).cache()
    // every junk doc scores below its own clean source document
    val pairs = scored.where(col("doc_id") < 2000000L).as("c")
      .join(scored.where(col("doc_id") >= 2000000L)
        .select((col("doc_id") - 2000000L).as("doc_id"), col("score").as("junk_score")),
        "doc_id")
    assert(pairs.where(col("junk_score") >= col("score")).count() === 0L)
    // the learned filter separates the classes: clean docs overwhelmingly
    // kept, junk docs overwhelmingly dropped — including the ODD-id junk
    // the fit never saw (held-out generalization)
    val cleanKeep = scored.where(col("doc_id") < 2000000L && col("keep")).count().toDouble /
      scored.where(col("doc_id") < 2000000L).count()
    val junkKeepHeldOut = scored
      .where(col("doc_id") >= 2000000L && col("doc_id") % 2 =!= 0 && col("keep")).count().toDouble /
      scored.where(col("doc_id") >= 2000000L && col("doc_id") % 2 =!= 0).count()
    assert(cleanKeep > 0.9, s"clean keep rate $cleanKeep")
    assert(junkKeepHeldOut < 0.1, s"held-out junk keep rate $junkKeepHeldOut")
    scored.unpersist()
  }

  test("evalBinaryClassifier matches a hand-computed AUC with ties") {
    // scores: pos at {0.9, 0.7, 0.5}, neg at {0.7, 0.3, 0.1} — one tied
    // pair. Pairwise over the 9 (pos, neg) pairs: 7 concordant (0.9 beats
    // all three; 0.7 and 0.5 each beat 0.3 and 0.1), 1 discordant
    // (0.5 < 0.7), 1 tie at 0.7 counting half -> AUC = 7.5/9
    val df = Seq((0.9, 1.0), (0.7, 1.0), (0.5, 1.0),
      (0.7, 0.0), (0.3, 0.0), (0.1, 0.0)).toDF("score", "label")
    val r = Quality.evalBinaryClassifier(df, "score", "label", 0.5).head()
    assert(r.getAs[Long]("n_pos") === 3L && r.getAs[Long]("n_neg") === 3L)
    assert(math.abs(r.getAs[Double]("auc") - 7.5 / 9) < 1e-6)
    // threshold 0.5: tp=3 (0.9,0.7,0.5), fp=1 (the 0.7 neg), fn=0, tn=2
    assert(r.getAs[Long]("tp") === 3L && r.getAs[Long]("fp") === 1L &&
      r.getAs[Long]("fn") === 0L && r.getAs[Long]("tn") === 2L)
    assert(r.getAs[Double]("prec") === 0.75 && r.getAs[Double]("rec") === 1.0)
    assert(math.abs(r.getAs[Double]("f1") - 2.0 * 3 / 7) < 1e-6)
    assert(math.abs(r.getAs[Double]("acc") - 5.0 / 6) < 1e-6)
  }

  test("evalBinaryClassifier: perfect and inverted rankings bound AUC") {
    val perfect = Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))
      .toDF("score", "label")
    assert(Quality.evalBinaryClassifier(perfect, "score", "label", 0.5)
      .head().getAs[Double]("auc") === 1.0)
    val inverted = Seq((0.1, 1.0), (0.2, 1.0), (0.8, 0.0), (0.9, 0.0))
      .toDF("score", "label")
    assert(Quality.evalBinaryClassifier(inverted, "score", "label", 0.5)
      .head().getAs[Double]("auc") === 0.0)
  }

  test("scoreQuality is a zero-shuffle projection over a feature frame") {
    val feats = Seq((1L, 0.1, 0.2, -1.0), (2L, 0.3, 0.4, -2.0))
      .toDF("doc_id", "stop_frac", "dup_word_frac", "lm_logp")
    val plan = Quality.scoreQuality(feats, Array(0.5, 1.0, -1.0, 0.1),
      Seq("stop_frac", "dup_word_frac", "lm_logp"), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("perGroupQuantileFilter: per-group thresholds equalize keep RATE, not value") {
    // group a scores 1..100, group b 1001..1100: any global threshold that
    // keeps 75% overall wipes out all of group a; the per-group p25 keeps
    // exactly 75% of EACH
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 100).map(i => ("b", 1000.0 + i))).toDF("grp", "score")
    val out = Quality.perGroupQuantileFilter(df, "score", Seq("grp"), 0.25)
    val kept = out.where(col("keep")).groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === Map("a" -> 75L, "b" -> 75L)) // p25 = 25.75 -> 26..100 keep
    val th = out.select("grp", "threshold").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(th("a") === 25.75 && th("b") === 1025.75)
    // the GK-sketch path (the 100-TB fit) runs and keeps a similar count
    val approx = Quality.perGroupQuantileFilter(df, "score", Seq("grp"), 0.25,
      exact = false)
    val nApprox = approx.where(col("keep")).count()
    assert(math.abs(nApprox - 150L) <= 4, s"sketch keep count off: $nApprox")
    // grouped-empty mode: one global threshold
    val global = Quality.perGroupQuantileFilter(df, "score", Seq.empty, 0.25)
    assert(global.select("threshold").distinct().count() === 1)
    intercept[IllegalArgumentException](
      Quality.perGroupQuantileFilter(df, "score", Seq("grp"), 1.5))
    intercept[IllegalArgumentException](
      Quality.perGroupQuantileFilter(
        df.withColumn("keep", lit(true)), "score", Seq("grp"), 0.5))
  }
}

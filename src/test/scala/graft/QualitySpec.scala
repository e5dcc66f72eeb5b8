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

  test("scoreQuality is a zero-shuffle projection over a feature frame") {
    val feats = Seq((1L, 0.1, 0.2, -1.0), (2L, 0.3, 0.4, -2.0))
      .toDF("doc_id", "stop_frac", "dup_word_frac", "lm_logp")
    val plan = Quality.scoreQuality(feats, Array(0.5, 1.0, -1.0, 0.1),
      Seq("stop_frac", "dup_word_frac", "lm_logp"), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
}

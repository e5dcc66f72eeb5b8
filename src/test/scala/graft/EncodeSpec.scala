package graft

import graft.operators.Encode
import org.apache.spark.sql.functions._

class EncodeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1.0), ("b", 2.0), ("b", 3.0), ("c", 4.0), ("a", 5.0), ("a", 6.0), ("c", 7.0)
  ).toDF("cat", "x")

  test("labelEncode assigns sorted-distinct codes (sklearn classes_ order)") {
    val out = Encode.labelEncode(df, "cat")
      .select("cat", "cat_code").distinct().orderBy("cat")
      .as[(String, Long)].collect()
    assert(out === Array(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("labelEncode leaves null input with null code") {
    val withNull = df.union(Seq((null.asInstanceOf[String], 8.0)).toDF("cat", "x"))
    val out = Encode.labelEncode(withNull, "cat")
    assert(out.where(col("cat").isNull && col("cat_code").isNull).count() === 1)
    // and codes are still 0..2 (null excluded from the fit)
    assert(out.agg(max("cat_code")).head().getLong(0) === 2L)
  }

  test("standardScale: z-scores have mean ~0 and stddev_pop ~1") {
    val out = Encode.standardScale(df, Seq("x"))
    val r = out.agg(avg("x_z"), stddev_pop("x_z")).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("standardScale uses population stddev (sklearn ddof=0), not sample") {
    // x = 1..7: mean 4, stddev_pop = sqrt(28/7) = 2 exactly
    val z1 = Encode.standardScale(df, Seq("x"))
      .where(col("x") === 1.0).select("x_z").head().getDouble(0)
    assert(math.abs(z1 - (-1.5)) < 1e-12)
  }

  test("minMaxScale global: output in [0,1], min->0, max->1") {
    val out = Encode.minMaxScale(df, Seq("x"))
    val stats = out.agg(min("x_mm"), max("x_mm")).head()
    assert(stats.getDouble(0) === 0.0 && stats.getDouble(1) === 1.0)
    assert(out.where(col("x_mm") < 0 || col("x_mm") > 1).count() === 0)
  }

  test("minMaxScale per group fits within each group") {
    val out = Encode.minMaxScale(df, Seq("x"), Seq("cat"))
    val perGroup = out.groupBy("cat").agg(min("x_mm"), max("x_mm"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    perGroup.foreach { case (_, lo, hi) => assert(lo === 0.0 && hi === 1.0) }
  }
}

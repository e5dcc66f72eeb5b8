package graft

import graft.meta.Schemas
import graft.operators.{Audit, Clean, Encode}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Row, SparkSessionExtensions}

/** The reference's full metadata ETL composed end-to-end
  * (read_csv_s3_train.py process_batch, SURVEY §3.1) + extension installer. */
class PipelineSpec extends SparkSuite {

  private lazy val osv5m = {
    def r(idx: Long, id: java.lang.Long, country: String, region: String,
          city: String, capturedAt: java.lang.Long, road: java.lang.Double,
          user: String): Row =
      Row(id, 48.85, 2.35, "http://img", country, "seq1", capturedAt, 1L, 2L,
        "cell1", region, "sub1", city, 3L, road, 1L, 2L, 3L, 4.5,
        1L, 2L, 3L, 4L, 5L, 6L, 7L,
        region, "usub1", city, country, user, "creator9", idx)
    val rows = Seq(
      r(0, 1L, null, null, null, 1704067200000L, 0.5, null),
      r(1, 2L, "  France ", "IDF", "Paris", null, null, "alice"),
      r(2, 3L, "Japan", null, "  Tokyo ", 1704153600000L, 0.7, null),
      r(3, 4L, "Japan", "Kanto", null, 1704240000000L, null, "bob"))
    val schema = StructType(Schemas.osv5m.fields :+ StructField("row_idx", LongType))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("osv5mClean: drops url col, casts ids, fills every gap (§3.1 stages 3-5)") {
    val cleaned = Clean.osv5mClean(osv5m, "row_idx")
    assert(!cleaned.columns.contains("thumb_original_url"))
    assert(cleaned.schema("id").dataType === StringType)
    assert(cleaned.schema("creator_id").dataType === StringType)
    // date parts present with sentinel for the null captured_at row
    val p = cleaned.where(col("row_idx") === 1).select("year", "month", "day").head()
    assert(p === Row(1970, 1, 1))
    // ffill/bfill closed the categorical gaps; constant fills closed the rest
    val filledCols = Seq("region", "sub-region", "city", "unique_city",
      "creator_username", "road_index")
    assert(Audit.totalNulls(cleaned.select(filledCols.map(col): _*)) === 0)
  }

  test("clean -> encode -> scale composes like the reference pipeline") {
    val cleaned = Clean.osv5mClean(osv5m, "row_idx")
    val trimmedCountry = cleaned.where(col("row_idx") === 1)
      .select("country").head().getString(0)
    assert(trimmedCountry === "France") // trim happened before fill
    val encoded = Encode.labelEncode(cleaned, "country")
    val scaled = Encode.standardScale(encoded, Schemas.osv5mScaleCols)
    assert(scaled.columns.contains("country_code"))
    assert(Schemas.osv5mScaleCols.forall(c => scaled.columns.contains(s"${c}_z")))
    assert(scaled.count() === 4)
  }

  test("approx_count_distinct within default rsd of exact (north-star)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val r = docs.agg(
      countDistinct(col("text")).as("exact"),
      approx_count_distinct(col("text")).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("LLM corpus pipeline end-to-end: curate -> soft-dedup -> shard -> JSONL export") {
    import graft.operators.{Batching, Dedup, TextAnalysis}
    import spark.implicits._
    // a small crawl with every defect class the pipeline must handle
    val base = (1 to 40).map(i => s"tok$i").mkString(" ") + " "
    val docs = Seq(
      (1L, base + "alpha original"),
      (2L, base + "alpha original"),              // exact dup of 1 -> drops
      (3L, base + "beta original"),
      (4L, "zzq " * 60),                          // repetition junk -> quality-drops
      (5L, base + "gamma spamtok body"),          // badword -> drops
      (6L, base + "delta original")
    ).toDF("doc_id", "text")
    // stage 1: quality (repetition) + badwords, each on prior survivors
    val rep = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .where(col("keep")).select("doc_id")
    val s1 = docs.join(rep, "doc_id")
    val s2 = s1.join(
      TextAnalysis.badwordFilter(s1, "doc_id", "text", Seq("spamtok"))
        .where(col("keep")).select("doc_id"), Seq("doc_id"))
    // stage 2: exact dedup keep-first
    val s3 = Dedup.dedupKeepFirst(s2, Seq("text"), Seq("doc_id"))
    assert(s3.select("doc_id").as[Long].collect().sorted === Array(1L, 3L, 6L))
    // stage 3: deterministic shard plan + physical JSONL export
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    Batching.writeJsonlShards(s3, "doc_id", "text", nShards = 2, seed = 3L, dir)
    val back = spark.read.json(s"$dir/shard=*")
    assert(back.count() === 3L)
    assert(back.select("id").as[Long].collect().sorted === Array(1L, 3L, 6L))
    // the exported text round-trips byte-identically through the sink
    val t1 = back.where(col("id") === 1).select("text").as[String].head()
    assert(t1 === base + "alpha original")
  }

  test("GraftExtensions builders construct all three expressions") {
    // Full withExtensions wiring needs a fresh SparkContext; here we verify
    // the injected builders directly.
    new GraftExtensions().apply(new SparkSessionExtensions)
    import graft.functions._
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(HaversineKm(Literal(0d), Literal(0d), Literal(0d), Literal(1d))
      .eval(null).asInstanceOf[Double] > 111.0)
    assert(RollingHash(Literal.create("ab", StringType)).eval(null) === 3105L)
  }
}

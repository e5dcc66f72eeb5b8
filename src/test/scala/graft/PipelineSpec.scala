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

  test("multimodal dedup ladder: text, image, and audio fingerprints share one pair stage") {
    import spark.implicits._
    import graft.operators.{Dedup, Media, Sound}
    // TEXT: a doc and its lightly re-rendered copy + one distinct doc
    val base = "the quick brown fox jumped over the lazy dog and ran away " * 4
    val docs = Seq(
      ("t/1", base.trim),
      ("t/2", base.trim + " again"),
      ("t/3", "completely different content about database query optimization " +
        "plans joins shuffles and the cost model that picks between them"))
      .toDF("id", "text")
    val textHashes = docs.select(col("id"), lit("text").as("modality"),
      graft.functions.GraftFunctions.simhash64(col("text")).as("h"))
    // IMAGE: one picture encoded twice + a different picture
    def img(invert: Boolean): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(96, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 96; y <- 0 until 64) {
        val base = if (invert) 255 - x * 255 / 96 else x * 255 / 96
        val wave = (math.sin(if (invert) x / 5.0 + 2.0 else x / 9.0) * 55).toInt
        val v = math.min(255, math.max(0, base / 3 + 80 + wave + y / 4))
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, out); out.toByteArray
    }
    val imgHashes = Seq(
      ("i/1", Media.dHash64(enc(img(false), "png")).get),
      ("i/2", Media.dHash64(enc(img(false), "jpg")).get),
      ("i/3", Media.dHash64(enc(img(true), "png")).get))
      .toDF("id", "h").withColumn("modality", lit("image"))
    // AUDIO: one recording at two sample rates + a different one
    def wav(rate: Int, mul: Int): Array[Byte] = {
      val levels = (0 until 65).map(i => 0.15 + 0.8 * ((i * mul) % 65) / 65.0)
      val n = rate
      val samples = Array.tabulate(n) { i =>
        val seg = math.min(64, i * 65 / n)
        levels(seg) * math.sin(2 * math.Pi * 440 * i / rate)
      }
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
      out.write("RIFF".getBytes); w32(36 + n * 2); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(rate)
      w32(rate * 2); w16(2); w16(16)
      out.write("data".getBytes); w32(n * 2)
      samples.foreach(v => w16(math.round(
        math.max(-1.0, math.min(1.0, v)) * 32767).toInt & 0xffff))
      out.toByteArray
    }
    def ah(rate: Int, mul: Int): Long =
      Sound.energyHash64(Sound.decodeWavPcm(wav(rate, mul)).get.mono).get
    val audioHashes = Seq(
      ("a/1", ah(8000, 29)), ("a/2", ah(16000, 29)), ("a/3", ah(8000, 41)))
      .toDF("id", "h").withColumn("modality", lit("audio"))
    // ONE ladder: per-modality banded pairs (a text simhash must never
    // pair with an image hash) -> union -> shared connected components
    val all = textHashes.unionByName(imgHashes.select("id", "modality", "h"))
      .unionByName(audioHashes.select("id", "modality", "h"))
    val pairs = Seq("text", "image", "audio").map { m =>
      Dedup.hammingNearDupPairs64(all.where(col("modality") === m), "id", "h",
        maxHamming = 3)
    }.reduce(_ unionByName _)
    val comps = Dedup.connectedComponents(
      all.select(col("id")), pairs.select("id_a", "id_b"))
      .as[(String, String)].collect().toMap
    // each modality's re-encoded copy clusters with its original...
    assert(comps("t/2") === comps("t/1"))
    assert(comps("i/2") === comps("i/1"))
    assert(comps("a/2") === comps("a/1"))
    // ...and the distinct items stay their own clusters
    assert(Seq("t/3", "i/3", "a/3").map(comps).distinct.size === 3)
    assert(comps.values.toSet.size === 6)
  }
}

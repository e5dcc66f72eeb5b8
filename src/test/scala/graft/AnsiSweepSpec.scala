package graft

import org.apache.spark.sql.functions._

import graft.operators.{Batching, Dedup}

/** ANSI sweep, parts 2+3 (the z-order span guard under both modes lives
  * in ClusteringSpec): `spark.sql.ansi.enabled` flips raw int64 Catalyst
  * arithmetic between silent wraparound (false) and ARITHMETIC_OVERFLOW
  * throws (true, the Spark 4 default), so every family that runs integer
  * `+`/`*` over user-derived values in SQL expressions needs either a
  * both-modes parity pin or a proof the overflow edge is unreachable.
  *
  * The three remaining families and their bounds:
  *
  *  - HASH MIXING (Dedup): the poly-31 fold reduces mod 1e9+7 every step,
  *    so the pre-mod intermediate is at most 31*(Mod-1) + maxCodepoint
  *    < 3.2e10; the MinHash affine maps peak at (2*15+3)*(Mod-1) + 7*15+1
  *    < 3.4e10; SimHash's accumulators are bounded by the shingle count
  *    and 2^16. All five orders of magnitude below the int64 edge — the
  *    parity test runs the full shingle -> minhash -> simhash pipeline
  *    (both the native kernel and the pure-SQL fold) under both modes.
  *
  *  - BYTE/TOKEN BUDGETS (Batching): the running weight sum peaks at the
  *    table's TOTAL weight. Overflow needs a single table whose summed
  *    byte estimate exceeds 2^63-1 B ~ 9.2 EB — five orders above the
  *    100 TB design point, and a corpus no single Spark job ingests as
  *    one chunking pass. Under ANSI=true an absurd mis-parsed weight
  *    column throws loudly instead of wrapping into negative chunk ids —
  *    the preferable failure, so no guard is added.
  *
  *  - EVENT-TIME µs MATH (q20 batch sessionize, EventStreams µs locals):
  *    unix_micros values are bounded by Spark's timestamp range, and the
  *    arithmetic only ever SUBTRACTS two timestamps of the same stream or
  *    adds a gap horizon measured in minutes. A difference overflows only
  *    when two events sit more than ~292,000 years apart; the gap-horizon
  *    addition (endUs + gapUs + 999) moves the edge by under 2e9. The
  *    parity test runs the full q20 gaps-and-islands query both ways.
  */
class AnsiSweepSpec extends SparkSuite {
  import spark.implicits._

  private def bothModes[T](f: => T): (T, T) = {
    val key = "spark.sql.ansi.enabled"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true"); val on = f
      spark.conf.set(key, "false"); val off = f
      (on, off)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("hash-mixing family: shingle/minhash/simhash identical under BOTH ANSI modes") {
    graft.functions.GraftFunctions.registerAll(spark)
    // high codepoints push the fold's per-step addend as far as real text
    // can (ascii() returns the codepoint, not a byte)
    val docs = Seq(
      (1L, "香袈 睷 repeated 香袈 睷 tokens here"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "zz")) // < 3 tokens: the whole-text shingle fallback
      .toDF("doc_id", "text")
    def run() = docs.select(
        col("doc_id"),
        expr(Dedup.minhashFrag(Dedup.shingleHashesFrag("text"))).as("sig"),
        expr(Dedup.simhashFrag(
          s"transform(split(text, ' '), s -> ${Dedup.hashFrag("s")})")).as("sim"),
        // the pure-SQL fold is where ANSI could actually bite (the native
        // kernel does its math outside Catalyst) — pin both agree, both modes
        expr(Dedup.sqlHashFrag("text")).as("h_sql"),
        expr(Dedup.hashFrag("text")).as("h_native"))
      .orderBy("doc_id").collect().toSeq
    val (on, off) = bothModes(run())
    assert(on === off)
    assert(on.forall(r => r.getLong(3) === r.getLong(4)),
      "pure-SQL fold diverged from the native kernel")
  }

  test("budget family: weightBudgetChunkId identical under BOTH ANSI modes") {
    // weights near the top of a realistic single-row range (a 1 GiB row
    // estimate) against a 4 GiB budget — the cum sum stays ~1e11
    val rows = (1L to 40L).map(i => (i, if (i % 7 == 0) 1073741824L else 257L))
      .toDF("id", "w")
    def run() = Batching.weightBudgetChunkId(rows, Seq("id"),
        budget = 4294967296L, weight = col("w"))
      .orderBy("id").select("id", "chunk_id").collect().toSeq
    val (on, off) = bothModes(run())
    assert(on === off)
    assert(on.map(_.getLong(1)).max > 0, "fixture never crossed a chunk boundary")
  }

  test("event-time µs family: q20 sessionize identical under BOTH ANSI modes") {
    val (on, off) = bothModes(
      SparkEntry.queries("q20_sessionize")(spark, sf).collect().toSeq)
    assert(on === off)
    assert(on.nonEmpty)
  }

  test("text-quality per-mille family: gopher flags + main-content extraction identical under BOTH ANSI modes") {
    // TextAnalysis's raw-int arithmetic on user-derived values is the
    // per-mille scaling pattern (`count * 1000` vs `total * threshold`,
    // gopherQualityFlags and mainContentExtract's stopword gate) plus
    // plain length/count sums. Bounds: counts are bounded by string
    // length, and a Spark string caps at ~2 GiB, so count * 1000 < 2^41
    // — twenty-two bits below the int64 edge; the block char sums
    // accumulate into an explicit BIGINT. The parity pin runs the q87
    // gopher query (per-mille flags over real documents) and the WARC
    // main-content extractor (per-mille stopword gate over link-laden
    // HTML) under both modes.
    val (on, off) = bothModes(
      SparkEntry.queries("q87_gopher_quality")(spark, sf).collect().toSeq)
    assert(on === off)
    assert(on.nonEmpty)
    val html = Seq(
      (1L, "<html><body><p>" + Seq.fill(40)("the quick brown fox was here and it was fine").mkString(" ") +
        "</p><p><a href=x>nav</a> <a href=y>more nav</a></p></body></html>"),
      (2L, "<html><body><p><a href=a>l</a><a href=b>l</a></p></body></html>"))
      .toDF("doc_id", "html")
    def runExtract() = graft.operators.TextAnalysis
      .extractMainContent(html, "doc_id", "html")
      .orderBy("doc_id").collect().toSeq
    val (eon, eoff) = bothModes(runExtract())
    assert(eon === eoff)
    assert(eon.nonEmpty)
  }

  test("hyperplane family: 512-dim bucketing identical under BOTH ANSI modes") {
    // the plane-weight product (d*131 + p + 7) * (d*137 + p*149 + 11)
    // exceeds 2^31 past ~250 dims; without the BIGINT cast in
    // hyperplaneBucketExpr this 512-dim fixture throws ARITHMETIC_OVERFLOW
    // under ANSI=true and silently miscomputes planes under false
    val wide = spark.range(64).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 512), d -> " +
        "CAST(pmod(xxhash64(id, d), 10007) / 10007.0 - 0.5 AS DOUBLE))")
        .as("embedding"))
    def run() = graft.operators.Similarity.hyperplaneBuckets(wide, nPlanes = 8)
      .orderBy("vec_id").collect().toSeq
    val (on, off) = bothModes(run())
    assert(on === off)
    // and the buckets actually discriminate (the degeneracy regression's
    // other half lives in DedupSimilaritySpec)
    assert(on.map(_.getLong(1)).distinct.size > 8)
  }
}

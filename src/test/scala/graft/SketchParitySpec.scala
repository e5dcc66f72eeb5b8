package graft

import graft.meta.Tables
import graft.operators.{Audit, Encode, TextAnalysis}
import org.apache.spark.sql.functions._

/** Sketch-vs-exact anchors for the four oracle-less queries
  * (q59/q70/q71/q80). Sketch ESTIMATES are engine-specific, so the driver
  * records only a rows-only check for them — these tests pin each sketch
  * path to its exact twin on the same frame at sf0.001, so a mis-wired
  * sketch (wrong column, wrong scale, wrong guarantee) can no longer pass
  * as "rows came back". */
class SketchParitySpec extends SparkSuite {

  test("q59 anchor: HLL++ ndv within rel-error of exact ndv (same frame)") {
    val li = Tables.lineitem(spark, sf)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
    def ndv(exact: Boolean): Map[String, Long] =
      Audit.profile(li, cols, exact = exact).collect()
        .map(r => r.getAs[String]("column") -> r.getAs[Long]("n_distinct")).toMap
    val (ex, ap) = (ndv(exact = true), ndv(exact = false))
    cols.foreach { c =>
      val rel = math.abs(ap(c) - ex(c)).toDouble / ex(c)
      // approx_count_distinct default rsd = 0.05; 3-sigma bound
      assert(rel <= 0.15, s"$c: approx ndv ${ap(c)} vs exact ${ex(c)} (rel $rel)")
    }
  }

  test("q70 anchor: approx winsorize row-identical to exact within band eps") {
    val li = Tables.lineitem(spark, sf)
    // the transform is a pure function of (group, value) given the fits, and
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic table — so
    // compare per distinct (flag, price) pair, which IS a lossless key
    def w(exact: Boolean) =
      Encode.winsorize(li, "l_extendedprice", Seq("l_returnflag"), 0.05, 0.95,
        exact = exact)
        .select(col("l_returnflag").as("k1"), col("l_extendedprice").as("k2"),
          col("l_extendedprice_w").as(if (exact) "w_ex" else "w_ap"))
        .distinct()
    val maxRel = w(exact = true).join(w(exact = false), Seq("k1", "k2"))
      .select(max(abs(col("w_ex") - col("w_ap")) / greatest(abs(col("w_ex")), lit(1.0))))
      .head().getDouble(0)
    // GK at accuracy=10000 on a sf0.001 group is near-exact; only rows at
    // the clamp band can differ, by at most an adjacent-order-stat gap
    assert(maxRel <= 0.02, s"max relative winsorize divergence $maxRel")
  }

  test("q71 anchor: approx robust z within eps of exact z on every row") {
    val li = Tables.lineitem(spark, sf)
    // same (group, value) keying as the q70 anchor — row ids are not unique
    def rz(exact: Boolean) =
      Encode.robustScale(li, "l_extendedprice", Seq("l_returnflag"), exact = exact)
        .select(col("l_returnflag").as("k1"), col("l_extendedprice").as("k2"),
          col("l_extendedprice_rz").as(if (exact) "z_ex" else "z_ap"))
        .distinct()
    val maxAbs = rz(exact = true).join(rz(exact = false), Seq("k1", "k2"))
      .select(max(abs(col("z_ex") - col("z_ap"))))
      .head().getDouble(0)
    // z-scores are O(1); a wrong fit (median or MAD off) shifts/scales every
    // row, so a tight absolute band on the worst row is the strong anchor
    assert(maxAbs <= 0.05, s"max absolute robust-z divergence $maxAbs")
  }

  test("q80 anchor: sketch top-k contains every unambiguous exact heavy hitter") {
    val docs = Tables.documents(spark, sf)
    val k = 10
    val sketch = TextAnalysis.heavyHitterTokens(docs, "lang", "text", k)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("token")))
      .groupBy(_._1).map { case (l, ts) => l -> ts.map(_._2).toSet }
    val exact = docs
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("token"),
        r.getAs[Long]("n")))
    exact.groupBy(_._1).foreach { case (lang, rows) =>
      val counts = rows.map(t => t._2 -> t._3)
      // every token strictly above the exact k-th count is in ANY correct
      // top-k under any tie-break — it must be in the sketch's
      val kth = counts.map(_._2).sortBy(-_).take(k).last
      val mandatory = counts.filter(_._2 > kth).map(_._1).toSet
      val got = sketch.getOrElse(lang, Set.empty)
      assert(mandatory.subsetOf(got),
        s"$lang: exact heavy hitters missing from sketch: ${mandatory -- got}")
    }
  }

  test("q80 boundary: guarantee holds when maxItemsTracked forces approximation") {
    import spark.implicits._
    // 1 hot token (400 of 1000 occurrences) + 100 cold tokens; tracking only
    // 8 items forces eviction, but any item with count > n/maxItemsTracked
    // (= 125) is guaranteed to survive a frequent-items sketch
    val text = (Seq.fill(400)("hot") ++
      (0 until 600).map(i => s"cold${i % 100}")).mkString(" ")
    val docs = Seq(("en", text)).toDF("lang", "text")
    val top = TextAnalysis.heavyHitterTokens(docs, "lang", "text", 3,
      maxItemsTracked = 8).collect()
    val tokens = top.map(_.getAs[String]("token")).toSet
    assert(tokens.contains("hot"), s"guaranteed heavy hitter evicted: got $tokens")
    val hotEst = top.find(_.getAs[String]("token") == "hot").get
      .getAs[Long]("est_occur")
    // estimate error is bounded by n / maxItemsTracked
    assert(math.abs(hotEst - 400L) <= 1000L / 8,
      s"hot estimate $hotEst outside the n/maxItemsTracked bound")
  }

  test("q93 anchor: PQ ADC top-10 overlaps exact top-10 well above chance") {
    import graft.operators.Similarity
    // mirrors q93_pq_ann exactly: 8x16 codebooks fit on the (sample-sized)
    // table, 3 Lloyd rounds, 8 probes, k=10 — quantization is lossy
    // (64 dims -> 64 bits), so the anchor is RECALL vs the exact twin,
    // not equality.
    val emb = Tables.embeddings(spark, sf)
    val books = Similarity.fitPqCodebooks(emb, m = 8, ksub = 16, iterations = 3)
    val probes = emb.where(col("vec_id") < 8)
    val pq = Similarity.pqTopK(Similarity.pqEncode(emb, books), books, probes, 10)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Similarity.bruteForceTopK(emb, probes, 10)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byProbe = pq.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val recalls = exact.groupBy(_._1).map { case (p, xs) =>
      val hit = byProbe.getOrElse(p, Set.empty)
      xs.count(x => hit.contains(x._2)).toDouble / xs.length
    }.toSeq
    val mean = recalls.sum / recalls.length
    // chance overlap of two 10-sets in a ~500-vector corpus is ~0.02; a
    // mis-wired LUT or codebook would collapse to that. Random 64-d data is
    // PQ's worst case, so the floor is deliberately modest (measured 0.31
    // at sf0.001; the fit is deterministic up to VectorAvg partial order).
    assert(mean >= 0.2, s"mean PQ recall@10 $mean — ADC path likely mis-wired")
  }

  test("q100 anchor: IVF-PQ recall@10 beats the flat-PQ floor (residual fit)") {
    import graft.operators.Similarity
    // mirrors q100_ivfpq_ann exactly: 8 cells, 8x16 residual codebooks,
    // nprobe=2. Residuals are centered, so the same code budget must land
    // ABOVE flat PQ's floor (measured 0.44 vs 0.31 at sf0.001).
    val emb = Tables.embeddings(spark, sf)
    val probes = emb.where(col("vec_id") < 8)
    val cents = Similarity.trainCentroids(emb, 8, 3)
    val books = Similarity.fitIvfPqCodebooks(emb, cents, 8, 16, 3)
    val enc = Similarity.ivfPqEncode(emb, cents, books)
    val got = Similarity.ivfPqTopK(enc, cents, books, probes, 10, nprobe = 2)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Similarity.bruteForceTopK(emb, probes, 10)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byProbe = got.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val recalls = exact.groupBy(_._1).map { case (p, xs) =>
      xs.count(x => byProbe.getOrElse(p, Set.empty).contains(x._2)).toDouble / xs.length
    }.toSeq
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.3, s"mean IVF-PQ recall@10 $mean — residual path mis-wired")
  }
}

package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Tiny-literal edge tests for the round-7 text operators (SURVEY §5.2.2):
  * repetition stats at degenerate document shapes, and decontamination's
  * per-document distinct semantics + broadcast-guard fallback.
  */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def repRows(texts: (Long, String)*) =
    TextAnalysis.repetitionStats(texts.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Double]("dup_word_frac"), r.getAs[Double]("top_ngram_frac"),
        r.getAs[Boolean]("keep"))))
      .toMap

  test("repetitionStats: empty and 1-token docs have no grams, zero fractions") {
    // Single-space split yields [""] for the empty string — 1 token by the
    // corpus-exact contract, and below n=2 so the gram array is empty.
    val out = repRows(1L -> "", 2L -> "hello")
    assert(out(1L) === ((1L, 0.0, 0.0, true)))
    assert(out(2L) === ((1L, 0.0, 0.0, true)))
  }

  test("repetitionStats: an all-same doc fails both thresholds") {
    val out = repRows(1L -> "a a a a")
    // 4 tokens, 1 type -> dup 0.75; grams ["a a","a a","a a"] -> top 1.0
    assert(out(1L) === ((4L, 0.75, 1.0, false)))
  }

  test("repetitionStats: longest-run fold counts the modal bigram exactly") {
    // tokens [x y x y z]: bigrams "x y","y x","x y","y z" -> top share 2/4
    val out = repRows(1L -> "x y x y z")
    assert(out(1L)._1 === 5L)
    assert(out(1L)._2 === 0.4)    // 1 - 3 types / 5 tokens
    assert(out(1L)._3 === 0.5)
    assert(!out(1L)._4)           // top share 0.5 > 0.08
  }

  test("repetitionStats: a diverse doc passes both thresholds") {
    val text = (1 to 20).map(i => s"w$i").mkString(" ") // 20 distinct tokens
    val out = repRows(1L -> text)
    assert(out(1L)._2 === 0.0)
    assert(out(1L)._3 === 0.052632) // 1/19 rounded to 6 dp
    assert(out(1L)._4)
  }

  private val contaminationDocs = Seq(
    (100L, "alpha beta gamma delta", true),                     // benchmark
    (1L, "alpha beta gamma delta epsilon", false),              // 2 shared grams
    (2L, "alpha beta gamma zzz alpha beta gamma", false),       // same gram twice
    (3L, "alpha beta", false),                                  // shorter than n
    (4L, "one two three four", false))                          // clean
    .toDF("doc_id", "text", "is_bench")

  private def hits(maxGrams: Long) =
    TextAnalysis.contaminationHits(contaminationDocs, "doc_id", "text",
      col("is_bench"), n = 3, broadcastMaxGrams = maxGrams)
      .orderBy("doc_id").as[(Long, Long)].collect()

  test("contaminationHits: distinct-per-doc counts; short and clean docs absent") {
    // doc 1 shares both bench grams; doc 2's repeated "alpha beta gamma"
    // counts ONCE (per-doc distinct); docs 3 (< n tokens) and 4 (clean)
    // never appear.
    assert(hits(maxGrams = 10000000L) === Array((1L, 2L), (2L, 1L)))
  }

  test("contaminationHits: shuffle fallback above the broadcast bound matches") {
    assert(hits(maxGrams = 0L) === hits(maxGrams = 10000000L))
  }
}

package graft

import graft.operators.{Dedup, Stats, TextAnalysis}
import org.apache.spark.sql.functions._

/** Randomized equivalence tests for the round-13 fused kernels: each one
  * replaced a declarative (HOF/explode/join) form whose semantics the
  * kernel must reproduce EXACTLY — these specs re-derive the old form
  * (as plain Scala brute force or as the operator's own fallback lane)
  * over randomized inputs and compare outputs row for row. The fixed
  * fixtures in TextAnalysisSpec/DedupSimilaritySpec pin hand-computed
  * values; these pin the long tail (empty tokens, unicode, duplicate
  * values, degenerate docs) that fixtures under-sample.
  */
class KernelEquivalenceSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(1913)

  test("WinnowFingerprints == brute-force winnowing on random token streams") {
    val vocab = Vector("a", "bb", "ccc", "Δδ", "中", "x9", "", "longertoken")
    val docs = (0 until 120).map { i =>
      val n = rnd.nextInt(14) // 0..13 tokens — below/at/above k and w
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val k = 3; val w = 4
    def poly31(s: String): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % graft.functions.RollingHash.Mod
        i += Character.charCount(cp)
      }
      acc
    }
    def brute(text: String): Set[(Int, Long)] = {
      val tk = text.split(" ", -1)
      if (tk.length < k) return Set.empty
      val gh = (0 to tk.length - k).map(i => poly31(tk.slice(i, i + k).mkString(" ")))
      if (gh.length < w) return Set.empty
      (0 to gh.length - w).map { j =>
        val win = gh.slice(j, j + w)
        val m = win.min
        (j + win.indexOf(m) + 1, m) // leftmost min, 1-based
      }.toSet
    }
    val got = Dedup.winnowedFingerprints(docs.toDF("doc_id", "text"),
        "doc_id", "text", k, w)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(r => (r._2, r._3)).toSet }
    for ((id, text) <- docs) {
      val exp = brute(text)
      assert(got.getOrElse(id, Set.empty) === exp, s"doc $id: '$text'")
    }
  }

  test("char-LM fused lane == shuffle lane on a random unicode corpus") {
    val alphabet = "abcde 中文ü?!".toCharArray
    val docs = (0 until 80).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val fast = TextAnalysis.charTrigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    val slow = TextAnalysis.charTrigramLogProb(docs, "doc_id", "text",
        broadcastMaxTrigrams = 0L)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(fast === slow)
    assert(fast.nonEmpty, "corpus must produce scored docs")
  }

  test("word-bigram fused lane == shuffle lane on a random corpus") {
    val vocab = Vector("alpha", "beta", "g4mma", "x", "Y2", "zz")
    val docs = (0 until 80).map { i =>
      val n = rnd.nextInt(12)
      // punctuation separators exercise the [A-Za-z0-9]+ scan vs regex
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", ", ", "—", "\n")(rnd.nextInt(4))))
    }.toDF("doc_id", "text")
    val fit = col("doc_id") % 2 === 0
    val fast = TextAnalysis.wordBigramLogProb(docs, "doc_id", "text", fit)
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect()
    val slow = TextAnalysis.wordBigramLogProb(docs, "doc_id", "text", fit,
        broadcastMaxEntries = 0L)
      .orderBy("doc_id").as[(Long, Long, Double, Double)].collect()
    assert(fast === slow)
    assert(fast.nonEmpty)
  }

  test("lang-ID fused lane == shuffle lane on a random multilingual corpus") {
    val alphabets = Map(
      "aa" -> "abcdefg ", "bb" -> "hijklmn ", "cc" -> "abchijk Δ中")
    val docs = (0 until 90).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val a = alphabets(lang).toCharArray
      val n = rnd.nextInt(30)
      (i.toLong, lang, (0 until n).map(_ => a(rnd.nextInt(a.length))).mkString)
    }.toDF("doc_id", "lang", "text")
    val fit = col("doc_id") % 2 === 0
    val fast = TextAnalysis.trigramLangId(docs, "doc_id", "text", "lang", fit)
      .orderBy("doc_id").as[(Long, String, String, Double)].collect()
    val slow = TextAnalysis.trigramLangId(docs, "doc_id", "text", "lang", fit,
        broadcastMaxTrigrams = 0L)
      .orderBy("doc_id").as[(Long, String, String, Double)].collect()
    assert(fast === slow)
    assert(fast.nonEmpty)
    // empty fit slice: BOTH lanes must return zero rows (the fused lane
    // once emitted null-prediction rows here)
    assert(TextAnalysis.trigramLangId(docs, "doc_id", "text", "lang",
      lit(false)).count() === 0L)
  }

  test("RepetitionCounts / GopherCounts == declarative forms on random noisy text") {
    val pieces = Vector("the", "of", "and", "that", "word", "#", "...", "x",
      "", "..", "- a", "*", "日本", "a#b", "W9", "\n", "\n- bullet", "\nend...")
    val docs = (0 until 150).map { i =>
      val n = rnd.nextInt(25)
      (i.toLong, (0 until n).map(_ => pieces(rnd.nextInt(pieces.length))).mkString(" "))
    }.toDF("doc_id", "text")
    // repetition: declarative reference rebuilt from the pre-kernel form
    val tkRef = split(col("text"), " ")
    val gramsRef = TextAnalysis.ngrams(tkRef, 2)
    val bestRef = aggregate(array_sort(gramsRef),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc("prev"), acc("run") + 1).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      }, acc => acc("best"))
    val repRef = docs.select(col("doc_id"),
      size(tkRef).cast("long").as("n_tokens"),
      round(lit(1.0) - size(array_distinct(tkRef)).cast("double") / size(tkRef), 6)
        .as("dup_word_frac"),
      round(when(size(gramsRef) > 0, bestRef.cast("double") / size(gramsRef))
        .otherwise(0.0), 6).as("top_ngram_frac"))
      .orderBy("doc_id").collect()
    val repGot = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "dup_word_frac", "top_ngram_frac")
      .orderBy("doc_id").collect()
    assert(repGot === repRef)
    // gopher: declarative reference rebuilt from the pre-kernel form
    val lines = split(col("text"), "\n", -1)
    val gq = TextAnalysis.gopherQualityFlags(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val gqRef = docs.select(col("doc_id"),
      size(tkRef).cast("long").as("n_words"),
      round(aggregate(tkRef, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(tkRef), 6).as("mean_word_len"),
      round(size(filter(tkRef, t => t.rlike("[A-Za-z]"))).cast("double") /
        size(tkRef), 6).as("alpha_word_frac"),
      round(((size(split(col("text"), "#", -1)) - 1) +
        (size(split(col("text"), "\\.\\.\\.", -1)) - 1)).cast("double") /
        size(tkRef), 6).as("symbol_word_ratio"),
      round(size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ")))
        .cast("double") / size(lines), 6).as("bullet_line_frac"),
      round(size(filter(lines, l => l.endsWith("..."))).cast("double") /
        size(lines), 6).as("ellipsis_line_frac"),
      TextAnalysis.GopherStopwords
        .map(w => size(filter(tkRef, t => t === w)).cast("long")).reduce(_ + _)
        .as("n_stopwords"))
      .orderBy("doc_id").collect()
    for ((g, r) <- gq.zip(gqRef); f <- Seq("n_words", "mean_word_len",
      "alpha_word_frac", "symbol_word_ratio", "bullet_line_frac",
      "ellipsis_line_frac", "n_stopwords"))
      assert(g.getAs[Any](f) === r.getAs[Any](f),
        s"doc ${g.getAs[Long]("doc_id")} field $f")
  }

  test("BootstrapMeans == the explode-form replica means on random groups") {
    val rows = (0 until 400).map { i =>
      (Seq("g1", "g2", "g3")(rnd.nextInt(3)), rnd.nextDouble() * 100,
        s"key$i")
    }.toDF("g", "x", "k")
    val replicas = 23
    val viaKernel = rows
      .select(col("g"), col("x").as("_x"), Stats.mixHash(col("k")).as("_h"))
      .groupBy("g")
      .agg(graft.functions.GraftFunctions
        .bootstrap_means(col("_x"), col("_h"), replicas).as("_bms"))
      .select(col("g"), posexplode(col("_bms")).as(Seq("_b", "_bm")))
    // the old declarative derivation, reproduced verbatim
    val p = graft.functions.RollingHash.Mod
    val viaExplode = rows
      .select(col("g"), col("x").as("_x"), Stats.mixHash(col("k")).as("_h"))
      .withColumn("_b", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("_v", col("_h") + col("_b"))
      .withColumn("_u", (((col("_v") * col("_v")) % p) * Stats.MixA + Stats.MixB) % p)
      .withColumn("_u", col("_u").cast("double") / lit(p.toDouble))
      .withColumn("_w", when(col("_u") < Stats.PoissonCdf1(0), 0.0)
        .when(col("_u") < Stats.PoissonCdf1(1), 1.0)
        .when(col("_u") < Stats.PoissonCdf1(2), 2.0)
        .when(col("_u") < Stats.PoissonCdf1(3), 3.0)
        .otherwise(4.0))
      .groupBy("g", "_b")
      .agg(when(sum(col("_w")) === 0.0, lit(null))
        .otherwise(sum(col("_w") * col("_x")) / sum(col("_w"))).as("_bm"))
    val a = viaKernel.orderBy("g", "_b")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    val b = viaExplode.orderBy("g", "_b")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(a.length === b.length && a.length === 3 * replicas)
    for (((g1, b1, m1), (g2, b2, m2)) <- a.zip(b)) {
      assert(g1 === g2 && b1 === b2)
      assert((m1.isNaN && m2.isNaN) || math.abs(m1 - m2) < 1e-9, s"($g1, $b1)")
    }
  }
}

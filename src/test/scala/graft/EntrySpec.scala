package graft

/** Driver-contract smoke: entry() non-empty, every query runs at sf0.001,
  * every oracle key has a query (and vice versa where SQL-expressible). */
class EntrySpec extends SparkSuite {

  test("entry() returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys match queries keys (sketch queries are rows-only)") {
    // Sketch outputs (HLL++ ndv) are engine-specific, so these queries
    // intentionally ship without a SQL oracle — the driver records the
    // weaker rows-only check for them.
    val rowsOnly = Set("q59_sketch_profile", "q70_winsorize_sketch",
      // the Lloyd-fit family stays rows-only on REAL data; each tier now
      // also carries an exact point-mass hash gate: q221 (flat PQ), q222
      // (OPQ), q223 (IVF-PQ), q224 (persisted index serve)
      "q71_robust_sketch", "q93_pq_ann", "q100_ivfpq_ann",
      "q106_ivfpq_prefit", "q136_bpe_merges", "q191_pq_bigprobe",
      // DEFLATE output bytes are zlib-version-dependent: deterministic
      // within the engine, not portable to a DuckDB oracle
      "q173_compression_gate",
      // eigendecomposition (Jacobi) has no SQL form; DecompSpec pins the
      // decomposition invariants and determinism, q183 pins the shared
      // covariance fit against covar_pop
      "q184_pca_spectrum", "q185_mahalanobis", "q186_whiten_gram",
      "q187_linear_probe", "q188_probe_cv",
      // unigram-LM tokenizer: the EM fit is iterative (like q136) and
      // Viterbi/FFBS are DPs with no SQL form; all pinned against
      // brute-force references in TextAnalysisSpec (q198/q202 are the
      // hash-matched degenerate-lattice twins)
      "q196_unigram_lm", "q197_unigram_encode", "q201_unigram_sample",
      "q208_unigram_sample_occ",
      // OPQ = Jacobi rotation + the Lloyd-fit PQ family (same rows-only
      // category as q93/q100); contracts pinned in DedupSimilaritySpec,
      // and q222_opq_ann_twin exact-gates the full rotation+PQ+ADC path
      // on a point-mass fixture (q221's trick: ksub = |corpus| makes PQ
      // lossless under ANY orthogonal R, and cosine invariance forces
      // the ordering)
      "q199_opq_ann",
      // the round-15 fit ladder composed (balanced centroids + refined
      // OPQ + sample-fit IVF-PQ + salted join) — Lloyd family, rows-only.
      // Every delta of q207/q191 over the q221-q225 exact-gated tiers is
      // now gated or argued: the salted distributed corpus-vs-corpus
      // join has its own driver hash gate (q225, forced salting at
      // codesPerSalt=2); balanced splitting + Procrustes refinement's
      // fixpoint on a point-mass fixture is not provably stable across
      // SVD sign conventions — the q173-ceiling class of impossibility,
      // so q207 itself stays rows-only permanently
      "q207_balanced_opq_ann")
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet -- rowsOnly)
  }

  // q218's promotion note (VERDICT-r17 item 6): the FLOOR side of the
  // compression gate is provably twin-able — period-44 repetition
  // compresses ~20x under any zlib level that emits back-references —
  // and q218 hash-gates the full keep bracket on a three-class fixture.
  // The CEILING side can be measured but NOT proven across zlib
  // versions: the 0.75 ceiling sits at base64's 6-bits/char entropy
  // rate, and the densest printable-text class possible (94-symbol
  // alphabet, 6.55 bits/char) lands at ~0.85 only because zlib's
  // Huffman coder is within a few percent of entropy — a conforming
  // DEFLATE may legally emit stored blocks (ratio ~1.0) or a future
  // zlib-ng may shave the margin; there is no printable fixture whose
  // above-ceiling verdict follows from the DEFLATE spec alone. The
  // class brackets below are therefore pinned as measurements with
  // >= 1.45x margins on every boundary, and q173 (raw byte counts)
  // stays rows-only permanently.
  test("q218 fixture class brackets: template << floor < prose < ceiling << noise") {
    import org.apache.spark.sql.functions._
    val seeded = meta.Tables.documents(spark, sf).where(col("n_chars") >= 300)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          expr("repeat('all work and no play makes jack a dull boy ', 30)"))
        .when(col("doc_id") % 3 === 1,
          expr("array_join(transform(sequence(1, 1200), " +
            "j -> chr(33 + pmod(hash(doc_id, j), 94))), '')"))
        .otherwise(col("text")).as("text"))
    val b = operators.TextAnalysis.compressionQuality(seeded, "doc_id", "text")
      .groupBy(pmod(col("doc_id"), lit(3)).as("cls"))
      .agg(min("deflate_ratio").as("mn"), max("deflate_ratio").as("mx"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(b.keySet === Set(0L, 1L, 2L), s"all three classes present: $b")
    b.foreach { case (c, (_, _, n)) => assert(n > 10, s"class $c too thin: $n") }
    // template: 1.45x under the 0.1 floor even at its max
    assert(b(0L)._2 < 0.1 / 1.45, s"template class must sit FAR below the floor: ${b(0L)}")
    // prose: 1.45x inside the bracket on both sides
    assert(b(2L)._1 > 0.1 * 1.45 && b(2L)._2 < 0.75 / 1.45,
      s"real-text class must sit WELL inside the bracket: ${b(2L)}")
    // noise: 1.1x above the ceiling (entropy caps this margin — see note)
    assert(b(1L)._1 > 0.75 * 1.1, s"noise class must clear the ceiling: ${b(1L)}")
  }

  test("every query executes and is non-empty at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    // q24 (LSH pairs) may legitimately be empty on a tiny corpus; everything
    // else must produce rows.
    assert(empties.filterNot(_ == "q24_minhash_lsh").isEmpty, s"empty: $empties")
  }
}

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
      // category as q93/q100); contracts pinned in DedupSimilaritySpec
      "q199_opq_ann",
      // the round-15 fit ladder composed (balanced centroids + refined
      // OPQ + sample-fit IVF-PQ + salted join) — Lloyd family, rows-only
      "q207_balanced_opq_ann")
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet -- rowsOnly)
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

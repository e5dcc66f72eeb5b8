package graft.operators

import graft.functions.GraftFunctions.cosine_similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension).
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) probe set
  *    against the corpus; the corpus is scanned once, never shuffled. At
  *    100 TB this is the correct plan when |probes| is small: cost is one
  *    pass, embarrassingly parallel, per-partition top-k before the final
  *    driver merge (window over probe_id after an AQE-coalesced shuffle of
  *    only |probes|·k candidate rows... in practice the window shuffles
  *    per-probe groups, each tiny).
  *  - [[ivfTopK]] — the scale path: coarse-quantize the corpus to its
  *    nearest centroid (broadcast centroids, one pass), then search only the
  *    probe's cell — an equi-join on cell id, pruning the candidate set by
  *    the number of cells.
  *
  * Distances run through [[graft.functions.CosineSimilarity]] — a fused
  * one-pass native kernel inside whole-stage codegen.
  */
object Similarity {

  /** Exact top-k neighbors for each probe row. Excludes self-matches on id. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cand_vec"))
    val scored = c.crossJoin(broadcast(p))
      .where(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cosine", cosine_similarity(col("probe_vec"), col("cand_vec")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Assign each vector to the max-cosine centroid (broadcast, one pass). */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = centroids.select(col(idCol).as("cell_id"), col(vecCol).as("cent_vec"))
    val scored = corpus.crossJoin(broadcast(cents))
      .withColumn("cent_cos", cosine_similarity(col(vecCol), col("cent_vec")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cent_cos").desc, col("cell_id"))
    scored.withColumn("_r", row_number().over(w)).where(col("_r") === 1)
      .drop("_r", "cent_vec", "cent_cos")
  }

  /** IVF-style ANN: quantize corpus and probes to cells, search only within
    * the probe's cell. Returns (probe_id, rank, neighbor_id, cosine). */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, probes: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = assignCells(corpus, centroids, idCol, vecCol)
    val p = assignCells(probes, centroids, idCol, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"), col("cell_id"))
    val c = cells.select(col(idCol).as("neighbor_id"), col(vecCol).as("cand_vec"), col("cell_id"))
    val scored = c.join(broadcast(p), "cell_id")
      .where(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cosine", cosine_similarity(col("probe_vec"), col("cand_vec")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding near-duplicate pairs above a cosine threshold, within
    * id-window `maxGap` (bounded candidate generation for the oracle;
    * unbounded pairing at scale goes through [[ivfTopK]] cells instead).
    *
    * The range condition is rewritten as a bucketed EQUI-join: a bare
    * `id_b BETWEEN id_a+1 AND id_a+gap` join plans as a broadcast
    * nested-loop that evaluates the predicate on all |n|^2 pairs; bucketing
    * ids by `gap` and joining each left bucket to itself and its successor
    * makes candidates O(n * gap) and the join a plain shuffle-hash join. */
  def nearDupPairs(corpus: DataFrame, threshold: Double, maxGap: Long,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      floor(col(idCol) / maxGap).as("bk"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      explode(array(floor(col(idCol) / maxGap), floor(col(idCol) / maxGap) - 1)).as("bk"))
    a.join(b, "bk")
      .where(col("id_b") > col("id_a") && col("id_b") <= col("id_a") + maxGap)
      .withColumn("cosine", cosine_similarity(col("vec_a"), col("vec_b")))
      .where(col("cosine") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}

package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for LLM-data pipelines (north-star extension):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Design notes for 100 TB:
  *  - Exact dedup is a hash-partition-by-key window (no global sort).
  *  - MinHash/SimHash signatures are per-row higher-order-function
  *    expressions (codegen'd, no UDF); LSH candidate generation is an
  *    explode-on-band + self-equi-join on (band, hash) — the join key is the
  *    band bucket, so the shuffle carries only (doc_id, band) pairs, never
  *    document text.
  *  - The base hash is a portable polynomial fold (same fold as
  *    [[graft.functions.RollingHash]]) rather than murmur3, so every
  *    signature is reproducible in the DuckDB oracle bit-for-bit.
  */
object Dedup {

  final val Mod = 1000000007L
  final val MinhashK = 16
  final val LshBands = 4 // 4 bands x 4 rows

  /** Spark-SQL fragment: portable string hash of `s` (poly-31 fold). */
  def hashFrag(s: String): String =
    s"aggregate(split($s, ''), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + ascii(c)) % $Mod)"

  /** Spark-SQL fragment: distinct hashed word 3-shingles of text column `t`. */
  def shingleHashesFrag(t: String): String = {
    val toks = s"split($t, ' ')"
    val shingles =
      s"CASE WHEN size($toks) < 3 THEN array($t) " +
        s"ELSE transform(sequence(0, size($toks) - 3), " +
        s"i -> concat_ws(' ', $toks[i], $toks[i+1], $toks[i+2])) END"
    s"array_distinct(transform($shingles, s -> ${hashFrag("s")}))"
  }

  /** Spark-SQL fragment: k=16 MinHash signature array over shingle hashes
    * `hs` — permutation i is the affine map h -> ((2i+3)h + 7i+1) mod p. */
  def minhashFrag(hs: String): String =
    s"transform(sequence(0, ${MinhashK - 1}), " +
      s"i -> array_min(transform($hs, h -> ((2*i+3)*h + (7*i+1)) % $Mod)))"

  /** Spark-SQL fragment: 16-bit SimHash over (non-distinct) token hashes. */
  def simhashFrag(t: String): String = {
    val tokHashes = s"transform(split($t, ' '), s -> ${hashFrag("s")})"
    s"aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, b) -> acc + " +
      s"IF(aggregate($tokHashes, CAST(0 AS BIGINT), " +
      s"(a2, h) -> a2 + IF((h div CAST(pow(2, b) AS BIGINT)) % 2 = 1, 1, -1)) >= 0, " +
      s"CAST(pow(2, b) AS BIGINT), CAST(0 AS BIGINT)))"
  }

  /** Exact dedup keeping the first row per key under `orderCols` — the
    * deterministic form of `dropDuplicates` (which keeps an arbitrary row).
    * Hash-partitioned by key: scales without a global sort. */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** Exact-duplicate cluster stats by an arbitrary fingerprint column. */
  def duplicateStats(df: DataFrame, fp: Column, out: String = "fingerprint"): DataFrame =
    df.groupBy(fp.as(out)).agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > 1)

  /** MinHash signatures: (idCol, sig array<long>). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), expr(minhashFrag(shingleHashesFrag(textCol))).as("sig"))

  /** LSH candidate pairs: docs sharing at least one signature band, with the
    * estimated Jaccard = fraction of equal signature positions. Left id <
    * right id; each pair reported once. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rows = MinhashK / LshBands
    val sigs = minhashSignatures(df, idCol, textCol)
    val banded = sigs.select(
      col(idCol), col("sig"),
      explode(expr(
        s"transform(sequence(0, ${LshBands - 1}), " +
          s"b -> struct(b AS band, concat_ws('-', slice(sig, b * $rows + 1, $rows)) AS bkey))"))
        .as("bb"))
      .select(col(idCol), col("sig"), col("bb.band"), col("bb.bkey"))
    val l = banded.select(col(idCol).as("id_a"), col("sig").as("sig_a"), col("band"), col("bkey"))
    val r = banded.select(col(idCol).as("id_b"), col("sig").as("sig_b"), col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr(s"aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (a, v) -> a + v) / CAST($MinhashK AS DOUBLE)")
          .as("est_jaccard"))
      .distinct()
  }

  /** True n-gram (word 3-shingle) Jaccard for candidate pairs — the
    * verification stage after LSH banding. `pairs` must expose text for both
    * sides as `text_a`/`text_b`. */
  def jaccard(textA: String, textB: String): Column = {
    val (ha, hb) = (shingleHashesFrag(textA), shingleHashesFrag(textB))
    expr(s"size(array_intersect($ha, $hb)) / CAST(size(array_union($ha, $hb)) AS DOUBLE)")
  }

  /** SimHash values per document. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), expr(simhashFrag(textCol)).as("simhash"))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}

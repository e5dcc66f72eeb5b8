package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Lake-maintenance compaction of a parquet directory — the WRITE-side
  * counterpart of [[SplitLayout]]'s read-side normalization. Streaming
  * ingest (micro-batches, per-wave dedup survivors, per-shard exports)
  * accumulates directories of many small files; every downstream scan
  * then pays a per-file open/footer cost and the NameNode-or-listing
  * layer pays the metadata. Compaction rewrites the directory into
  * ~`targetBytes` files once, so every subsequent scan reads a sane
  * layout — the standard nightly maintenance pass every production lake
  * runs (Delta OPTIMIZE / Iceberg rewrite_data_files do exactly this).
  *
  * Semantics: same rows, same schema, multiset-identical content; row
  * ORDER is not preserved (compaction is a layout operation — order-
  * dependent consumers must sort, which they must do on any multi-file
  * layout anyway). The rewrite uses `coalesce` — a narrow, shuffle-free
  * merge of input splits into `ceil(bytes / targetBytes)` tasks — so
  * the cost is one read+write of the data with NO exchange. For a
  * directory with pathological per-file skew a caller can pass
  * `shuffle = true` to use `repartition` instead (one round-robin
  * exchange, perfectly even output files).
  *
  * The target directory must not exist (compaction is a maintenance
  * step, not a sink — refuse to clobber); write then atomically swap it
  * over the source yourself, or read from `outDir` going forward.
  */
object Compaction {

  /** What the pass did: file/byte counts before and after. */
  final case class Stats(filesBefore: Int, bytesBefore: Long,
                         filesAfter: Int, bytesAfter: Long)

  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              shuffle: Boolean = false): Stats = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val conf = spark.sessionState.newHadoopConf()
    def dataFiles(dir: String): Seq[(String, Long)] = {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      require(fs.exists(p), s"Compaction: input $dir does not exist")
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
          && !s.getPath.getName.startsWith("."))
        .map(s => (s.getPath.toString, s.getLen))
    }
    val before = dataFiles(inDir)
    require(before.nonEmpty, s"Compaction: no data files under $inDir")
    val outPath = new Path(outDir)
    require(!outPath.getFileSystem(conf).exists(outPath),
      s"Compaction: refusing to clobber existing $outDir — compact to a " +
        "fresh directory and swap it in")
    val totalBytes = before.map(_._2).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val sized = if (shuffle) df.repartition(n) else df.coalesce(n)
    sized.write.parquet(outDir)
    val after = dataFiles(outDir)
    Stats(before.size, totalBytes, after.size, after.map(_._2).sum)
  }
}

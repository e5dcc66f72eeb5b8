package graft.tools

import graft.meta.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch profiler for operator stages (dev aid, not part of the contract). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[perf] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("docs count")(docs.count())
    val hs = Dedup.shingleHashTable(docs, "doc_id", "text")
    time("shingle hash table")(hs.count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    time("minhash sigs")(sigs.count())
    time("lsh pairs full")(
      Dedup.lshCandidatePairs(docs, "doc_id", "text").count())
    time("lsh pairs again")(
      Dedup.lshCandidatePairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}

package graft.tools

import graft.operators.Similarity
import graft.meta.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the q191 corpus-vs-corpus IVF-PQ shape (dev aid). */
object DebugAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > 300) println(f"[stage] id=${si.stageId}%-4d tasks=${si.numTasks}%-4d " +
          f"${ms / 1e3}%.2f s  ${si.name.take(90)}")
      }
    })
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[perf] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cache = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_ivfpq_idx_${Integer.toHexString(sfDir.hashCode)}").getPath
    val idx = time("prefit load")(
      if (new java.io.File(s"$cache/encoded/_SUCCESS").exists())
        Similarity.loadIvfPqIndex(spark, cache)
      else
        Similarity.buildIvfPqIndex(Tables.embeddings(spark, sfDir), cache,
          nCells = 8, m = 8, ksub = 16, iterations = 3))
    val probes = Tables.embeddings(spark, sfDir)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("q191 full (distributed probes)")(noop(
        Similarity.ivfPqTopK(idx.encoded, idx.centroids, idx.codebooks,
          probes, 3, nprobe = 2, broadcastProbes = false).orderBy("probe_id", "rank")))
      time("q191 no orderBy")(noop(
        Similarity.ivfPqTopK(idx.encoded, idx.centroids, idx.codebooks,
          probes, 3, nprobe = 2, broadcastProbes = false)))
      time("q191 broadcast probes")(noop(
        Similarity.ivfPqTopK(idx.encoded, idx.centroids, idx.codebooks,
          probes, 3, nprobe = 2, broadcastProbes = true)))
    }
    Similarity.ivfPqTopK(idx.encoded, idx.centroids, idx.codebooks,
      probes, 3, nprobe = 2, broadcastProbes = false).explain("formatted")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-query profiler: DebugQ <queryName> [sfDir] — runs the query
  * twice with a stage listener and prints the executed plan (dev aid). */
object DebugQ {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("MPB", "134217728"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("OCB", "4194304"))
      .config("spark.sql.windowExec.buffer.in.memory.threshold",
        sys.env.getOrElse("WBT", "4096"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageMin = sys.env.getOrElse("STAGE_MIN_MS", "200").toInt
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > stageMin) println(f"[stage] id=${si.stageId}%-4d tasks=${si.numTasks}%-4d " +
          f"${ms / 1e3}%.2f s  ${si.name.take(90)}")
      }
    })
    // job-level wall times (JOB_MIN_MS, default off): driver-loop operators
    // (CC rounds, Lloyd fits) hide their cost in many small jobs no single
    // stage shows
    sys.env.get("JOB_MIN_MS").map(_.toInt).foreach { jobMin =>
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, (e.time,
            Option(e.properties.getProperty("callSite.short")).getOrElse("?")))
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, site) = starts.getOrDefault(e.jobId, (e.time, "?"))
          val ms = e.time - t0
          if (ms >= jobMin) println(f"[job] ${e.jobId}%4d ${ms}%5d ms  $site")
        }
      })
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (qn <- q.split(",")) {
      for (round <- 1 to 2) {
        val t0 = System.nanoTime()
        noop(graft.SparkEntry.queries(qn)(spark, sfDir))
        println(f"[perf] r$round $qn ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // reap detached (localCheckpoint) blocks between runs — without
        // this, multi-query sweeps accumulate pinned storage and inflate
        // every later query (the same in-suite-only inflation Bench's
        // reaper exists for)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
    }
    if (args.length > 2 && args(2) == "explain")
      graft.SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}

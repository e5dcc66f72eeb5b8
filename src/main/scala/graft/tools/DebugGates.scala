package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch profiler for the streaming driver gates (dev aid, not part of
  * the contract): runs each gate query end-to-end under a
  * StreamingQueryListener and prints the per-micro-batch duration
  * breakdown (triggerExecution / addBatch / walCommit / queryPlanning /
  * commitOffsets / stateStore commit), so "fixed per-trigger cost" stops
  * being a guess. */
object DebugGates {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "24000")
      .config("spark.sql.files.openCostInBytes", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-level wall times: catches the fixture writes / readback jobs the
    // streaming listener can't see
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(e.jobId, (e.time,
          Option(e.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, site) = jobStarts.getOrDefault(e.jobId, (e.time, "?"))
        val ms = e.time - t0
        if (ms >= 40) jobLines.add(f"  job ${e.jobId}%4d ${ms}%5d ms  $site")
      }
    })
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        def g(k: String): Long = Option(d.get(k)).map(_.toLong).getOrElse(-1L)
        progress.add(
          f"  batch ${p.batchId}%2d rows=${p.numInputRows}%5d " +
            f"trigger=${g("triggerExecution")}%5d addBatch=${g("addBatch")}%5d " +
            f"latestOffset=${g("latestOffset")}%4d walCommit=${g("walCommit")}%4d " +
            f"plan=${g("queryPlanning")}%4d commitOffsets=${g("commitOffsets")}%4d")
      }
    })

    val gates = args.toSeq match {
      case Nil => Seq(
        "q205_image_scrub_stream", "q206_text_scrub_stream",
        "q210_fuzzy_scrub_stream", "q215_semantic_scrub_stream",
        "q217_sessionize_stream", "q220_semantic_scrub_stream_banded",
        "q228_semantic_scrub_stream_centered")
      case xs => xs
    }
    val passes = sys.env.getOrElse("GRAFT_GATE_PASSES", "2").toInt
    // warm the session once (parquet reader, codegen)
    graft.meta.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    for (pass <- 1 to passes; name <- gates) {
      progress.clear(); jobLines.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[gates] pass $pass $name%-38s total=$total%6.2f s")
      progress.forEach(println(_))
      if (pass == passes) jobLines.forEach(println(_))
      spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = true))
    }
    spark.stop()
  }
}

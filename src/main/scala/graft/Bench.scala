package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink rather than `count()` —
  * count() lets Catalyst prune all projections (a pure projection query
  * would "run" as a parquet-footer row count), noop materializes every
  * output column through the full plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths so the first measured query
    // doesn't absorb session startup.
    graft.meta.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    // Two passes, report per-query MIN: pass 1 absorbs codegen/JIT compilation
    // of each plan shape, and min filters out contention spikes on a shared
    // box (a single spike inflated one query 20x in round 1's driver run).
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    require(passes >= 1, s"SPARK_GRAFT_BENCH_PASSES must be >= 1, got $passes")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Time budget: extra passes only run while total wall time stays under
    // SPARK_GRAFT_BENCH_BUDGET seconds — insurance against a driver-side
    // timeout killing the run before the JSON line prints.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "240").toDouble
    val benchStart = System.nanoTime()
    // A failed attempt must not contribute its (fast) time-to-failure to the
    // min — record it as +inf; a query that failed in EVERY pass reports -1
    // so the driver sees an impossible value, not a bogus small one.
    val timed = (1 to passes).flatMap { pass =>
      if (pass > 1 && (System.nanoTime() - benchStart) / 1e9 > budgetSec) None
      else Some(names.map { name =>
        val t0 = System.nanoTime()
        val ok =
          try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.PositiveInfinity)
      }.toMap)
    }
    val results = names.map { n =>
      val best = timed.map(_(n)).min
      n -> (if (best.isInfinity) -1.0 else best)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1 failure sentinels must not shrink the headline total.
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

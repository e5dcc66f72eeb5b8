package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scan every query's physical plan for scale red flags. */
object PlanLint {
  // SinglePartition exchanges are the global-sort/window smell: every row
  // funnels through one task. (The deterministic final ORDER BY each query
  // ends in is range-partitioned, not single-partition, so it never trips
  // this.)
  val RedFlags = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
    "Exchange SinglePartition")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
        val hits = RedFlags.filter(plan.contains)
        val exchanges = "Exchange".r.findAllIn(plan).length
        val scans = "Scan parquet".r.findAllIn(plan).length
        val flag = if (hits.nonEmpty) s"  <<< ${hits.mkString(",")}" else ""
        println(f"[lint] $name%-22s scans=$scans%-3d exchanges=$exchanges%-3d$flag")
      } catch { case e: Throwable => println(s"[lint] $name ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}

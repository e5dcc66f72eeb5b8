package graft.tools

import graft.meta.Schemas
import graft.operators.{Clean, Encode}
import org.apache.spark.sql.functions._
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
      println(f"[perf] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val base = graft.SparkEntry.osv5mFrame(spark, sfDir)
    val chunked = base.withColumn("fill_chunk", floor(col("id") / lit(100000L)))
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("scan only")(noop(base))
      time("clean, chunk-partitioned fill")(noop(
        Clean.osv5mClean(chunked, "id", Seq("fill_chunk"))))
      time("clean, UNpartitioned fill")(noop(Clean.osv5mClean(base, "id")))
      val cleaned = Clean.osv5mClean(chunked, "id", Seq("fill_chunk"))
      time("clean + labelEncodeAll")(noop(
        Encode.labelEncodeAll(cleaned, Schemas.osv5mCategoricals)))
      val encoded = Encode.labelEncodeAll(cleaned, Schemas.osv5mCategoricals)
      time("clean + encode + standardScale")(noop(
        Encode.standardScale(encoded, Schemas.osv5mScaleCols)))
      time("full q72")(noop(
        graft.SparkEntry.queries("q72_osv5m_clean")(spark, sfDir)))
      time("q72 with detached clean") {
        val det = graft.operators.Relational.detach(
          Clean.osv5mClean(chunked, "id", Seq("fill_chunk")))
        val enc = Encode.labelEncodeAll(det, Schemas.osv5mCategoricals)
        noop(Encode.standardScale(enc, Schemas.osv5mScaleCols)
          .orderBy("id"))
      }
      time("full q78")(noop(
        graft.SparkEntry.queries("q78_osv5m_partfill")(spark, sfDir)))
    }
    spark.stop()
  }
}

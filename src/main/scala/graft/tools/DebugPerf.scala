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
      val pre = {
        import org.apache.spark.sql.types.StringType
        val c1 = Clean.dropColumns(chunked, "thumb_original_url")
        val c2 = Clean.castColumns(c1, Map("id" -> StringType, "creator_id" -> StringType))
        val c3 = Clean.trimColumns(c2, Schemas.osv5mCategoricals)
        Clean.dateParts(Clean.epochMillisToTimestamp(c3, "captured_at", "captured_ts"), "captured_ts")
      }
      time("pre-fill chain only")(noop(pre))
      time("fill only (on pre)")(noop(
        Clean.fillForwardBackward(pre, Schemas.osv5mFfillCols, Seq("id"), Seq("fill_chunk"))))
      val narrowPre = pre.select((Seq("fill_chunk", "id") ++ Schemas.osv5mFfillCols).map(col): _*)
      time("fill narrow (inline path)")(noop(
        Clean.fillForwardBackward(narrowPre, Schemas.osv5mFfillCols, Seq("id"), Seq("fill_chunk"))))
      time("one asc window pass only") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("fill_chunk")).orderBy(col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        noop(narrowPre.select(col("id") +: Schemas.osv5mFfillCols.map(c =>
          last(col(c), ignoreNulls = true).over(w).as(c)): _*))
      }
      time("clean, chunk-partitioned fill")(noop(
        Clean.osv5mClean(chunked, "id", Seq("fill_chunk"))))
      time("full q72")(noop(
        graft.SparkEntry.queries("q72_osv5m_clean")(spark, sfDir)))
      val det = time("detach clean (materialize)")(
        graft.operators.Relational.detach(
          Clean.osv5mClean(chunked, "id", Seq("fill_chunk"))))
      val enc = time("labelEncodeAll on detached")(
        { val e = Encode.labelEncodeAll(det, Schemas.osv5mCategoricals); noop(e); e })
      time("standardScale on encoded")(noop(
        Encode.standardScale(enc, Schemas.osv5mScaleCols)))
      time("scale + orderBy on encoded")(noop(
        Encode.standardScale(enc, Schemas.osv5mScaleCols).orderBy("id")))
      graft.operators.Relational.release(det)
      time("full q78")(noop(
        graft.SparkEntry.queries("q78_osv5m_partfill")(spark, sfDir)))
    }
    spark.stop()
  }
}

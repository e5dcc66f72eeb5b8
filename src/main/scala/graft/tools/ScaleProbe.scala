package graft.tools

import graft.meta.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probes: decimal-vs-integer-cents aggregation cost, linear-scaling
  * behavior on a 16x blowup of lineitem, fill partitioning, skew handling,
  * the bucketed-layout write/join cost split, and the funnel's
  * stages-cost-compute-not-shuffles claim (dev aid; measured numbers
  * land in BASELINE.md). Args select sections: `fill`, `skew`, `bucket`,
  * `funnel`, `pq`, `bigprobe`, `zipfcell`, `rawdetach`, `zorderskew`, `spanscrub`, `fuzzydedup`, `cleanscrub`, `packbudget`, `simhashband`,
  * `wordlm`, `bloomdedup`, `winnow`, `chatshard`, `warcsrc`, `jsonlsrc`,
  * `gram`, `zorder`, `unigram`, `semplanes`, `streamscale`,
  * `streamcentered`, `scrubappend`, `streamttl`, `legacy` (no args = all). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sections: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
    noop(li.groupBy("l_returnflag").count()) // warmup

    // q72-vs-q78: the SAME osv5m cleaning chain with the ffill/bfill
    // windows unpartitioned (reference chunk-order parity, one core does
    // the whole sort+scan) vs partitioned by the trimmed country key (one
    // shuffle, per-partition sorts). The number this produces is the
    // measured degeneration the partitioned fill avoids.
    if (sections("fill")) {
      import graft.operators.Clean
      val osv = graft.SparkEntry.osv5mFrame(spark, "/root/testdata/sf0.1")
      val bigPath = "/tmp/graft_big_osv5m"
      time("write 16x osv5m (~2.4M rows)")(
        (0 until 16).map(i => osv.withColumn("id", col("id") + lit(i.toLong * 100000000L)))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val osvBig = spark.read.parquet(bigPath)
      time("osv5m clean  1x unpartitioned fill")(noop(Clean.osv5mClean(osv, "id")))
      time("osv5m clean  1x partitioned fill")(noop(
        Clean.osv5mClean(osv, "id", fillPartitionCols = Seq("country"))))
      time("osv5m clean 16x unpartitioned fill")(noop(Clean.osv5mClean(osvBig, "id")))
      time("osv5m clean 16x partitioned fill")(noop(
        Clean.osv5mClean(osvBig, "id", fillPartitionCols = Seq("country"))))
    }

    // Hot-key join: AQE's runtime skew-split on the plain declarative join
    // vs the explicit saltedJoin lever, on a 95%-one-key fixture
    // (PlanPostureSpec proves the plan shapes; this measures them).
    if (sections("skew")) {
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle joins
        val bigSkew = spark.range(0, 4000000).select(
          when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("payload_payload_payload_payload_"), col("id")).as("payload"))
        val dimSkew = spark.range(0, 4000000, 20)
          .select(col("id").as("k"), (col("id") * 2).as("v"))
        // min-of-2: pass 1 absorbs codegen, and the unmitigated straggler's
        // wall time swings with box contention (same rationale as Bench)
        def time2(name: String)(f: => Unit): Unit = {
          val ts = (1 to 2).map { _ =>
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
        }
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        time2("skewed join: no mitigation")(noop(bigSkew.join(dimSkew, "k")))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        time2("skewed join: AQE skew-split")(noop(bigSkew.join(dimSkew, "k")))
        time2("skewed join: saltedJoin(16)")(noop(
          graft.operators.Relational.saltedJoin(bigSkew, dimSkew, "k", 16)))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }

    // Bucketed layout: separate the write-once investment from the
    // recurring join saving (q81's bench number folds both together).
    if (sections("bucket")) {
      import graft.sources.BucketedLayout
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val ordKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(ordKey, "true")
        val or = Tables.orders(spark, "/root/testdata/sf0.1")
        val base = "/tmp/graft_probe_bucket"
        time("bucketed write-once (both sides)") {
          BucketedLayout.writeBucketed(li.select("l_orderkey", "l_extendedprice"),
            "graft_probe_li", s"$base/li", Seq("l_orderkey"), 8, Seq("l_orderkey"))
          BucketedLayout.writeBucketed(or.select("o_orderkey", "o_orderpriority"),
            "graft_probe_or", s"$base/or", Seq("o_orderkey"), 8, Seq("o_orderkey"))
        }
        def joinAgg(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
          l.join(r, col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_orderpriority").count()
        time("bucketed join (recurring, no Exchange/Sort)")(noop(joinAgg(
          BucketedLayout.readBucketed(spark, "graft_probe_li"),
          BucketedLayout.readBucketed(spark, "graft_probe_or"))))
        time("plain shuffle join (same files)")(noop(joinAgg(
          spark.read.parquet(s"$base/li"), spark.read.parquet(s"$base/or"))))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.unset(ordKey)
        spark.sql("DROP TABLE IF EXISTS graft_probe_li")
        spark.sql("DROP TABLE IF EXISTS graft_probe_or")
      }
    }

    // Funnel: every stage is one more Window over the SAME user exchange
    // (PlanPostureSpec pins shuffleCount == 1); this measures the claim's
    // consequence — doubling the stage count costs window compute, not a
    // second shuffle, so wall time grows far slower than stage count.
    if (sections("funnel")) {
      import graft.operators.Behavior
      val ev = spark.range(0, 8000000).select(
        (col("id") % 400000).as("user_id"),
        timestamp_seconds(col("id") * 37 % 1000000).as("ts"),
        element_at(array(lit("view"), lit("click"), lit("cart"), lit("pay"),
          lit("share"), lit("return")), (col("id") % 6 + 1).cast("int")).as("event_type"))
      val evPath = "/tmp/graft_probe_funnel"
      time("write funnel events (8M rows)")(
        ev.write.mode("overwrite").parquet(evPath))
      val e = spark.read.parquet(evPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      // the FIRST funnel over freshly-written parquet absorbs ~5 s of
      // one-time cost (writeback + window-pipeline JIT) in BOTH its passes
      // — warm it out so the 3-vs-6 comparison measures stage count alone
      noop(Behavior.funnel(e, "user_id", "ts", "event_type",
        Seq("view", "click"), 86400))
      time2("funnel 3-stage @ 8M events")(noop(Behavior.funnel(
        e, "user_id", "ts", "event_type", Seq("view", "click", "pay"), 86400)))
      time2("funnel 6-stage @ 8M events")(noop(Behavior.funnel(
        e, "user_id", "ts", "event_type",
        Seq("view", "click", "cart", "pay", "share", "return"), 86400)))
    }

    // Distributed-probe retrieval at corpus-vs-corpus scale: the r14 shape
    // where the probe set is itself a big table (bitext mining). Broadcast
    // serve vs distributed equi-join on the SAME 1M x 64d index, probe
    // sets 1k (serve-sized) and 100k (100x past any broadcast budget —
    // the shape the driver-side LUT build could not run at all).
    // NOTE: the 100k x 8-cell shape scores ~3.1e9 pairs; under the dev
    // JVM's 8g default the 32 concurrent tasks' join-build + top-k
    // partial buffers exhaust the execution pool — run this section with
    // SPARK_DRIVER_MEM=24g (a real cluster sizes executors accordingly;
    // this is a local[32]-in-one-heap artifact, r15-verified at 24g).
    if (sections("bigprobe")) {
      import graft.operators.Similarity
      val vecs = spark.range(0, 1000000).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> " +
          "CAST((id * 2654435761 + d * 40503) % 104729 AS DOUBLE) / 104729.0 - 0.5)")
          .as("embedding"))
      val vPath = "/tmp/graft_probe_bigprobe"
      time("write 1M x 64d vectors")(
        vecs.write.mode("overwrite").parquet(vPath))
      val v = spark.read.parquet(vPath)
      // 256 cells for 1M vectors (≈4k members/cell) and nprobe=8: each
      // probe scans ~3% of the corpus — a realistic recall/pruning
      // posture, and what keeps the scored-pair volume proportional to
      // |probes| x corpus/32 instead of quadratic-looking blowups.
      val sample = v.where(col("vec_id") % 100 === 0)
      val cents = Similarity.trainCentroids(sample, k = 256, iterations = 3)
      cents.persist().count()
      val books = Similarity.fitIvfPqCodebooks(sample, cents, m = 8, ksub = 16,
        iterations = 3)
      books.collect()
      val idxPath = "/tmp/graft_probe_bigprobe_idx"
      time("ivfPqEncode 1M x 64d")(
        Similarity.ivfPqEncode(v, cents, books).write.mode("overwrite").parquet(idxPath))
      val idx = spark.read.parquet(idxPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      val probes1k = v.where(col("vec_id") % 1000 === 7)
      val probes10k = v.where(col("vec_id") % 100 === 7)
      val probes100k = v.where(col("vec_id") % 10 === 7)
      time2("ivf-pq 1k probes, broadcast")(noop(
        Similarity.ivfPqTopK(idx, cents, books, probes1k, 10, nprobe = 8)))
      time2("ivf-pq 1k probes, distributed")(noop(
        Similarity.ivfPqTopK(idx, cents, books, probes1k, 10, nprobe = 8,
          broadcastProbes = false)))
      time2("ivf-pq 100k probes, distributed")(noop(
        Similarity.ivfPqTopK(idx, cents, books, probes100k, 10, nprobe = 8,
          broadcastProbes = false)))
      // raw tier at 10k probes: uncompressed vectors cost 64 mults per
      // scored pair vs PQ's 8 table reads, so the same probe volume is
      // ~8x the flops — 10k here measures the shape, not a stress test
      time2("ivf raw 10k probes, distributed")(noop(
        Similarity.ivfTopK(v, cents, probes10k, 10, nprobe = 8,
          broadcastProbes = false)))
      cents.unpersist()
    }

    // Hot-cell skew on the distributed IVF-PQ join: a deliberately
    // Zipfian-cell fixture (u^3 concentration puts ~31% of the corpus in
    // one coarse cell) run corpus-vs-corpus. Unsalted, the hot cell's
    // |LUTs| x |codes| scoring pins one task; salted, it splits across
    // ceil(count_c / codesPerSalt) buckets. The printout reports wall time
    // plus max/median task duration WITHIN the heaviest stage — the
    // straggler diagnostic the salt exists to fix.
    if (sections("zipfcell")) {
      import graft.operators.Similarity
      import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
      val n = 200000L
      // cell = floor(32 * u^3) for uniform u: cell 0 holds ~31% of rows,
      // cell 1 ~8%, a power-law tail after — the Zipf shape of real
      // embedding clusters. Vector = one-hot(cell) + small deterministic
      // jitter, so max-cosine assignment lands each row in its cell.
      val zvecs = spark.range(0, n).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> CAST(IF(" +
          "d - 1 = CAST(32 * power((id * 2654435761) % 1048576 / 1048576.0, 3) AS INT), " +
          "1.0, ((id * 40503 + d * 69069) % 1000) / 20000.0) AS DOUBLE))")
          .as("embedding"))
      val zPath = "/tmp/graft_probe_zipfcell"
      time("write 200k x 64d Zipf-cell vectors")(
        zvecs.write.mode("overwrite").parquet(zPath))
      val zv = spark.read.parquet(zPath)
      val zcents = spark.range(0, 32).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> CAST(IF(d - 1 = id, 1.0, 0.0) AS DOUBLE))")
          .as("embedding"))
      val zbooks = Similarity.fitIvfPqCodebooks(
        zv.where(col("vec_id") % 50 === 0), zcents, m = 8, ksub = 16,
        iterations = 2)
      zbooks.collect()
      val zIdxPath = "/tmp/graft_probe_zipfcell_idx"
      Similarity.ivfPqEncode(zv, zcents, zbooks)
        .write.mode("overwrite").parquet(zIdxPath)
      val zidx = spark.read.parquet(zIdxPath)
      val zprobes = zv.where(col("vec_id") % 32 === 7) // ~6.2k, corpus-shaped
      def taskSkew(name: String)(f: => Unit): Unit = {
        val durs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
        val l = new SparkListener {
          override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
            durs.synchronized { durs += ((t.stageId, t.taskInfo.duration)) }
        }
        spark.sparkContext.addSparkListener(l)
        val t0 = System.nanoTime(); f
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener bus drains asynchronously
        spark.sparkContext.removeSparkListener(l)
        val byStage = durs.synchronized(durs.toSeq).groupBy(_._1)
        val (_, heavy) = byStage.maxBy(_._2.map(_._2).sum)
        val ds = heavy.map(_._2).sorted
        val med = ds(ds.length / 2) / 1e3
        val mx = ds.last / 1e3
        println(f"[probe] $name%-34s $wall%.2f s wall; heaviest stage: " +
          f"${ds.length} tasks, max $mx%.2f s / median $med%.2f s = " +
          f"${mx / math.max(med, 1e-9)}%.1fx")
      }
      // warm the lineage (fit collects, codegen) outside the measured runs
      noop(Similarity.ivfPqTopK(zidx, zcents, zbooks,
        zprobes.where(col("vec_id") < 1000), 10, nprobe = 1,
        broadcastProbes = false))
      taskSkew("ivf-pq Zipf cells, UNSALTED")(noop(
        Similarity.ivfPqTopK(zidx, zcents, zbooks, zprobes, 10, nprobe = 1,
          broadcastProbes = false, codesPerSalt = Long.MaxValue)))
      taskSkew("ivf-pq Zipf cells, salted@4k")(noop(
        Similarity.ivfPqTopK(zidx, zcents, zbooks, zprobes, 10, nprobe = 1,
          broadcastProbes = false, codesPerSalt = 4096)))
    }

    // RAW-tier salted join, detach A/B (r16's ivfTopK change): the raw
    // corpus has no stored cell_id, so without the detach BOTH the salt
    // fit's count aggregate and the join re-run the assignment kernel
    // (ncells x dims flops per corpus row, twice); detached, the assigned
    // frame materializes once and both subtrees read blocks. Same
    // Zipf-cell fixture as `zipfcell`; identity is pinned by comparing
    // the two outputs row-for-row before timing.
    if (sections("rawdetach")) {
      import graft.operators.Similarity
      val n = 200000L
      val zvecs = spark.range(0, n).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> CAST(IF(" +
          "d - 1 = CAST(32 * power((id * 2654435761) % 1048576 / 1048576.0, 3) AS INT), " +
          "1.0, ((id * 40503 + d * 69069) % 1000) / 20000.0) AS DOUBLE))")
          .as("embedding"))
      val zPath = "/tmp/graft_probe_rawdetach"
      time("write 200k x 64d Zipf-cell vectors")(
        zvecs.write.mode("overwrite").parquet(zPath))
      val zv = spark.read.parquet(zPath)
      val zcents = spark.range(0, 32).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> CAST(IF(d - 1 = id, 1.0, 0.0) AS DOUBLE))")
          .as("embedding"))
      val zprobes = zv.where(col("vec_id") % 32 === 7)
      def run(detach: Boolean) = Similarity.ivfTopKImpl(zv, zcents, zprobes,
        10, "vec_id", "embedding", nprobe = 1, broadcastProbes = false,
        codesPerSalt = 4096, maxSalt = 64, detachSalted = detach)
      // identity pin: the detach must not change a single output row
      val diff = run(true).unionAll(run(false))
        .groupBy("probe_id", "rank", "neighbor_id")
        .agg(count(lit(1)).as("c")).where(col("c") =!= 2).count()
      require(diff == 0, s"rawdetach: detach changed $diff output rows")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // The sweep clears the detach's own intra-run caches so every pass is
      // cold; it runs BEFORE the timer, and once more after the loop so the
      // final iteration's checkpoint blocks don't outlive the section in
      // this shared JVM. Fixture inputs are all parquet-backed (including
      // the big run's centroids, below) precisely so the sweep cannot bias
      // either variant: a Dataset persist() after an RDD-level sweep is a
      // CacheManager no-op and never actually re-caches.
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 3).map { _ =>
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
          val t0 = System.nanoTime(); f
          (System.nanoTime() - t0) / 1e9
        }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 3)")
      }
      time2("ivf raw salted, NO detach (2 passes)")(noop(run(false)))
      time2("ivf raw salted, detached (1 pass)")(noop(run(true)))
      // the detach trade scales with ncells (the re-run kernel is
      // ncells x dims flops/row; the materialization is ncells-invariant)
      // — measure the 256-cell/1M-vector shape too, where a second
      // assignment pass costs 8x the 32-cell fixture's
      val bvecs = spark.range(0, 1000000).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> " +
          "CAST((id * 2654435761 + d * 40503) % 104729 AS DOUBLE) / 104729.0 - 0.5)")
          .as("embedding"))
      val bPath = "/tmp/graft_probe_rawdetach_big"
      time("write 1M x 64d vectors")(
        bvecs.write.mode("overwrite").parquet(bPath))
      val bv = spark.read.parquet(bPath)
      // centroids land in parquet, not a cache: both variants then read the
      // identical tiny file every iteration regardless of time2's sweeps
      val cPath = "/tmp/graft_probe_rawdetach_cents"
      time("fit 256 centroids (one-time, to parquet)")(
        Similarity.trainCentroids(bv.where(col("vec_id") % 100 === 0),
          k = 256, iterations = 3).write.mode("overwrite").parquet(cPath))
      val bcents = spark.read.parquet(cPath)
      val bprobes = bv.where(col("vec_id") % 100 === 7)
      def runBig(detach: Boolean) = Similarity.ivfTopKImpl(bv, bcents, bprobes,
        10, "vec_id", "embedding", nprobe = 8, broadcastProbes = false,
        codesPerSalt = 8192, maxSalt = 64, detachSalted = detach)
      time2("ivf raw 256c/1M, NO detach")(noop(runBig(false)))
      time2("ivf raw 256c/1M, detached")(noop(runBig(true)))
    }

    if (sections("pq")) {
      import graft.operators.Similarity
      // 1M deterministic 64-dim vectors — hash-mixed so parquet can't
      // dictionary-compress them (a linear pattern hides the real footprint
      // ratio), but still RNG-free and reproducible across runs
      val vecs = spark.range(0, 1000000).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> " +
          "CAST((id * 2654435761 + d * 40503) % 104729 AS DOUBLE) / 104729.0 - 0.5)")
          .as("embedding"))
      val vPath = "/tmp/graft_probe_pq"
      time("write 1M x 64d vectors")(
        vecs.write.mode("overwrite").parquet(vPath))
      val v = spark.read.parquet(vPath)
      val books = Similarity.fitPqCodebooks(
        v.where(col("vec_id") % 100 === 0), m = 8, ksub = 16, iterations = 3)
      books.collect() // materialize the fit outside the timed region
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      time2("scalarQuantize 1M x 64d")(noop(Similarity.scalarQuantize(v)))
      time2("pqEncode 1M x 64d")(noop(Similarity.pqEncode(v, books)))
      val codesPath = "/tmp/graft_probe_pq_codes"
      Similarity.pqEncode(v, books).write.mode("overwrite").parquet(codesPath)
      val codes = spark.read.parquet(codesPath)
      val probes = v.where(col("vec_id") < 8)
      time2("ADC top-10 over 1M codes")(
        noop(Similarity.pqTopK(codes, books, probes, 10)))
      time2("brute-force top-10 over 1M raw")(
        noop(Similarity.bruteForceTopK(v, probes, 10)))
      // the dim-scaling claim: at 64d both paths are scan-bound and ADC's
      // wall time merely matches brute force — at LLM-embedding widths the
      // raw scan grows with dims while the code scan does not
      val wide = spark.range(0, 200000).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 512), d -> " +
          "CAST((id * 2654435761 + d * 40503) % 104729 AS DOUBLE) / 104729.0 - 0.5)")
          .as("embedding"))
      val wPath = "/tmp/graft_probe_pq512"
      time("write 200k x 512d vectors")(
        wide.write.mode("overwrite").parquet(wPath))
      val w = spark.read.parquet(wPath)
      val wBooks = Similarity.fitPqCodebooks(
        w.where(col("vec_id") % 100 === 0), m = 16, ksub = 16, iterations = 3)
      wBooks.collect()
      val wCodesPath = "/tmp/graft_probe_pq512_codes"
      Similarity.pqEncode(w, wBooks).write.mode("overwrite").parquet(wCodesPath)
      val wCodes = spark.read.parquet(wCodesPath)
      val wProbes = w.where(col("vec_id") < 8)
      time2("ADC top-10 over 200k x 512d codes")(
        noop(Similarity.pqTopK(wCodes, wBooks, wProbes, 10)))
      time2("brute top-10 over 200k x 512d raw")(
        noop(Similarity.bruteForceTopK(w, wProbes, 10)))
    }

    // Fuzzy-dedup transform growth on a dup-heavy corpus: 16 exact copies
    // of every document (the crawl-with-dups shape — web crawls run ~80%
    // duplicate). Clusters become >=16-cliques, so the LSH pair arm grows
    // quadratically IN CLUSTER SIZE — but pairs stay (band,bkey)-bucket-
    // local int64 ids, CC converges in one round on cliques, and the kept
    // set collapses back to ~base-cluster count. The claim under test:
    // cost grows with the corpus scan + bounded bucket joins, never with
    // text x pair count.
    if (sections("fuzzydedup")) {
      import graft.operators.Dedup
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      val bigPath = "/tmp/graft_probe_fuzzy16"
      time("write 16x doc copies (exact dups)")(
        (0 until 16).map(i => docs.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val big = spark.read.parquet(bigPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      time2("fuzzyKeepFirst  1x (5k docs)")(
        noop(Dedup.fuzzyDedupKeepFirst(docs, "doc_id", "text")))
      time2("fuzzyKeepBest   1x")(
        noop(Dedup.fuzzyDedupKeepBest(docs, "doc_id", "text", col("n_chars"))))
      time2("fuzzyKeepFirst 16x (80k docs)")(
        noop(Dedup.fuzzyDedupKeepFirst(big, "doc_id", "text")))
      time2("fuzzyKeepBest  16x")(
        noop(Dedup.fuzzyDedupKeepBest(big, "doc_id", "text", col("n_chars"))))
    }

    // spanScrub growth: duplicate-heavy corpus (every 5th doc carries a
    // shared boilerplate paragraph -> corpus-wide dup spans) at 1x and 8x.
    // The claim under test: the dup-detection arm ships int64 hashes only,
    // so the transform grows with the corpus SCAN, not with pair counts —
    // and the audit (spanDupStats) prices the join-back the transform adds.
    if (sections("spanscrub")) {
      import graft.operators.Dedup
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
        .select(col("doc_id"),
          // 8-token lines + a shared paragraph on every 5th doc
          concat(
            regexp_replace(col("text"),
              "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n"),
            when(col("doc_id") % 5 === 0,
              lit("\nshared boiler line one\nshared boiler line two\nshared boiler line three"))
              .otherwise(lit(""))).as("text"))
      val basePath = "/tmp/graft_probe_span"
      time("write duplicate-heavy lined docs 1x")(
        docs.write.mode("overwrite").parquet(basePath))
      val base = spark.read.parquet(basePath)
      val bigPath = "/tmp/graft_probe_span64"
      // copy-salt EVERY line so the 8x corpus repeats the 1x dup structure
      // per copy instead of making all spans cross-copy duplicates (which
      // would change the workload, not just the size)
      time("write 64x blowup (line-salted)")(
        (0 until 64).map(i => base.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
          concat(lit(s"c$i "),
            regexp_replace(col("text"), "\n", s"\nc$i ")).as("text")))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val big = spark.read.parquet(bigPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      time2("spanDupStats 1x (audit)")(noop(Dedup.spanDupStats(base, "doc_id", "text", 3)))
      time2("spanScrub    1x (transform)")(noop(Dedup.spanScrub(base, "doc_id", "text", 3)))
      time2("spanDupStats 64x (audit)")(noop(Dedup.spanDupStats(big, "doc_id", "text", 3)))
      time2("spanScrub    64x (transform)")(noop(Dedup.spanScrub(big, "doc_id", "text", 3)))
    }

    // Growth probe for the round-9 cleaning scrubs: boilerplate-line DF
    // scrub on the line-salted blowup (per-copy line salt keeps each
    // copy's DF structure identical to 1x instead of making every line
    // corpus-global boilerplate), and the token-window ExactSubstr scrub
    // on a per-copy token salt (same invariance argument at token level).
    if (sections("cleanscrub")) {
      import graft.operators.Dedup
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
        .select(col("doc_id"),
          concat(
            regexp_replace(col("text"),
              "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n"),
            when(col("doc_id") % 5 === 0,
              lit("\nshared boiler line one\nshared boiler line two"))
              .otherwise(lit(""))).as("text"))
      val basePath = "/tmp/graft_probe_clean"
      time("write lined docs 1x")(
        docs.write.mode("overwrite").parquet(basePath))
      val base = spark.read.parquet(basePath)
      val bigPath = "/tmp/graft_probe_clean16"
      time("write 16x blowup (line-salted)")(
        (0 until 16).map(i => base.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
          concat(lit(s"c$i "),
            regexp_replace(col("text"), "\n", s"\nc$i ")).as("text")))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val big = spark.read.parquet(bigPath)
      val raw = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
      val tokPath = "/tmp/graft_probe_tok16"
      time("write 16x blowup (token-salted)")(
        (0 until 16).map(i => raw.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(lit(s"c$i"), t))).as("text")))
          .reduce(_ union _).write.mode("overwrite").parquet(tokPath))
      val bigTok = spark.read.parquet(tokPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      time2("boilerplateLineScrub  1x")(noop(
        Dedup.boilerplateLineScrub(base, "doc_id", "text", 2)))
      time2("boilerplateLineScrub 16x")(noop(
        Dedup.boilerplateLineScrub(big, "doc_id", "text", 2)))
      time2("tokenSpanScrub  1x (n=10)")(noop(
        Dedup.tokenSpanScrub(raw, "doc_id", "text", 10)))
      time2("tokenSpanScrub 16x (n=10)")(noop(
        Dedup.tokenSpanScrub(bigTok, "doc_id", "text", 10)))
    }

    // q124 growth: Manku banding with the oracle-parity 16-bit fingerprint
    // (4-bit blocks, 16 key values) vs the scale-path 64-bit fingerprint
    // (16-bit blocks, 65536 values) on 1x and a 16x token-salted blowup.
    // The narrow block key funnels the corpus into a handful of quadratic
    // buckets as it grows; the wide key's buckets stay small — this is the
    // measured argument for simhashNearDupPairs64 at 100 TB.
    if (sections("simhashband")) {
      import graft.operators.Dedup
      val raw = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
      val tokPath = "/tmp/graft_probe_sh16"
      time("write 16x blowup (token-salted)")(
        (0 until 16).map(i => raw.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(lit(s"c$i"), t))).as("text")))
          .reduce(_ union _).write.mode("overwrite").parquet(tokPath))
      val big = spark.read.parquet(tokPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      def count16(d: org.apache.spark.sql.DataFrame) =
        Dedup.simhashNearDupPairs(d, "doc_id", "text", maxHamming = 1).count()
      def count64(d: org.apache.spark.sql.DataFrame) =
        Dedup.simhashNearDupPairs64(d, "doc_id", "text", maxHamming = 3).count()
      var n = 0L
      time2("simhash16/4-bit bands  1x") { n = count16(raw) }
      println(s"[probe]   pairs(16-bit, 1x) = $n")
      time2("simhash16/4-bit bands 16x") { n = count16(big) }
      println(s"[probe]   pairs(16-bit, 16x) = $n")
      time2("simhash64/16-bit bands  1x") { n = count64(raw) }
      println(s"[probe]   pairs(64-bit, 1x) = $n")
      time2("simhash64/16-bit bands 16x") { n = count64(big) }
      println(s"[probe]   pairs(64-bit, 16x) = $n")
    }

    // q118/q120 growth: chunkDocs' explode and selectByBudget's two-phase
    // prefix sum on a 16x id-salted copy blowup (per-doc operators — copy
    // blowup measures volume growth honestly; no cross-doc structure to
    // preserve). The budget scales 16x with the corpus so the selected
    // prefix stays proportional.
    if (sections("packbudget")) {
      import graft.operators.{Stats, TextAnalysis}
      val raw = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
      val bigPath = "/tmp/graft_probe_pack16"
      time("write 16x blowup (id-salted)")(
        (0 until 16).map(i => raw.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"), col("text")))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val big = spark.read.parquet(bigPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      time2("chunkDocs  1x (128/16)")(noop(
        TextAnalysis.chunkDocs(raw, "doc_id", "text", 128, 16)))
      time2("chunkDocs 16x (128/16)")(noop(
        TextAnalysis.chunkDocs(big, "doc_id", "text", 128, 16)))
      def budgeted(d: org.apache.spark.sql.DataFrame, budget: Long) = {
        val scored = d.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        Stats.selectByBudget(scored, Seq(col("quality").desc, col("doc_id").asc),
          "n_tokens", budget, out = "cum_tokens")
      }
      time2("selectByBudget  1x (1.5M tok)")(noop(budgeted(raw, 1500000L)))
      time2("selectByBudget 16x (24M tok)")(noop(budgeted(big, 24000000L)))
    }

    // q131 growth: stupid-backoff word LM on 1x and a 16x id-salted copy
    // blowup. Copy blowup grows the SCORE pass 16x while the fit tables
    // (vocabulary-bounded) stay constant-size — the claim is wall growth
    // well under 16x because the corpus-sized arm is the two explodes +
    // broadcast probes, and the per-bigram work is flat.
    if (sections("wordlm")) {
      import graft.operators.TextAnalysis
      val raw = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
      val bigPath = "/tmp/graft_probe_wordlm16"
      time("write 16x blowup (id-salted)")(
        (0 until 16).map(i => raw.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"), col("text")))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val big = spark.read.parquet(bigPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      def lm(d: org.apache.spark.sql.DataFrame) =
        TextAnalysis.wordBigramLogProb(d, "doc_id", "text",
          fitPred = col("doc_id") % 2 === 0)
      time2("wordBigramLogProb  1x")(noop(lm(raw)))
      time2("wordBigramLogProb 16x")(noop(lm(big)))
    }

    // Chat aggregate + shard plan growth on a 16x blowup: both are
    // single-exchange operators (conversation-keyed agg / shard-keyed
    // window), so wall time should track the scan, not re-shuffle.
    if (sections("chatshard")) {
      import graft.operators.{Batching, Chat}
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      val bigPath = "/tmp/graft_probe_chat16"
      time("write 16x doc copies")(
        (0 until 16).map(i => docs.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"), col("text")))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val big = spark.read.parquet(bigPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      def turns(d: org.apache.spark.sql.DataFrame) =
        graft.SparkEntry.synthesizeTurns(d)
      time2("chat flatten+spans  1x")(noop(
        Chat.flattenChat(turns(docs), "conv_id", "turn_idx", "role", "content",
          Some(4))))
      time2("chat flatten+spans 16x")(noop(
        Chat.flattenChat(turns(big), "conv_id", "turn_idx", "role", "content",
          Some(4))))
      time2("shardPlan  1x")(noop(
        Batching.shardPlan(docs, "doc_id", "text", 64, 7L)))
      time2("shardPlan 16x")(noop(
        Batching.shardPlan(big, "doc_id", "text", 64, 7L)))
    }

    // Winnowing + paragraph scrub growth on an id-salted 16x corpus
    // blowup: winnowing's selection is per-doc array work (should track
    // the scan ~linearly); the pair join grows with real matches (copies
    // pair with copies — quadratic in the COPY factor by construction,
    // which is the measured, documented behavior, not a plan defect).
    // paragraphScrub should track spanScrub's measured growth (same body).
    if (sections("winnow")) {
      import graft.operators.Dedup
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      val bigPath = "/tmp/graft_probe_winnow16"
      time("write 16x doc copies")(
        (0 until 16).map(i => docs.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"), col("text")))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val big = spark.read.parquet(bigPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      time2("winnowedFingerprints  1x")(
        noop(Dedup.winnowedFingerprints(docs, "doc_id", "text")))
      time2("winnowedFingerprints 16x")(
        noop(Dedup.winnowedFingerprints(big, "doc_id", "text")))
      val pared1 = graft.SparkEntry.synthesizeParagraphs(docs)
      val pared16 = graft.SparkEntry.synthesizeParagraphs(big)
      time2("paragraphScrub  1x")(
        noop(Dedup.paragraphScrub(pared1, "doc_id", "text")))
      time2("paragraphScrub 16x")(
        noop(Dedup.paragraphScrub(pared16, "doc_id", "text")))
    }

    // Bloom-split incremental dedup: a 2M-fingerprint index vs a 2M-doc
    // wave at 95% fresh, broadcast disabled (a corpus-scale index never
    // broadcasts). The split should shrink the anti join's WAVE side to
    // (re-crawl + FP) of the batch; the index side of the exact arm is
    // what the bucketed layout (section `bucket`) removes — the two
    // levers compose.
    if (sections("bloomdedup")) {
      import graft.operators.Dedup
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val idxDocs = spark.range(0, 2000000L).toDF("doc_id")
          .select(col("doc_id"), concat(lit("indexed document body "),
            col("doc_id").cast("string")).as("text"))
        val seenPath = "/tmp/graft_probe_bloom_seen"
        time("build 2M-key index (wide fp)")(
          Dedup.fingerprints(idxDocs, "text", wide = true)
            .write.mode("overwrite").parquet(seenPath))
        val seen = spark.read.parquet(seenPath)
        // wave: 5% re-crawls of indexed ids, 95% fresh bodies
        val wave = spark.range(0, 2000000L).toDF("doc_id")
          .select((col("doc_id") + 10000000L).as("doc_id"),
            when(col("doc_id") % 20 === 0,
              concat(lit("indexed document body "), col("doc_id").cast("string")))
              .otherwise(concat(lit("fresh wave body "),
                col("doc_id").cast("string"))).as("text"))
        def time2(name: String)(f: => Unit): Unit = {
          val ts = (1 to 2).map { _ =>
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
        }
        time2("incremental dedup, plain anti")(
          noop(Dedup.incrementalDedupKeepFirst(wave, "doc_id", "text", seen,
            wide = true)))
        time2("incremental dedup, bloom split")(
          noop(Dedup.incrementalDedupKeepFirst(wave, "doc_id", "text", seen,
            wide = true, bloomBits = Some(1 << 24))))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }

    // Round-12 operator growth: 1x vs 16x docs for main-content
    // extraction (pure projection — must track the scan), trained
    // lang-ID (two explodes + vocab join), BM25 (posting-list join), and
    // the host quota cap (slim window).
    if (sections("r12ops")) {
      import graft.operators.TextAnalysis
      val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      val bigPath = "/tmp/graft_probe_r12_16"
      time("write 16x doc copies")(
        (0 until 16).map(i => docs.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
          .reduce(_ union _).write.mode("overwrite").parquet(bigPath))
      val big = spark.read.parquet(bigPath)
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      def page(d: org.apache.spark.sql.DataFrame) =
        d.select(col("doc_id"), graft.SparkEntry.synthPage.as("_html"))
      time2("main-content extract  1x")(noop(
        TextAnalysis.extractMainContent(page(docs), "doc_id", "_html",
          minStopPerMille = 50)))
      time2("main-content extract 16x")(noop(
        TextAnalysis.extractMainContent(page(big), "doc_id", "_html",
          minStopPerMille = 50)))
      time2("trigram lang-ID  1x")(noop(
        TextAnalysis.trigramLangId(docs, "doc_id", "text", "lang",
          fitPred = col("doc_id") % 2 === 0)))
      time2("trigram lang-ID 16x")(noop(
        TextAnalysis.trigramLangId(big, "doc_id", "text", "lang",
          fitPred = col("doc_id") % 2 === 0)))
      def queries(d: org.apache.spark.sql.DataFrame) =
        d.where(col("doc_id") % 100000000L < 10)
          .select(col("doc_id").as("query_id"),
            concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 4)).as("qtext"))
      time2("bm25 top-5, 10 queries  1x")(noop(
        TextAnalysis.bm25TopK(docs, "doc_id", "text", queries(docs),
          "query_id", "qtext", 5)))
      time2("bm25 top-5, 160 queries 16x")(noop(
        TextAnalysis.bm25TopK(big, "doc_id", "text", queries(big),
          "query_id", "qtext", 5)))
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/p/"), (col("doc_id") % 40).cast("string"))
      time2("host quota cap  1x")(noop(
        TextAnalysis.hostQuotaCap(docs.withColumn("url", url)
          .withColumn("score", col("n_chars")), "doc_id", "url", "score", 25)))
      time2("host quota cap 16x")(noop(
        TextAnalysis.hostQuotaCap(big.withColumn("url", url)
          .withColumn("score", col("n_chars")), "doc_id", "url", "score", 25)))
    }

    // PageRank growth: 3 power-iteration rounds over 0.5M- vs 8M-edge
    // modular graphs — per-round cost must track edges, not rounds^2.
    if (sections("pagerank")) {
      def graph(nNodes: Long) = {
        val nodes = spark.range(nNodes).toDF("id")
        val edges = nodes
          .select(col("id").as("src"), ((col("id") * 3 + 1) % nNodes).as("dst"))
          .unionByName(nodes
            .select(col("id").as("src"), ((col("id") * 7 + 3) % nNodes).as("dst")))
        (nodes, edges)
      }
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      val (n1, e1) = graph(250000L)
      val (n16, e16) = graph(4000000L)
      time2("pagerank x3 rounds, 0.5M edges")(noop(
        graft.operators.Graph.pageRank(n1, e1, 3)))
      time2("pagerank x3 rounds,   8M edges")(noop(
        graft.operators.Graph.pageRank(n16, e16, 3)))
    }

    // Second-moment / Mahalanobis growth: the matrix_gram fit and the
    // native score pass at 1x vs 16x vectors (corpus growth) and 64d vs
    // 512d (width growth). Claims: fit wall ~linear in n (the buffer is
    // per-task, merges are O(d²) and constant-count); score wall ~linear
    // in n·d²/cores; neither shuffles corpus data.
    if (sections("gram")) {
      import graft.operators.Decomp
      def vecs(n: Long, d: Int) = spark.range(n).select(col("id"),
        transform(sequence(lit(1), lit(d)),
          j => pmod(hash(col("id") * lit(1000) + j), lit(1000)).cast("double") / 500.0 - 1.0)
          .as("v"))
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      val p64 = "/tmp/graft_gram_64"; val p64x16 = "/tmp/graft_gram_64x16"
      val p512 = "/tmp/graft_gram_512"
      time("write 100k x 64d / 1.6M x 64d / 100k x 512d") {
        vecs(100000L, 64).write.mode("overwrite").parquet(p64)
        vecs(1600000L, 64).write.mode("overwrite").parquet(p64x16)
        vecs(100000L, 512).write.mode("overwrite").parquet(p512)
      }
      val (d64, d64x16, d512) = (spark.read.parquet(p64),
        spark.read.parquet(p64x16), spark.read.parquet(p512))
      time2("gram fit 100k x 64d")(Decomp.fitMeanCov(d64, "v"))
      time2("gram fit 1.6M x 64d (16x rows)")(Decomp.fitMeanCov(d64x16, "v"))
      time2("gram fit 100k x 512d (8x dims)")(Decomp.fitMeanCov(d512, "v"))
      val m64 = Decomp.fitPca(d64, "v")
      val m512 = Decomp.fitPca(d512, "v")
      time2("maha score 100k x 64d")(noop(Decomp.mahalanobis(d64, "v", m64)))
      time2("maha score 1.6M x 64d (16x)")(noop(Decomp.mahalanobis(d64x16, "v", m64)))
      time2("maha score 100k x 512d (8x d)")(noop(Decomp.mahalanobis(d512, "v", m512)))
      // whitening (EigenProject, d x d basis = the heaviest apply) and the
      // ridge-probe fit (d+k joint Gram) under the same 16x row growth —
      // both must track the scan like the score pass does
      time2("whiten 100k x 64d")(noop(Decomp.whiten(d64, "v", m64, 64)))
      time2("whiten 1.6M x 64d (16x)")(noop(Decomp.whiten(d64x16, "v", m64, 64)))
      val probeTargets = (0 until 8).map(c =>
        when(pmod(col("id"), lit(8)) === c, 1.0).otherwise(0.0))
      time2("probe fit 100k x 64d + 8 tgt")(
        Decomp.fitRidgeProbes(d64, "v", probeTargets, 1e-3))
      time2("probe fit 1.6M x 64d (16x)")(
        Decomp.fitRidgeProbes(d64x16, "v", probeTargets, 1e-3))
      val pm = Decomp.fitRidgeProbes(d64, "v", probeTargets, 1e-3)
      time2("probe score 1.6M x 64d (16x)")(noop(Decomp.probeScores(d64x16, "v", pm)))
      // full 5-fold CV fit: one grouped-Gram pass, leave-fold-out models
      // from moment additivity — growth must track the plain fit
      time2("cv-probe fit 100k x 64d (5 folds)")(
        Decomp.fitRidgeProbesPerFold(d64, "v", probeTargets,
          pmod(col("id"), lit(5)), 5, 1e-3))
      time2("cv-probe fit 1.6M x 64d (16x)")(
        Decomp.fitRidgeProbesPerFold(d64x16, "v", probeTargets,
          pmod(col("id"), lit(5)), 5, 1e-3))
    }

    // Modality fingerprint throughput: image dHash (decode-bound) and
    // WAV parse + audit (pure byte walk) at 1x vs 16x file volume.
    if (sections("modhash")) {
      import graft.operators.{Media, Sound}
      import spark.implicits._
      def png(seed: Int): Array[Byte] = {
        val im = new java.awt.image.BufferedImage(128, 96,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until 128; y <- 0 until 96) {
          val v = (x * 2 + y + seed * 37) % 256
          im.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", out); out.toByteArray
      }
      def wav(seed: Int): Array[Byte] = {
        val rate = 8000; val n = rate
        val out = new java.io.ByteArrayOutputStream(44 + n * 2)
        def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
        def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
        out.write("RIFF".getBytes); w32(36 + n * 2); out.write("WAVE".getBytes)
        out.write("fmt ".getBytes); w32(16); w16(1); w16(1); w32(rate)
        w32(rate * 2); w16(2); w16(16); out.write("data".getBytes); w32(n * 2)
        var i = 0
        while (i < n) {
          val v = 0.5 * math.sin(2 * math.Pi * (200 + seed % 200) * i / rate)
          w16(math.round(v * 32767).toInt & 0xffff); i += 1
        }
        out.toByteArray
      }
      val imgs = (0 until 512).map(i => (s"img$i", png(i)))
      val wavs = (0 until 512).map(i => (s"w$i.wav", wav(i)))
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      def imgDs(rep: Int) = spark.createDataset(
        for (r <- 0 until rep; (n, b) <- imgs)
          yield Media.ZipEntryRow(s"a$r", n, b)).repartition(32)
      def wavDf(rep: Int) = spark.createDataset(
        for (r <- 0 until rep; (n, b) <- wavs) yield (s"$r/$n", b))
        .toDF("path", "content").repartition(32)
      time2("image dHash   1x (512 imgs)")(noop(Media.imageDHashes(imgDs(1))))
      time2("image dHash  16x (8192 imgs)")(noop(Media.imageDHashes(imgDs(16))))
      time2("audio audit   1x (512 wavs)")(noop(Sound.audioAudit(wavDf(1))))
      time2("audio audit  16x (8192 wavs)")(noop(Sound.audioAudit(wavDf(16))))
    }

    // WARC source growth: record-parse wall at 1x vs 16x record volume,
    // plus the gzip (Common Crawl layout) overhead at 16x. The parse is a
    // per-file flatMap, so the claim to verify is ~linear growth with
    // records and no driver involvement.
    if (sections("warcsrc")) {
      import graft.sources.Warc
      import java.nio.charset.StandardCharsets.UTF_8
      val html = "<html><body>" + ("corpus words and markup " * 20) + "</body></html>"
      val httpBlock =
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
      def seg(nRec: Int): Array[Byte] = {
        val sb = new java.io.ByteArrayOutputStream(nRec * (httpBlock.length + 160))
        for (i <- 0 until nRec) {
          val body = httpBlock.getBytes(UTF_8)
          sb.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Target-URI: https://example.com/p$i\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8))
          sb.write(body); sb.write("\r\n\r\n".getBytes(UTF_8))
        }
        sb.toByteArray
      }
      def gz(b: Array[Byte]): Array[Byte] = {
        val bo = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bo)
        g.write(b); g.finish(); bo.toByteArray
      }
      val one = seg(2000)
      def writeSegs(dir: String, n: Int, bytes: Array[Byte], ext: String): Unit = {
        val d = new java.io.File(dir); d.mkdirs()
        d.listFiles().foreach(_.delete())
        (0 until n).foreach(i => java.nio.file.Files.write(
          new java.io.File(d, f"seg$i%03d.$ext").toPath, bytes))
      }
      time("write warc fixtures (8/128 segs x 2k rec)") {
        writeSegs("/tmp/graft_probe_warc1", 8, one, "warc")
        writeSegs("/tmp/graft_probe_warc16", 128, one, "warc")
        writeSegs("/tmp/graft_probe_warc16gz", 128, gz(one), "warc.gz")
      }
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      def parseAll(dir: String): Unit = noop(
        Warc.readWarc(spark, dir).select(col("http_status"),
          length(col("payload")).as("l")))
      time2("warc parse  1x (16k records)")(parseAll("/tmp/graft_probe_warc1"))
      time2("warc parse 16x (256k records)")(parseAll("/tmp/graft_probe_warc16"))
      time2("warc parse 16x gz (CC layout)")(parseAll("/tmp/graft_probe_warc16gz"))
    }

    // Typed-JSONL source growth: scan wall at 1x vs 16x lines, and a
    // corrupt-rate sweep at 16x (0% / 1% / 10% garbage lines) — the claim
    // is that PERMISSIVE capture costs parse time only on the corrupt
    // lines, not a per-file penalty.
    if (sections("jsonlsrc")) {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("text", StringType)))
      def gen(path: String, n: Long, corruptPerMille: Int): Unit = {
        val good = concat(lit("{\"id\": "), col("id"),
          lit(", \"text\": \"body words for document "), col("id"),
          lit(" padded with a few more tokens\"}"))
        spark.range(n).select(
          when(pmod(col("id"), lit(1000)) < corruptPerMille,
            lit("{\"id\": oops not json")).otherwise(good).as("value"))
          .write.mode("overwrite").text(path)
      }
      time("write jsonl fixtures (200k/3.2M lines)") {
        gen("/tmp/graft_probe_jsonl1", 200000L, 0)
        gen("/tmp/graft_probe_jsonl16", 3200000L, 0)
        gen("/tmp/graft_probe_jsonl16c1", 3200000L, 10)
        gen("/tmp/graft_probe_jsonl16c10", 3200000L, 100)
      }
      def time2(name: String)(f: => Unit): Unit = {
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $name%-34s ${ts.min}%.2f s (min of 2)")
      }
      def scan(path: String): Unit = noop(
        graft.sources.Ingest.jsonlTyped(spark, path, schema,
          corruptColumn = Some("_bad")))
      time2("jsonl scan  1x (200k lines)")(scan("/tmp/graft_probe_jsonl1"))
      time2("jsonl scan 16x (3.2M lines)")(scan("/tmp/graft_probe_jsonl16"))
      time2("jsonl scan 16x, 1% corrupt")(scan("/tmp/graft_probe_jsonl16c1"))
      time2("jsonl scan 16x, 10% corrupt")(scan("/tmp/graft_probe_jsonl16c10"))
    }

    // Z-order vs linear-sort vs unclustered layout at 6.4M rows:
    // files touched and scan wall for a ~3% x 3% 2-D box (one user
    // cohort in one time window). The pruning ratio — not the absolute
    // seconds — is the number that carries to 100 TB: scan bytes for a
    // multi-dim slice shrink with the PRODUCT of the per-dim
    // selectivities on the z-order layout, vs the best single one on a
    // linear sort.
    if (sections("zorder")) {
      import graft.sources.Clustering
      val ev = Tables.events(spark, "/root/testdata/sf0.1")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      val big = (0 until 64).map(i => ev
          .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L)))
        .reduce(_ unionAll _)
      val base = "/tmp/graft_probe_zorder"
      def clean(p: String): Unit = {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(path)) { fs.delete(path, true); () }
      }
      Seq("plain", "lin", "z").foreach(s => clean(s"$base/$s"))
      time("zorder: write plain 64 files (6.4M rows)")(
        big.repartition(64).write.parquet(s"$base/plain"))
      time("zorder: write linear sort by user_id")(
        big.repartitionByRange(64, col("user_id")).sortWithinPartitions("user_id")
          .write.parquet(s"$base/lin"))
      time("zorder: write z-order (user_id, ts_us)")(
        Clustering.zOrderWrite(big, Seq("user_id", "ts_us"), bits = 10,
          s"$base/z", nFiles = 64))
      val s0 = ev.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
      val (mnU, mxU, mnT, mxT) = (s0.getLong(0), s0.getLong(1), s0.getLong(2), s0.getLong(3))
      def slice(lo: Long, hi: Long, num: Long, den: Long, at: Long): (Long, Long) = {
        val w = (hi - lo) * num / den
        (lo + (hi - lo) * at / 100, lo + (hi - lo) * at / 100 + w)
      }
      // three predicate shapes: the linear layout prunes only the first;
      // z-order prunes all three (at sqrt-resolution per dim — the
      // standard z-curve trade)
      val (u3lo, u3hi) = slice(mnU, mxU, 3, 100, 30)
      val (u17lo, u17hi) = slice(mnU, mxU, 17, 100, 40)
      val (t3lo, t3hi) = slice(mnT, mxT, 3, 100, 50)
      val (t17lo, t17hi) = slice(mnT, mxT, 17, 100, 50)
      val boxes = Seq(
        "3% user x all time " -> Seq(("user_id", u3lo, u3hi)),
        "all user x 3% time " -> Seq(("ts_us", t3lo, t3hi)),
        "17% user x 17% time" -> Seq(("user_id", u17lo, u17hi), ("ts_us", t17lo, t17hi)))
      for ((bname, box) <- boxes; layout <- Seq("plain", "lin", "z")) {
        val (touched, total) = Clustering.filesTouched(spark, s"$base/$layout", box)
        val pred = box.map { case (c, lo, hi) => col(c).between(lo, hi) }.reduce(_ && _)
        val t0 = System.nanoTime()
        noop(spark.read.parquet(s"$base/$layout").where(pred))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] zorder: $bname $layout%-5s $touched%3d/$total files  $sec%.2f s")
      }
    }

    // Rank-bucketed vs equi-width z-order under key skew, at the zorder
    // section's 6.4M-row scale: a log-uniform (Zipf-shaped) user key
    // packs ~half the rows into equi-width bucket 0, so that dimension
    // stops contributing bits and a dense-region 2-D box stops pruning;
    // quantile rank buckets keep equal row mass per bucket and the
    // pruning survives. The ratio between the two layouts' touched-file
    // counts is the number that carries to 100 TB.
    if (sections("zorderskew")) {
      import graft.sources.Clustering
      val ev = Tables.events(spark, "/root/testdata/sf0.1")
        .select(col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .withColumn("user_zipf", expr(
          "CAST(exp(pmod(hash(event_id), 1048576) / 1048576.0 * ln(1000000.0)) AS BIGINT)"))
      val big = (0 until 64).map(i => ev
          .withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L)))
        .reduce(_ unionAll _)
      val base = "/tmp/graft_probe_zorderskew"
      def clean(p: String): Unit = {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(path)) { fs.delete(path, true); () }
      }
      Seq("eq", "rk").foreach(s => clean(s"$base/$s"))
      time("zorderskew: write equi-width layout")(
        Clustering.zOrderWrite(big, Seq("user_zipf", "ts_us"), bits = 10,
          s"$base/eq", nFiles = 64))
      time("zorderskew: write rank-bucket layout")(
        Clustering.zOrderWrite(big, Seq("user_zipf", "ts_us"), bits = 10,
          s"$base/rk", nFiles = 64, ranked = true))
      val s0 = ev.agg(min("ts_us"), max("ts_us")).head()
      val (mnT, mxT) = (s0.getLong(0), s0.getLong(1))
      val t3lo = mnT + (mxT - mnT) / 2
      val t3hi = t3lo + (mxT - mnT) * 3 / 100
      // dense-region cohort (user_zipf 10..30 holds ~8% of rows but
      // ~0.002% of the VALUE range — the shape equi-width collapses on)
      val box = Seq(("user_zipf", 10L, 30L), ("ts_us", t3lo, t3hi))
      for (layout <- Seq("eq", "rk")) {
        val (touched, total) = Clustering.filesTouched(spark, s"$base/$layout", box)
        val pred = box.map { case (c, lo, hi) => col(c).between(lo, hi) }.reduce(_ && _)
        val t0 = System.nanoTime()
        noop(spark.read.parquet(s"$base/$layout").where(pred))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] zorderskew: dense 2-D box $layout%-3s $touched%3d/$total files  $sec%.2f s")
      }
    }

    // Unigram-LM EM cost vs corpus growth: the fit's claim is that EM
    // rounds cost |word types| (Heaps ~sqrt corpus), not corpus tokens.
    // A 16x corpus should grow the E-step wall far slower than 16x —
    // the word-frequency aggregate (the single corpus-sized pass)
    // absorbs the scale.
    if (sections("unigram")) {
      import graft.operators.TextAnalysis
      val d1 = Tables.documents(spark, "/root/testdata/sf0.1").select("doc_id", "text")
      val d16 = (0 until 16).map(i => d1
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L))
          // shift the text per replica so word TYPES also grow (a pure
          // union would recount identical types and flatter the claim)
          .withColumn("text", concat(col("text"), lit(s" replica$i marker$i"))))
        .reduce(_ unionAll _)
      for ((tag, d) <- Seq("1x" -> d1, "16x" -> d16)) {
        val stats = d.select(explode(TextAnalysis.wordTokens(col("text"))).as("w"))
          .agg(count(lit(1)).as("toks"), countDistinct(col("w")).as("types")).head()
        val (nToks, nTypes) = (stats.getLong(0), stats.getLong(1))
        val t0 = System.nanoTime()
        val fit = TextAnalysis.trainUnigramLm(d, "text", vocabSize = 120,
          maxPieceLen = 4, emIters = 2)
        val n = fit.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] unigram fit $tag%-4s $nToks%9d tokens / $nTypes%5d types, vocab $n%4d  $sec%.2f s")
      }
    }

    // Streaming state growth: the batch dedup tiers all carry measured
    // 16x claims; this gives the streaming ladder its number. Replays the
    // q206 two-wave shape (re-crawl wave first, originals second — every
    // wave-1 keeper flips) through the exact rung (incrementalDedupStream:
    // ValueState, ONE long per distinct fingerprint), the fuzzy rung
    // (fuzzyDedupStream: ListState of (id, 16-slot sig) per LSH bucket —
    // the retained-droppers caveat: dropped docs stay in state, so rows
    // grow with docs SEEN, not docs kept), and the semantic rung
    // (semanticDedupStream: ListState of (id, FULL 48-dim vector) per
    // hyperplane bucket — the ladder's heaviest per-doc state) at 1x and
    // 16x on RocksDB, then the sessionizer (ONE open Session per active
    // user + an event-time timer: rows should track ACTIVE USERS, not
    // events, and B/user stay flat at 16x). Reported: wall + state rows
    // per micro-batch and the store's memory/SST footprint from the query
    // progress.

    // The nPlanes lever of semanticDedup, quantified now that the plane
    // family is non-degenerate (the 3-periodic weights capped EVERY corpus
    // at <= 8 buckets): 200k 64-dim vectors in 40k planted clusters of 5
    // near-dups (pairwise cosine ~0.9996 > the 0.95 threshold). For each
    // nPlanes: bucket spread, the candidate-pair count (the quadratic
    // within-bucket join cost, closed-form from the histogram — this is
    // the number the lever exists to shrink), true-dup-pair bucket recall
    // (an LSH lever trades recall; SemDeDup's k-means assignment makes the
    // same trade), and the end-to-end semanticDedup wall where the pair
    // count is tractable.
    if (sections("semplanes")) {
      import graft.operators.Similarity
      val nClusters = 40000L
      val vecs = spark.range(0, nClusters * 5).select(
        col("id").as("vec_id"),
        expr(("transform(sequence(1, 64), d -> " +
          "CAST(pmod(xxhash64(CAST(id DIV 5 AS BIGINT), d), 10007) / 10007.0 - 0.5 AS DOUBLE)" +
          " + IF(d = 1 + (id DIV 5) % 64, 0.03 * (id % 5), 0D))")).as("embedding"))
      val vPath = "/tmp/graft_probe_semplanes"
      time("write 200k x 64d clustered vectors")(
        vecs.write.mode("overwrite").parquet(vPath))
      val v = spark.read.parquet(vPath)
      val truePairs = nClusters * 10 // C(5,2) per cluster
      for (np <- Seq(3, 8, 12, 16)) {
        // persisted: the histogram and both recall-join sides read it (the
        // sides project differently, so exchange reuse would not apply)
        val b = Similarity.hyperplaneBuckets(v, nPlanes = np).persist()
        val h = b.groupBy("bucket").agg(count(lit(1)).as("n"))
        val st = h.agg(count(lit(1)).as("buckets"), max("n").as("mx"),
          sum(expr("n * (n - 1) DIV 2")).as("cand")).head()
        val (nb, mx, cand) = (st.getLong(0), st.getLong(1), st.getLong(2))
        // recall: same-cluster pairs whose members share the bucket
        val a1 = b.select((col("vec_id") / 5).cast("long").as("c"),
          col("vec_id").as("ida"), col("bucket"))
        val a2 = b.select((col("vec_id") / 5).cast("long").as("c"),
          col("vec_id").as("idb"), col("bucket"))
        val hit = a1.join(a2, Seq("c", "bucket")).where(col("ida") < col("idb")).count()
        val recall = hit.toDouble / truePairs
        // end-to-end only where the candidate count is sane — at 3 planes
        // (the degenerate formula's effective ceiling was 8 buckets) the
        // ~2.5e9-pair join is exactly the blowup the fix removed
        val wall = if (cand < 200000000L) {
          val t0 = System.nanoTime()
          noop(Similarity.semanticDedup(v, threshold = 0.95, nPlanes = np))
          f"${(System.nanoTime() - t0) / 1e9}%.1f s"
        } else "skipped (pair count — the pre-fix regime)"
        println(f"[probe] semplanes np=$np%-2d buckets $nb%5d (max $mx%7d) " +
          f"cand pairs $cand%12d recall $recall%.4f dedup $wall")
        b.unpersist(blocking = true): Unit
      }
      // the OR-construction's recall recovery, at two configurations: a
      // true pair is a candidate when ANY band co-buckets it. 2x12 is the
      // cheap-candidates point; 3x8 checks the 1-(1-r)^b rule
      // extrapolates past two bands (3x the 8-plane bucket-join cost)
      for ((np, bands) <- Seq((12, 2), (8, 3))) {
        val bDf = v.select(col("vec_id") +: (0 until bands).map(bd =>
          Similarity.hyperplaneBucketExpr("embedding", np, bd * np).as(s"bk$bd")): _*)
          .persist()
        val hitAny = (0 until bands).map { band =>
          val c = s"bk$band"
          bDf.select((col("vec_id") / 5).cast("long").as("cl"),
              col("vec_id").as("ida"), col(c).as("bk"))
            .join(bDf.select((col("vec_id") / 5).cast("long").as("cl"),
              col("vec_id").as("idb"), col(c).as("bk")), Seq("cl", "bk"))
            .where(col("ida") < col("idb"))
            .select("cl", "ida", "idb")
        }.reduce(_ unionAll _).distinct().count()
        bDf.unpersist(blocking = true)
        println(f"[probe] semplanes np=$np x $bands bands (OR): recall ${hitAny.toDouble / truePairs}%.4f")
        val t0 = System.nanoTime()
        noop(Similarity.semanticDedupBanded(v, threshold = 0.95, nPlanes = np, bands = bands))
        println(f"[probe] semplanes banded dedup ${np}x$bands        ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      // the LSH concentration limit AND its fix: a CONCENTRATED corpus
      // (every vector = a shared direction + small noise — the real shape
      // of sentence-embedding spaces, which cluster around a mean) pins
      // the sign of every plane that weights the shared dims, so spread
      // collapses no matter how sound the plane family is. center=true
      // (fitMeanVector + centerVectors — the mean IS the shared direction)
      // must restore the isotropic occupancy.
      val conc = spark.range(0, nClusters * 5).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> " +
          "CAST(IF(d = 1, 10.0, 0.0) + " +
          "pmod(xxhash64(CAST(id DIV 5 AS BIGINT), d), 10007) / 10007.0 - 0.5 AS DOUBLE))")
          .as("embedding"))
      val cPath = "/tmp/graft_probe_semplanes_conc"
      conc.write.mode("overwrite").parquet(cPath)
      val concV = spark.read.parquet(cPath)
      val concMu = Similarity.fitMeanVector(concV)
      val concCentered = concV.select(col("vec_id"),
        Similarity.centerVectors(col("embedding"), concMu).as("embedding"))
      for ((tag, corp) <- Seq(("raw     ", concV), ("centered", concCentered));
           np <- Seq(8, 16)) {
        val h = Similarity.hyperplaneBuckets(corp, nPlanes = np)
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .agg(count(lit(1)), max("n")).head()
        println(f"[probe] semplanes CONCENTRATED $tag np=$np%-2d buckets ${h.getLong(0)}%5d " +
          f"(max ${h.getLong(1)}%7d)")
      }
      // end-to-end centered dedup on the concentrated corpus — the shape
      // that was quadratic-in-bucket before the fix
      val tc = System.nanoTime()
      noop(Similarity.semanticDedup(concV, threshold = 0.95, center = true))
      println(f"[probe] semplanes CONCENTRATED centered dedup np=8 " +
        f"${(System.nanoTime() - tc) / 1e9}%.1f s")
    }

    if (sections("streamscale")) {
      import graft.streaming.EventStreams
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      try {
        spark.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        // Shared by the rung loop and the sessionizer: stage wave frames
        // as single parquet files with staggered mtimes (arrival order for
        // the default maxFilesPerTrigger = 1), drive the stream
        // AvailableNow, and report wall / state rows / mem / SST. The
        // per-unit byte figure prices off whichever of mem/SST is larger —
        // memoryUsedBytes under-reports list-heavy state once flushed.
        def stageWaves(tag: String,
                       waves: Seq[org.apache.spark.sql.DataFrame]): String = {
          val root = java.nio.file.Files
            .createTempDirectory(s"graft_streamscale_$tag").toString
          new java.io.File(s"$root/in").mkdirs()
          for ((df, i) <- waves.zipWithIndex) {
            df.coalesce(1).write.parquet(s"$root/w$i")
            for (p <- new java.io.File(s"$root/w$i").listFiles()
                 if p.getName.endsWith(".parquet")) {
              val dst = java.nio.file.Path.of(s"$root/in", s"w$i-${p.getName}")
              java.nio.file.Files.copy(p.toPath, dst)
              dst.toFile.setLastModified((i + 1) * 1000000L): Unit
            }
          }
          root
        }
        def runAndReport(out: org.apache.spark.sql.DataFrame, root: String,
                         mode: String, denom: Long, label: String,
                         unit: String): Unit = {
          val q = out.writeStream
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
              df.write.format("noop").mode("overwrite").save(): Unit
            }
            .outputMode(mode)
            .option("checkpointLocation", s"$root/ckpt")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          val ps = q.recentProgress.filter(_.numInputRows > 0)
          val walls = ps.map(p =>
            f"${p.durationMs.get("triggerExecution") / 1000.0}%.2f").mkString("/")
          val rows = ps.map(_.stateOperators(0).numRowsTotal).mkString("/")
          val last = ps.last.stateOperators(0)
          val mem = last.memoryUsedBytes / 1048576.0
          val sstBytes = Option(last.customMetrics.get("rocksdbSstFileSize"))
            .fold(-1.0)(_.toDouble)
          val bPer = math.max(last.memoryUsedBytes.toDouble, sstBytes) /
            math.max(1.0, denom.toDouble)
          println(f"[probe] streamscale $label: " +
            f"wall $walls s/batch, state rows $rows, mem $mem%.1f MiB, " +
            f"sst ${sstBytes / 1048576.0}%.1f MiB ($bPer%.0f B/$unit)")
        }
        for (rung <- Seq("exact", "fuzzy", "semantic", "sempq", "sembanded",
                         "sembandedpq");
             mult <- Seq(1, 16)) {
          val perWave = (rung match {
            case "exact" => 8000L
            case "fuzzy" => 4000L
            case _ => 2000L // semantic tiers: heaviest per-doc state AND an
                            // O(bucket^2) re-emit recurrence per batch
          }) * mult
          val dups = perWave * 4 / 5 // 20% in-wave dup rate
          val payload = rung match {
            case "exact" =>
              concat(lit("exact payload text for doc "),
                pmod(col("id"), lit(dups))).as("text")
            case "fuzzy" =>
              concat(lit("alpha beta gamma delta epsilon zeta eta theta iota kappa tail"),
                pmod(col("id"), lit(dups))).as("text")
            case _ =>
              // dup docs share the exact vector (cos = 1 > 0.9); distinct
              // xxhash64-mixed 48-dim vectors are isotropic (a linear ramp
              // in d collapses every vector onto a handful of hyperplane
              // sign patterns — 6 of 256 buckets measured — which is not
              // the production spread the probe prices), no RNG
              expr(s"transform(sequence(1, 48), d -> " +
                s"CAST(pmod(xxhash64(pmod(id, ${dups}L), d), 10007) " +
                s"/ 10007.0 - 0.5 AS DOUBLE))").as("embedding")
          }
          def wave(shift: Long) = spark.range(perWave).select(
            (col("id") + shift).as("doc_id"), payload)
          // re-crawl wave first, originals second — every wave-1 keeper flips
          val root = stageWaves(s"${rung}_$mult",
            Seq(wave(1000000000L), wave(0L)))
          val schema = spark.read.parquet(s"$root/in").schema
          val stream = EventStreams.readFileStream(spark, s"$root/in", schema)
          // PQ rungs: codebooks fit batch-side on a deterministic 2% slice
          // of wave 0 (the fitSample contract) — the probe prices the
          // B/doc cut of codes-in-state vs the raw rungs above
          lazy val pqBooks = graft.operators.Similarity.fitPqCodebooks(
            wave(0L), m = 8, ksub = 16, iterations = 2, idCol = "doc_id",
            fitSample = Some(pmod(col("doc_id"), lit(50)) === 0))
          val deduped = rung match {
            case "exact" => EventStreams.incrementalDedupStream(stream)
            case "fuzzy" => EventStreams.fuzzyDedupStream(stream, tau = 0.5)
            case "semantic" => EventStreams.semanticDedupStream(stream,
              threshold = 0.9, nPlanes = 8, idCol = "doc_id",
              vecCol = "embedding")
            case "sempq" => EventStreams.semanticDedupStream(stream,
              threshold = 0.9, nPlanes = 8, idCol = "doc_id",
              vecCol = "embedding", pqBooks = Some(pqBooks))
            case "sembandedpq" => EventStreams.semanticDedupStreamBanded(stream,
              threshold = 0.9, nPlanes = 8, bands = 2, idCol = "doc_id",
              vecCol = "embedding", pqBooks = Some(pqBooks))
            // full per-band plane count (8, like the single rung): bands do
            // NOT substitute for planes — a 2x4 split was measured at
            // 50-100 s/batch on the 16x leg because 16 buckets/band puts
            // ~4k vectors in every bucket list and the O(bucket^2)
            // recurrence explodes; per-band nPlanes must be sized exactly
            // like the single rung's, and bands multiply state on top
            case _ => EventStreams.semanticDedupStreamBanded(stream,
              threshold = 0.9, nPlanes = 8, bands = 2, idCol = "doc_id",
              vecCol = "embedding")
          }
          runAndReport(deduped, root, "update", perWave * 2,
            f"$rung%-8s ${mult}%2dx ${perWave * 2}%8d docs", "doc")
        }
        // Sessionizer: two event waves per user, the second inside every
        // open session's 30-min gap horizon, so NO session closes and the
        // final state-rows metric IS the active-user count. 8 events/user/
        // wave at 1-min spacing; wave 2 starts 11 min after wave 1 ends.
        for (mult <- Seq(1, 16)) {
          val users = 500L * mult
          val perWave = users * 8
          def wave(waveIdx: Int) = spark.range(perWave).select(
            pmod(col("id"), lit(users)).as("user_id"),
            timestamp_micros(lit(waveIdx * 18L * 60000000L) +
              (col("id") / lit(users)).cast("long") * 60000000L).as("event_time"))
          val root = stageWaves(s"sess_$mult", Seq(wave(0), wave(1)))
          val schema = spark.read.parquet(s"$root/in").schema
          val stream = EventStreams.readFileStream(spark, s"$root/in", schema)
          runAndReport(
            EventStreams.sessionizeStream(stream, "event_time", "user_id",
              gapMinutes = 30),
            root, "append", users,
            f"session ${mult}%2dx $users%6d users / ${perWave * 2}%8d events",
            "user")
        }
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    // The cross-wave scrub/append loop at scale (r20 surface): build an
    // IVF-PQ index on a 200k x 64d clustered corpus, scrub a 20k wave
    // (10k exact re-crawls of corpus rows under fresh ids + 10k genuinely
    // new), append the survivors, then re-scrub re-crawls OF the appended
    // wave. Prices the walls of each leg on the DISTRIBUTED serve path
    // (broadcastProbes = false — a 20k-probe LUT frame at nprobe = 4 is
    // ~170 MB of 265-double rows, past sane broadcast size; the salted
    // cell join is the wave shape) and measures the ADC-recall ladder of
    // exact re-crawls (cos(v, recon(v)) under m=8/ksub=16 quantization)
    // across taus — the number that tells a curator where to set tau in
    // RECONSTRUCTED space.
    if (sections("scrubappend")) {
      import graft.operators.Similarity
      val nRows = 200000L
      // UNIFORM corpus: per-dim independent xxhash noise — NO structure
      // for PQ to exploit (every subspace is 8-dim uniform; 2^(8·H) cells
      // would be needed). PQ's worst case, measured so the scaladoc's
      // sizing advice has a number behind it.
      def uniform(firstId: Long, n: Long) = spark.range(firstId, firstId + n).select(
        col("id").as("vec_id"),
        expr(("transform(sequence(1, 64), d -> " +
          "CAST(pmod(xxhash64(CAST(id DIV 5 AS BIGINT), d), 10007) / 10007.0 - 0.5 AS DOUBLE)" +
          " + IF(d = 1 + (id DIV 5) % 64, 0.03 * (id % 5), 0D))")).as("embedding"))
      // LOW-RANK corpus: every vector is a hash-weighted mix of 12 fixed
      // basis directions + 2% per-dim noise — the real shape of sentence
      // embeddings (low intrinsic dimension). Each subspace then sees a
      // 12-dim manifold that ksub centroids can tile.
      def lowRankB(firstId: Long, n: Long, basisOffset: Int) =
        spark.range(firstId, firstId + n).select(
          col("id").as("vec_id"),
          expr(("transform(sequence(1, 64), d -> " +
            "CAST(aggregate(sequence(0, 11), 0D, (acc, r) -> acc + " +
            s"  (pmod(xxhash64(CAST(id DIV 5 AS BIGINT), r), 7) - 3.0) * " +
            s"  (pmod(xxhash64(CAST(r + $basisOffset AS BIGINT), d, 42), 1009) / 1009.0 - 0.5)) " +
            " + pmod(xxhash64(id, d, 7), 101) / 101.0 * 0.08 - 0.04 AS DOUBLE))")).as("embedding"))
      def lowRank(firstId: Long, n: Long) = lowRankB(firstId, n, 0)
      // ADC self-recall ladder: top-1 cosine of 5k EXACT re-crawls vs the
      // index — cos(v, recon(v)) is what tau compares against in
      // reconstructed space, so this is the tau-sizing table
      def recallLadder(tag: String, path: String, gen: (Long, Long) => org.apache.spark.sql.DataFrame,
                       ksub: Int): Unit = {
        gen(0L, nRows).write.mode("overwrite").parquet(path)
        val corpus = spark.read.parquet(path)
        val t0 = System.nanoTime()
        val cents = Similarity.trainCentroids(corpus, 64, 2)
        val books = Similarity.fitIvfPqCodebooks(corpus, cents, m = 8,
          ksub = ksub, iterations = 2)
        val enc = Similarity.ivfPqEncode(corpus, cents, books).persist()
        enc.count()
        val fitS = (System.nanoTime() - t0) / 1e9
        val probes = corpus.where(col("vec_id") < 5000)
          .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
        val top1 = Similarity.ivfPqTopK(enc, cents, books, probes, 1,
            nprobe = 4, broadcastProbes = false)
          .agg(count(lit(1)).as("n"),
            sum(when(col("cosine") > 0.7, 1).otherwise(0)).as("t07"),
            sum(when(col("cosine") > 0.8, 1).otherwise(0)).as("t08"),
            sum(when(col("cosine") > 0.9, 1).otherwise(0)).as("t09"),
            round(avg("cosine"), 3).as("avg")).head()
        enc.unpersist(blocking = true)
        println(f"[probe] scrubappend recall $tag%-8s ksub=$ksub%-3d (fit+encode $fitS%5.1f s): " +
          f"exact re-crawls caught at tau 0.7/0.8/0.9 = ${top1.getLong(1)}%4d/" +
          f"${top1.getLong(2)}%4d/${top1.getLong(3)}%4d of ${top1.getLong(0)} " +
          f"(mean top-1 ${top1.getDouble(4)}%.3f)")
      }
      recallLadder("uniform", "/tmp/graft_probe_sa_u", uniform, 16)
      recallLadder("uniform", "/tmp/graft_probe_sa_u", uniform, 256)
      recallLadder("lowrank", "/tmp/graft_probe_sa_l", lowRank, 16)
      recallLadder("lowrank", "/tmp/graft_probe_sa_l", lowRank, 64)
      // The full cross-wave loop, q227's design at scale: books fit on
      // the FULL 200k design snapshot (the fitSample production shape —
      // books anticipate the distribution), the index ENCODES only rows
      // < 190k, and the wave is the 10k held-out rows (in-distribution
      // for the books, genuinely absent from the index) + 10k exact
      // re-crawls of indexed rows. Uniform corpus at ksub=256 and the
      // ladder-supported tau=0.7: re-crawls drop, held-out survive,
      // append survivors, and re-crawls of the APPENDED wave then drop —
      // because their codes are in-fit-distribution. (The lowrank legs
      // above show the converse: appending docs the books never saw
      // loses their self-recall — the refit trigger the
      // appendToIvfPqIndex scaladoc names.)
      val design = spark.read.parquet("/tmp/graft_probe_sa_u")
      val (idx, fitS) = {
        val t0 = System.nanoTime()
        val cents = Similarity.trainCentroids(design, 64, 2)
        val books = Similarity.fitIvfPqCodebooks(design, cents, m = 8,
          ksub = 256, iterations = 2)
        val enc = Similarity.ivfPqEncode(
          design.where(col("vec_id") < 190000), cents, books)
        Similarity.saveIvfPqIndex("/tmp/graft_probe_scrubappend_idx",
          Similarity.IvfPqIndex(cents, books, enc))
        (Similarity.loadIvfPqIndex(spark, "/tmp/graft_probe_scrubappend_idx"),
          (System.nanoTime() - t0) / 1e9)
      }
      println(f"[probe] scrubappend index: fit on 200k design, encode 190k, persist  $fitS%.1f s")
      val recrawls = design.where(col("vec_id") < 10000)
        .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
      val heldOut = design.where(col("vec_id") >= 190000)
      recrawls.unionByName(heldOut)
        .write.mode("overwrite").parquet("/tmp/graft_probe_scrubappend_wave")
      val waveDf = spark.read.parquet("/tmp/graft_probe_scrubappend_wave")
      val tau = 0.7
      val survivors = time(f"scrub 20k wave vs 190k index (distributed serve, tau=$tau)") {
        val s = Similarity.scrubAgainstIvfPqIndex(waveDf, idx, tau,
          nprobe = 4, broadcastProbes = false).persist()
        val n = s.count()
        val lost = s.where(col("vec_id") >= 1000000000L).count()
        println(f"[probe] scrubappend survivors $n of 20000 " +
          f"(10000 held-out fresh + $lost recall-lost re-crawls)")
        s
      }
      val grown = time("append survivors (incl. the hot-cell balance aggregate)") {
        val g = Similarity.appendToIvfPqIndex(idx, survivors)
        g.encoded.write.format("noop").mode("overwrite").save()
        g
      }
      // re-crawls OF the appended held-out docs (exact copies, fresh
      // ids): the loop's point — wave N+1 duplicates of wave-N survivors
      // drop, because the appended codes are in-fit-distribution
      val re2 = heldOut.select((col("vec_id") + 2000000000L).as("vec_id"),
        col("embedding"))
      time("re-scrub re-crawls of the appended wave") {
        val kept = Similarity.scrubAgainstIvfPqIndex(re2, grown, tau,
          nprobe = 4, broadcastProbes = false).count()
        println(f"[probe] scrubappend re-crawls of appended: ${10000 - kept} of 10000 dropped")
      }
      survivors.unpersist(blocking = true): Unit
    }

    // CENTER MODE for the streaming semantic rung, priced on the
    // CONCENTRATED corpus (the r19 verdict's top item). On the
    // semplanes-conc shape (shared strong direction + per-doc noise) the
    // raw rung's plane signs are pinned, the bucket-keyed exchange lands
    // nearly everything under a handful of keys, and the per-batch
    // O(bucket-population^2) keep-first recurrence eats the rung; the
    // fitted-mean snapshot (`mean = Some(fitMeanVector(snapshot))`)
    // restores isotropic occupancy for ZERO extra shuffles — centering is
    // part of the existing pre-shuffle narrow projection. This measures
    // occupancy (distinct bucket keys + max bucket) and wall per batch,
    // raw vs centered, same two-wave re-crawl replay as streamscale.
    if (sections("streamcentered")) {
      import graft.streaming.EventStreams
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      try {
        spark.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        // two concentration strengths: STRONG (+10, the semplanes-conc
        // shape) pins every w1-weighted plane AND pushes every raw
        // pairwise cosine to ~0.96 — the raw rung then mass-drops the
        // corpus (its fast wall is the recurrence's early exit on a WRONG
        // answer: kept collapses to ~one per bucket). MODERATE (+3) still
        // collapses occupancy (bias 3 vs noise sigma ~1.6 per plane) but
        // keeps distinct-pair cosines ~0.69 < 0.9 — no early exit, so the
        // hot buckets pay the full O(population^2) recurrence per batch:
        // the wall number centering buys back while ALSO fixing kept.
        for ((shared, cTag) <- Seq((10.0, "strong"), (3.0, "moderate"));
             mult <- Seq(1, 8)) {
          val perWave = 2000L * mult
          val dups = perWave * 4 / 5
          val payload = expr(s"transform(sequence(1, 48), d -> " +
            s"CAST(IF(d = 1, $shared, 0.0) + " +
            s"pmod(xxhash64(pmod(id, ${dups}L), d), 10007) / 10007.0 - 0.5 AS DOUBLE))")
            .as("embedding")
          def wave(shift: Long) = spark.range(perWave).select(
            (col("id") + shift).as("doc_id"), payload)
          // snapshot mean, fit batch-side on wave 0 (the documented
          // production contract: streams take a PREFIT mean)
          val mu = graft.operators.Similarity.fitMeanVector(wave(0L))
          for ((tag, mean) <- Seq(("raw     ", None), ("centered", Some(mu)))) {
            val root = java.nio.file.Files
              .createTempDirectory(s"graft_streamcentered_$tag").toString
            new java.io.File(s"$root/in").mkdirs()
            for ((df, i) <- Seq(wave(1000000000L), wave(0L)).zipWithIndex) {
              df.coalesce(1).write.parquet(s"$root/w$i")
              for (p <- new java.io.File(s"$root/w$i").listFiles()
                   if p.getName.endsWith(".parquet")) {
                val dst = java.nio.file.Path.of(s"$root/in", s"w$i-${p.getName}")
                java.nio.file.Files.copy(p.toPath, dst)
                dst.toFile.setLastModified((i + 1) * 1000000L): Unit
              }
            }
            val schema = spark.read.parquet(s"$root/in").schema
            val q = EventStreams.semanticDedupStream(
                EventStreams.readFileStream(spark, s"$root/in", schema),
                threshold = 0.9, nPlanes = 8, idCol = "doc_id",
                vecCol = "embedding", mean = mean)
              .writeStream
              .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
                df.withColumn("batch_id", lit(batchId))
                  .write.mode("append").parquet(s"$root/out"): Unit
              }
              .outputMode("update")
              .option("checkpointLocation", s"$root/ckpt")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
            val walls = q.recentProgress.filter(_.numInputRows > 0)
              .map(p => f"${p.durationMs.get("triggerExecution") / 1000.0}%.2f")
              .mkString("/")
            val outDf = spark.read.parquet(s"$root/out")
            val occ = outDf
              .groupBy("bucket").agg(countDistinct("doc_id").as("n"))
              .agg(count(lit(1)), max("n")).head()
            // reader contract: LAST row per (bucket, id); kept count is the
            // correctness check — the two-wave replay of `dups` distinct
            // vectors must keep exactly `dups` docs, which the raw rung on
            // a strongly concentrated corpus fails by mass-dropping
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("bucket", "doc_id").orderBy(col("batch_id").desc)
            val kept = outDf.withColumn("_rn", row_number().over(w))
              .where(col("_rn") === 1 && col("kept")).count()
            println(f"[probe] streamcentered $cTag%-8s $tag ${mult}%2dx ${perWave * 2}%6d docs: " +
              f"buckets ${occ.getLong(0)}%4d (max ${occ.getLong(1)}%6d), " +
              f"kept $kept%6d (want $dups%6d), wall $walls s/batch")
          }
        }
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    // The fuzzy rung's opt-in TTL bound, measured (r16 priced the
    // UNBOUNDED growth at ~300 B/doc; this measures what the TTL buys and
    // what it costs). 8 throttled single-file waves of 6,400 all-distinct
    // docs each (disjoint token namespaces -> est 0 across waves, so
    // kept-set arithmetic is exact); wave 7 re-crawls wave 0's texts
    // verbatim under +7e9 ids. Without TTL the reader's kept set is
    // min-id-per-text = 7 x 6400 (wave 7 fully dropped); with a 4 s TTL
    // and ~2 s between batches wave 0's buckets are long evicted by wave
    // 7, so all 6,400 re-crawls SURVIVE — the batch-parity cost the
    // scaladoc asserts, as a number. Per-batch state rows show the
    // plateau vs the unbounded run's monotone growth.
    if (sections("streamttl")) {
      import graft.streaming.EventStreams
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      try {
        spark.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val perWave = 6400L
        val nWaves = 8
        for (ttl <- Seq(None, Some(java.time.Duration.ofSeconds(4)))) {
          val root = java.nio.file.Files
            .createTempDirectory(s"graft_streamttl_${ttl.isDefined}").toString
          val in = s"$root/in"
          new java.io.File(in).mkdirs()
          for (w <- 0 until nWaves) {
            val ns = if (w == nWaves - 1) 0 else w // last wave re-crawls wave 0
            spark.range(perWave).select(
                (col("id") + w * 1000000000L).as("doc_id"),
                expr(s"concat_ws(' ', transform(sequence(1, 8), " +
                  s"j -> concat('ns${ns}k', id, 't', j)))").as("text"))
              .coalesce(1).write.parquet(s"$root/w$w")
            for (p <- new java.io.File(s"$root/w$w").listFiles()
                 if p.getName.endsWith(".parquet")) {
              val dst = java.nio.file.Path.of(in, f"w$w%02d-${p.getName}")
              java.nio.file.Files.copy(p.toPath, dst)
              dst.toFile.setLastModified((w + 1) * 1000000L): Unit
            }
          }
          val schema = spark.read.parquet(in).schema
          val stream = EventStreams.readFileStream(spark, in, schema,
            maxFilesPerTrigger = 1)
          // TTL forces processing-time mode, and under it AvailableNow
          // never terminates (state-maintenance triggers keep firing on
          // empty batches) — drive as a long-lived stream, poll until all
          // 8 wave files have produced a non-empty batch, stop explicitly
          // (the funnelStream TTL test's discipline)
          val wavesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
          // recentProgress is a BOUNDED ring (default 100 entries) and the
          // TTL's processing-time mode keeps firing empty state-maintenance
          // batches that can evict the early non-empty ones on a slow box —
          // capture every non-empty progress in a listener instead
          val seenProgress = new java.util.concurrent.ConcurrentLinkedQueue[
            org.apache.spark.sql.streaming.StreamingQueryProgress]()
          val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
            override def onQueryStarted(
                e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
            override def onQueryProgress(
                e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
              if (e.progress.numInputRows > 0) { seenProgress.add(e.progress): Unit }
            override def onQueryTerminated(
                e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
          }
          spark.streams.addListener(listener)
          val q = EventStreams.fuzzyDedupStream(stream, tau = 0.5, ttl = ttl)
            .writeStream
            .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
              df.persist()
              if (df.count() > 0) {
                df.withColumn("batch_id", lit(bid))
                  .write.mode("append").parquet(s"$root/out")
                wavesSeen.incrementAndGet()
                Thread.sleep(1500) // space processing time so the TTL can act
              }
              df.unpersist(): Unit
            }
            .outputMode("update")
            .option("checkpointLocation", s"$root/ckpt")
            .start()
          // stop() MUST run even when the deadline require throws, or the
          // RocksDB-backed stream keeps writing through JVM teardown and
          // masks the timeout with executor noise
          try {
            val deadline = System.nanoTime() + 600L * 1000 * 1000 * 1000
            while (wavesSeen.get < nWaves && System.nanoTime() < deadline)
              Thread.sleep(500)
            require(wavesSeen.get >= nWaves,
              s"streamttl: only ${wavesSeen.get} of $nWaves waves processed")
          } finally {
            q.stop()
            q.awaitTermination()
            // the listener bus is async: give the non-empty progress events
            // up to 30 s to drain before detaching. Drain against the FIXED
            // expected count (nWaves), not wavesSeen — the foreachBatch
            // counter double-counts retried batches while the listener sees
            // one progress event per COMMITTED batch, so comparing against
            // it would spin the full timeout on any retry
            val drain = System.nanoTime() + 30L * 1000 * 1000 * 1000
            while (seenProgress.size < nWaves && System.nanoTime() < drain)
              Thread.sleep(200)
            spark.streams.removeListener(listener)
          }
          val qid = q.id
          val ps = seenProgress.toArray(
            Array.empty[org.apache.spark.sql.streaming.StreamingQueryProgress])
            .filter(p => p.id == qid && p.numInputRows > 0)
            .sortBy(_.batchId)
          val rows = ps.map(_.stateOperators(0).numRowsTotal).mkString("/")
          val mem = ps.last.stateOperators(0).memoryUsedBytes / 1048576.0
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("bucket", "doc_id").orderBy(col("batch_id").desc)
          val kept = spark.read.parquet(s"$root/out")
            .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
            .groupBy("doc_id")
            .agg(expr("bool_and(kept_in_bucket)").as("_k"))
            .where(col("_k")).count()
          println(f"[probe] streamttl ttl=${ttl.fold("none")(_.getSeconds + "s")}%-5s " +
            f"${perWave * nWaves}%6d docs: kept $kept%6d " +
            f"(batch parity ${perWave * (nWaves - 1)}), state rows $rows, " +
            f"mem $mem%.1f MiB")
        }
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

    if (!sections("legacy")) { spark.stop(); return }

    time("agg decimal sums (q01 form)")(noop(
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("a"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("b"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).as("c"))))
    time("agg integer-cents sums")(noop(
      li.groupBy("l_returnflag", "l_linestatus").agg(
        (sum(round(col("l_quantity") * 100, 0).cast("long")) / 100.0).as("a"),
        (sum(round(col("l_extendedprice") * 100, 0).cast("long")) / 100.0).as("b"),
        (sum(round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))) / 10000.0).as("c"))))
    time("agg decimal-sum-over-cents")(noop(
      li.groupBy("l_returnflag", "l_linestatus").agg(
        (sum(round(col("l_quantity") * 100, 0).cast("long").cast("decimal(28,0)")).cast("double") / 100.0).as("a"),
        (sum(round(col("l_extendedprice") * 100, 0).cast("long").cast("decimal(28,0)")).cast("double") / 100.0).as("b"),
        (sum((round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).cast("decimal(38,0)")).cast("double") / 10000.0).as("c"))))
    time("agg plain double sums")(noop(
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum("l_quantity"), sum("l_extendedprice"))))

    // 16x blowup
    val big = (0 until 16).map(i => li.withColumn("l_orderkey",
      col("l_orderkey") + lit(i.toLong * 10000000L))).reduce(_ union _)
    val bigPath = "/tmp/graft_big_lineitem"
    time("write 16x lineitem (~9.6M rows)")(
      big.write.mode("overwrite").parquet(bigPath))
    val bl = spark.read.parquet(bigPath)
    println(s"[probe] big rows = ${bl.count()}")

    time("q01-shape agg @ sf0.1")(noop(
      li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(18,2)")), avg("l_extendedprice"), count(lit(1)))))
    time("q01-shape agg @ 16x")(noop(
      bl.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(18,2)")), avg("l_extendedprice"), count(lit(1)))))
    time("join+agg @ sf0.1")(noop(
      li.join(Tables.orders(spark, "/root/testdata/sf0.1"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()))
    time("window dedup @ 16x")(noop(
      graft.operators.Dedup.dedupKeepFirst(bl, Seq("l_orderkey"), Seq("l_linenumber"))))
    time("haversine geo @ 16x")(noop {
      val pts = bl.select(col("l_returnflag"),
        ((col("l_partkey") % 180).cast("double") - 90.0 + col("l_discount")).as("lat1"),
        ((col("l_suppkey") % 360).cast("double") - 180.0 + col("l_tax")).as("lon1"),
        ((col("l_orderkey") % 180).cast("double") - 90.0).as("lat2"),
        (((col("l_orderkey") * 7) % 360).cast("double") - 180.0).as("lon2"))
      graft.operators.Geo.errorReport(pts, Seq("l_returnflag"),
        col("lat1"), col("lon1"), col("lat2"), col("lon2"))
    })

    // Round-2 probes: top-k per group (window sort vs bounded-buffer agg),
    // and the as-of join at 16x. Both answer "does the cheap plan hold when
    // the group/row count is 16x the bench SF?"
    time("group top-3: row_number window @ 16x")(noop(
      graft.operators.Relational.groupTopK(bl, Seq("l_returnflag"), 3,
        col("l_extendedprice").desc, col("l_orderkey").asc)
        .select("l_returnflag", "rank", "l_orderkey")))
    time("group top-3: TopKByScore agg @ 16x")(noop(
      bl.groupBy("l_returnflag")
        .agg(graft.functions.GraftFunctions
          .topk_by_score(col("l_extendedprice"), col("l_orderkey"), 3).as("top"))))
    time("as-of join @ 16x (9.6M left x 600k right)")(noop(
      graft.operators.Relational.asofJoin(
        bl.select(col("l_orderkey"), col("l_suppkey").as("key"),
          col("l_shipdate").as("t")),
        li.groupBy(col("l_suppkey").as("key"), col("l_shipdate").as("t"))
          .agg(max("l_extendedprice").as("last_price")),
        Seq("key"), "t", Seq("last_price"))))
    spark.stop()
  }
}

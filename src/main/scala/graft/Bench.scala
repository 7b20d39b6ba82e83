package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A warm-up pass at sf0.001 first — JVM/JIT, codegen compilation and
  * Hadoop filesystem init otherwise land entirely in whichever query
  * runs first and distort per-query numbers. The timed pass then runs
  * each query once, forcing full materialization via count().
  *
  * Contention guard: queries whose two passes disagree by >3× get a
  * third pass; if no two passes then agree within 3×, the JSON carries
  * `load_suspect: true` + `suspect_queries` so a loaded machine can be
  * told apart from a code regression (the BENCH_r04 failure mode).
  */
object Bench {
  /** Pass-to-pass disagreement: ratio of the second-smallest successful
    * time to the smallest — 1.0 when fewer than two passes succeeded.
    * "No two passes agree within `x`" ⇔ spread > x: the min is only
    * trustworthy when some other pass lands near it. */
  private[graft] def passSpread(ts: Seq[Double]): Double = {
    val ok = ts.filter(_ >= 0).sorted
    if (ok.size < 2 || ok.head <= 0) 1.0 else ok(1) / ok.head
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val spark = GraftSession.local("graft-bench")
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    spark.catalog.clearCache() // drop warm-up persists
    // two independent timed passes per query, report the per-query MIN:
    // single-shot timings at this scale carry ±20% of GC/page-cache/JIT
    // noise, which would otherwise dominate round-over-round comparisons
    def timedPass(names: Seq[String]): Seq[(String, Double)] = {
      // each pass starts from a cold shared-relation state so d7 is
      // timed as the full pipeline and d8 as its incremental cost —
      // within a pass the cluster-label memo is the cross-query reuse
      // a real dedup pipeline gets
      operators.Dedup.invalidateClusterMemo()
      names.sorted.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators persist small intermediates internally; clear between
        // queries so timings are independent of bench order / cache churn
        spark.catalog.clearCache()
        // a crashed query must not masquerade as a fast success — report -1
        name -> (if (ok) dt else -1.0)
      }
    }
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    var passes = Seq(timedPass(allNames), timedPass(allNames)).map(_.toMap)
    // CONTENTION GUARD: a shared/loaded machine shows up as wild
    // pass-to-pass spread on multi-stage queries (BENCH_r04 post-mortem:
    // 5-50× blowups that idle re-timing could not reproduce). When the
    // two passes disagree by >3×, re-time those queries in a third pass;
    // if even then no two passes agree within 3×, flag the run as
    // load-suspect instead of letting the number masquerade as a code
    // regression.
    val disagree = allNames.filter { n =>
      val ts = passes.map(_(n)); ts.forall(_ >= 0) && passSpread(ts) > 3.0
    }
    if (disagree.nonEmpty) {
      // d8 reuses d7's memoized cluster labels: when d8 is re-timed
      // without d7 in the pass, prewarm the memo untimed so the third
      // pass reproduces d8's normal (shared-relation) environment
      val third =
        if (disagree.contains("d8_keep_best") && !disagree.contains("d7_near_dup_clusters"))
          "d7_near_dup_clusters" +: disagree
        else disagree
      val p3 = timedPass(third).toMap
      passes = passes :+ disagree.map(n => n -> p3(n)).toMap
    }
    def timesOf(name: String): Seq[Double] = passes.flatMap(_.get(name))
    val suspectQueries = disagree.filter(n => passSpread(timesOf(n)) > 3.0)
    val results = allNames.map { name =>
      val ts = timesOf(name)
      // -1 (crash) wins over any timing: a query that failed any pass
      // is reported failed
      name -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // headline total covers successful queries only — a crashed query's
    // -1 sentinel must not subtract from (i.e. flatter) the total; it is
    // reported separately in "failed" so a crash is loud, not invisible
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // file-stream sources need a directory; expose a single parquet file
    // through a temp-dir symlink (shared by both streaming sections)
    def streamOf(name: String) = {
      val schema = spark.read.parquet(s"$sfDir/$name.parquet").schema
      val d = java.nio.file.Files.createTempDirectory(s"graft-bench-$name")
      java.nio.file.Files.createSymbolicLink(
        d.resolve(s"$name.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$name.parquet"))
      spark.readStream.schema(schema).parquet(d.toString)
    }
    // run a streaming query with the state shuffle sized to the batch
    // volume: at these row counts more partitions just multiply
    // per-partition store-commit overhead (profiled via
    // tools/ProfileStream). The count is pinned into the checkpoint at
    // first batch (planned asynchronously after start()), so only
    // restore the conf once the query has fully stopped.
    def timedStream(partitions: Int)(start: () => org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      // stop in finally: if processAllAvailable throws, the query must
      // not keep running (and pinning the conf) into later timed passes
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        val t0 = System.nanoTime()
        q = start()
        q.processAllAvailable()
        q.stop() // in the timed window — keeps methodology comparable
        (System.nanoTime() - t0) / 1e9
      } finally {
        // safety net for the failure path only (stop() is idempotent)
        if (q != null) { try q.stop() catch { case _: Throwable => () } }
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      }
    }
    // like the batch queries, stream sections run twice and report the
    // best rate — single runs carry the same environmental noise (each
    // run gets a FRESH checkpoint so no state is reused). A crash in one
    // attempt counts as -1 for that attempt only; noise that manifests
    // as a transient failure must not discard a successful other run.
    def best2(run: () => Double): Double = {
      def one(): Double = try run() catch { case _: Throwable => -1.0 }
      math.max(one(), one())
    }
    // streaming throughput: the DAU pipeline through a REAL streaming
    // query — file-stream source → watermark → state-store dedup → noop
    // sink (a batch DataFrame would take Pipelines' non-streaming
    // branch and skip the state store entirely). The reference's
    // envelope is "fits a 5 s trigger on 4 cores" (BASELINE.md);
    // rows/sec makes that comparable.
    def dauRate(): Double = {
      val n = Tables.events(spark, sfDir).count()
      best2 { () =>
        val ev = Tables.normalizeEventTs(streamOf("events"))
          .selectExpr("cast(user_id as string) as mid", "ts")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-ckpt").toString
        val sec = timedStream(partitions = 8) { () =>
          streaming.Pipelines.dauFirstVisits(ev)
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .start()
        }
        n / sec
      }
    }
    val streamRate = try dauRate() catch { case _: Throwable => -1.0 }
    // the same pipeline on the RocksDB state store — the provider the
    // engine would run on at 1e9-key scale (GraftSession.streamingTune
    // default for the drive mains); benchmark both so a store-side
    // regression is visible. providerClass is a runtime SQL conf pinned
    // into each query's checkpoint at first batch, so flipping it
    // between fully-stopped queries is safe.
    val streamRateRocks = try {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try dauRate()
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } catch { case _: Throwable => -1.0 }
    // stream-stream interval join throughput (the reference's DWS core,
    // J1/W1): lineitem+orders as two file streams through
    // Pipelines.orderWideJoin. The corpus's synthetic ship/order dates
    // are ±2400 days apart, so event time derives from the join key on
    // both sides (same value → pairs land inside the 20 s skew window) —
    // the state-store insert/range-probe/watermark path is exercised
    // with the real 1:N key distribution; only the timestamps are
    // manufactured. Rows/sec over total input rows; joined-row count is
    // accumulated and a zero-match run reports -1 instead of a rate.
    val streamJoinRate: Double = try {
      import org.apache.spark.sql.functions._
      val nIn = spark.read.parquet(s"$sfDir/lineitem.parquet").count() +
        spark.read.parquet(s"$sfDir/orders.parquet").count()
      def keyTime(key: org.apache.spark.sql.Column) =
        timestamp_seconds(lit(1700000000L) + key % 86400)
      import spark.implicits._
      val oi = streamOf("orders").select(
        col("o_orderkey").as("id"), col("o_custkey").as("user_id"),
        lit(0L).as("province_id"), col("o_orderstatus").as("order_status"),
        col("o_totalprice").as("final_total_amount"),
        col("o_totalprice").as("original_total_amount"),
        keyTime(col("o_orderkey")).as("create_time")).as[streaming.OrderInfo]
      val od = streamOf("lineitem").select(
        xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey")).as("id"),
        col("l_orderkey").as("order_id"), col("l_partkey").as("sku_id"),
        col("l_quantity").cast("long").as("sku_num"),
        col("l_extendedprice").as("order_price"),
        keyTime(col("l_orderkey")).as("create_time")).as[streaming.OrderDetail]
      best2 { () =>
        val acc = spark.sparkContext.longAccumulator("graft-bench-joined")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-jckpt").toString
        val sec = timedStream(partitions = 16) { () =>
          streaming.Pipelines.orderWideJoin(oi, od)
            .writeStream
            .foreachBatch((b: org.apache.spark.sql.Dataset[streaming.OrderWide], _: Long) =>
              acc.add(b.count()))
            .option("checkpointLocation", ckpt)
            .start()
        }
        if (acc.value == 0L) -1.0 else nIn / sec
      }
    } catch { case _: Throwable => -1.0 }
    // streaming CDC apply (q30's incremental twin): keyed
    // flatMapGroupsWithState over the full events stream — the
    // last-writer-wins state-update path with one state row per key.
    val streamCdcRate: Double = try {
      val n = Tables.events(spark, sfDir).count()
      best2 { () =>
        val ev = Tables.normalizeEventTs(streamOf("events"))
        // processed-rows guard (the join bench's accumulator pattern): an
        // empty/misconfigured stream must report the -1 sentinel, not an
        // inflated n/sec over near-zero wall time
        val acc = spark.sparkContext.longAccumulator("graft-bench-cdc")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-cckpt").toString
        val sec = timedStream(partitions = 8) { () =>
          streaming.Pipelines.cdcApplyStream(ev)
            .writeStream
            .foreachBatch((b: org.apache.spark.sql.Dataset[streaming.CdcRow], _: Long) =>
              acc.add(b.count()))
            .option("checkpointLocation", ckpt)
            .start()
        }
        if (acc.value == 0L) -1.0 else n / sec
      }
    } catch { case _: Throwable => -1.0 }
    val suspectJson = suspectQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""n_queries":${results.size},"failed":$failed,""" +
      s""""load_suspect":${suspectQueries.nonEmpty},""" +
      s""""suspect_queries":$suspectJson,""" +
      s""""stream_dau_rows_per_sec":${streamRate.toLong},""" +
      s""""stream_dau_rocksdb_rows_per_sec":${streamRateRocks.toLong},""" +
      s""""stream_join_rows_per_sec":${streamJoinRate.toLong},""" +
      s""""stream_cdc_apply_rows_per_sec":${streamCdcRate.toLong},"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: sbt prefixes stdout with [info] and appends its
    // own trailer lines, which can defeat a last-line JSON parse — leave
    // a clean copy on disk next to the build too
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}

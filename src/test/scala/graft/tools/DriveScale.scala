package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** State-store scale ladder (RocksDB): pushes the O(keys)-state
  * streaming operators — DAU dedup (`dauFirstVisits`), CDC apply
  * (`cdcApplyStream`), and the transition extractor
  * (`transitionStream`, O(users) keyed last-event state — the r16
  * verdict's last unmeasured stateful axis) — to 10^5 → 10^7 DISTINCT
  * KEYS and records throughput + state-store size at each rung, so the
  * "constant per-key state" claims carry measured points instead of
  * comments (SCALE.md is authored from this output).
  *
  * Key-space scaling, not row replication: state size is driven by
  * distinct keys, so the ladder generates one event per key (the
  * worst case for state growth per input row — every row inserts).
  * The transitions rung feeds TWO events per key (one event emits no
  * transition — both the state fill and the emission path must be in
  * the measured window). The feed is file-edged parquet like the
  * bench streams.
  *
  * Two store-shaped rungs ride the same ladder:
  *   - `components` (r17 verdict Next #5): synthetic star-component
  *     edges (`keys` = edge count) fed in 8 micro-batches through
  *     `componentsMaintainQuery` at recompute cadence 4 — prices the
  *     maintain loop's edge-landing throughput, the per-recompute
  *     wall (timed separately over the final maintained store), and
  *     the at-rest store size.
  *   - `cms_fold` (r17 verdict Next #4): the maintained-CMS fold's
  *     payoff measured where it exists — `keys`/2000 micro-batches
  *     (default ladder rung 512000 → 256 unfolded `batch_id=`
  *     partitions) through `cmsMaintainQuery` with the in-loop fold
  *     OFF, serve timed against the unfolded store, then folded to
  *     base + serve re-timed: the pair quantifies what bounded file
  *     count buys a long-running stream.
  *
  * `Test/runMain graft.tools.DriveScale [keys ...]
  *   [dau|cdc_apply|transitions|components|cms_fold ...]`
  * (default ladder 100000 1000000 10000000, all of dau/cdc_apply/
  * transitions; naming pipeline selectors restricts the run — a 3e8
  * cdc-only rung must not pay for a dau rung it already has.
  * components/cms_fold run only when named, with their own default
  * rungs: `components` 1000000 10000000, `cms_fold` 512000.)
  */
object DriveScale {
  private val selectors =
    Set("dau", "cdc_apply", "transitions", "components", "cms_fold")
  def main(args: Array[String]): Unit = {
    val pipeSel = args.filter(a => !a.forall(_.isDigit)).toSet
    val numeric = args.filter(_.forall(_.isDigit)).toSeq
    require(pipeSel.subsetOf(selectors),
      s"unknown pipeline selector(s): ${pipeSel -- selectors}")
    def want(name: String): Boolean = pipeSel.isEmpty || pipeSel(name)
    val ladder = if (numeric.nonEmpty) numeric.map(_.toLong)
                 else Seq(100000L, 1000000L, 10000000L)
    val spark = GraftSession.streamingTune(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("stateStore provider = " +
      spark.conf.get("spark.sql.streaming.stateStore.providerClass"))

    def events(n: Long): DataFrame =
      spark.range(n).select(
        col("id").as("event_id"),
        col("id").as("user_id"),
        timestamp_seconds(lit(1700000000L) + col("id") % 3600).as("ts"),
        element_at(array(lit("click"), lit("view"), lit("purchase")),
          (col("id") % 3 + 1).cast("int")).as("event_type"),
        (col("id") % 100).cast("double").as("value"),
        concat(lit("{\"k\":"), (col("id") % 5).cast("string"), lit("}")).as("props"))

    // two time-ordered events per user (occurrence blocks are disjoint
    // in ts, so per-user order is (occurrence 0, occurrence 1) under
    // the extractor's (ts, event_id) sort) — each user fills one state
    // row AND emits one transition
    def transEvents(keys: Long): DataFrame =
      spark.range(2 * keys).select(
        col("id").as("event_id"),
        (col("id") % keys).as("user_id"),
        timestamp_seconds(lit(1700000000L) + (col("id") / keys) * 3600
          + col("id") % 3600).as("ts"),
        element_at(array(lit("click"), lit("view"), lit("purchase")),
          (col("id") % 3 + 1).cast("int")).as("event_type"),
        (col("id") % 100).cast("double").as("value"),
        concat(lit("{\"k\":"), (col("id") % 5).cast("string"), lit("}")).as("props"))

    def run(name: String, keys: Long, input: DataFrame, nRows: Long)(
        pipe: DataFrame => DataFrame): Unit = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-scale-$name").toString
      input.repartition(32).write.mode("overwrite").parquet(s"$dir/in")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$dir/in").schema).parquet(s"$dir/in")
      val t0 = System.nanoTime()
      val q = pipe(src).writeStream.format("noop")
        .option("checkpointLocation", s"$dir/ckpt").start()
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      // state metrics from the progress log: max rows ever reported and
      // the matching store-size custom metrics (RocksDB SST bytes)
      val sos = q.recentProgress.flatMap(_.stateOperators)
      q.stop()
      val rows = if (sos.isEmpty) -1L else sos.map(_.numRowsTotal).max
      val bytes = if (sos.isEmpty) -1L else sos.map(_.memoryUsedBytes).max
      val sst = sos.flatMap(so => Option(so.customMetrics)
        .map(m => Option(m.get("rocksdbSstFileSize")).map(_.longValue).getOrElse(0L)))
        .foldLeft(0L)(math.max)
      println(f"SCALE $name%-11s keys=$keys%9d rows=$nRows%9d sec=$sec%8.1f " +
        f"rows_per_sec=${(nRows / sec).toLong}%8d state_rows=$rows%9d " +
        f"state_mem_bytes=$bytes%12d sst_bytes=$sst%12d")
      // tmp hygiene at 1e7-key scale: drop the ~200 MB input + checkpoint
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      } catch { case _: Throwable => () }
    }

    // star-component edge feed: component c = 1 center + (compSize-1)
    // leaves, an edge (center, leaf) per leaf — diameter 2, so the
    // min-label recompute converges in 2 iterations and the rung
    // prices the LOOP shape (edge landing + fold + recompute joins),
    // not an adversarial diameter
    // `/` on columns is DOUBLE division — cast to long for the floor,
    // or every edge mints its own center and the stars degrade to pairs
    def starEdges(nEdges: Long, compSize: Long = 100L): DataFrame =
      spark.range(nEdges).select(
        concat(lit("c"),
          (col("id") / compSize).cast("long").cast("string")).as("src"),
        concat(lit("n"), col("id").cast("string")).as("dst"))

    def dirBytes(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(dir))
    }

    // the componentsMaintainQuery rung (r17 verdict Next #5): 8
    // micro-batches at recompute cadence 4 (recomputes at batch ids 0
    // and 4 — the web-scale dial exercised at scale), then ONE timed
    // recompute over the final maintained store for the per-recompute
    // wall the loop pays at each cadence trigger
    def runComponents(nEdges: Long): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft-scale-cc").toString
      starEdges(nEdges).repartition(8).write.mode("overwrite").parquet(s"$dir/in")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$dir/in").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val t0 = System.nanoTime()
      val q = graft.streaming.Runner.componentsMaintainQuery(spark,
        s"$dir/graph", src, s"$dir/ckpt",
        compactEveryBatches = 4, recomputeEveryBatches = 4)
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      val labeled = spark.read.parquet(s"$dir/graph/labels").count()
      val storeBytes = dirBytes(s"$dir/graph/edges")
      val tR = System.nanoTime()
      val relabeled = graft.operators.GraphOps.minLabelComponents(
        graft.operators.GraphOps.maintainedEdges(spark, s"$dir/graph/edges"),
        maxIters = 8).count()
      val recomputeSec = (System.nanoTime() - tR) / 1e9
      println(f"SCALE components  keys=$nEdges%9d rows=$nEdges%9d sec=$sec%8.1f " +
        f"rows_per_sec=${(nEdges / sec).toLong}%8d labeled=$labeled%9d " +
        f"recompute_sec=$recomputeSec%6.1f relabeled=$relabeled%9d " +
        f"edges_store_bytes=$storeBytes%12d")
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      } catch { case _: Throwable => () }
    }

    // the maintained-CMS fold payoff (r17 verdict Next #4): nDocs/2000
    // batches land UNFOLDED (compactEveryBatches = 0), the serve (the
    // t35 probe estimator over maintainedCms) is timed against the
    // many-partition store, then the store folds to base and the serve
    // is re-timed — the file-count gap the in-loop fold prevents
    def runCmsFold(nDocs: Long): Unit = {
      val perBatch = 2000L
      val nBatches = (nDocs / perBatch).toInt
      val dir = java.nio.file.Files.createTempDirectory("graft-scale-cms").toString
      spark.range(nDocs).select(
        concat(lit("tok"), (col("id") % 1000).cast("string"), lit(" common "),
          lit("tok"), (col("id") % 37).cast("string")).as("text"))
        .repartition(nBatches).write.mode("overwrite").parquet(s"$dir/in")
      val src = spark.readStream
        .schema(spark.read.parquet(s"$dir/in").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      val t0 = System.nanoTime()
      val q = graft.streaming.Runner.cmsMaintainQuery(spark, s"$dir/cms", src,
        s"$dir/ckpt", compactEveryBatches = 0)
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      val probes = Seq("tok1", "tok36", "common", "zzz_absent")
      def serveSec(): Double = (1 to 3).map { _ =>
        val t = System.nanoTime()
        graft.operators.TextOps.cmsEstimateFrom(spark,
          graft.operators.TextOps.maintainedCms(spark, s"$dir/cms"),
          probes, depth = 4, width = 512).collect()
        (System.nanoTime() - t) / 1e9
      }.min
      val partsBefore = graft.sources.BatchFold.batchDirCount(spark, s"$dir/cms")
      val bytesBefore = dirBytes(s"$dir/cms")
      val serveUnfolded = serveSec()
      graft.operators.TextOps.foldMaintainedCms(spark, s"$dir/cms",
        excludeBatchId = Long.MaxValue)
      val partsAfter = graft.sources.BatchFold.batchDirCount(spark, s"$dir/cms")
      val bytesAfter = dirBytes(s"$dir/cms")
      val serveFolded = serveSec()
      println(f"SCALE cms_fold    keys=$nDocs%9d rows=$nDocs%9d sec=$sec%8.1f " +
        f"rows_per_sec=${(nDocs / sec).toLong}%8d " +
        f"parts_unfolded=$partsBefore%4d serve_unfolded_sec=$serveUnfolded%7.3f " +
        f"parts_folded=$partsAfter%4d serve_folded_sec=$serveFolded%7.3f " +
        f"store_bytes_unfolded=$bytesBefore%10d store_bytes_folded=$bytesAfter%10d")
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      } catch { case _: Throwable => () }
    }

    ladder.foreach { k =>
      if (want("dau"))
        run("dau", k, events(k), k)(ev => graft.streaming.Pipelines.dauFirstVisits(
          ev.selectExpr("cast(user_id as string) as mid", "ts")))
      if (want("cdc_apply"))
        run("cdc_apply", k, events(k), k)(ev =>
          graft.streaming.Pipelines.cdcApplyStream(ev).toDF())
      if (want("transitions"))
        run("transitions", k, transEvents(k), 2 * k)(ev =>
          graft.streaming.Pipelines.transitionStream(ev).toDF())
    }
    // store-shaped rungs run only when NAMED (their own default rungs)
    if (pipeSel("components"))
      (if (numeric.nonEmpty) ladder else Seq(1000000L, 10000000L))
        .foreach(runComponents)
    if (pipeSel("cms_fold"))
      (if (numeric.nonEmpty) ladder else Seq(512000L)).foreach(runCmsFold)
    // exit WITHOUT spark.stop() (r17 verdict Next #6): the RocksDB JNI
    // finalizers segfaulted AFTER the metrics line at the 1e8/3e8 rungs,
    // and the Bench exit-path measurement on this tree showed the native
    // abort (std::bad_alloc, exit 134) firing INSIDE spark.stop()'s
    // state-store unload — so stopping Spark is itself the hazard. All
    // metrics lines are printed and every query stopped by its own rung;
    // halt(0) after a flush ends the run with the exit code the
    // measurements earned and lets the OS reclaim the native side.
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}

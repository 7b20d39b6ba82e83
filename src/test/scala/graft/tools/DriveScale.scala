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
  * `Test/runMain graft.tools.DriveScale [keys ...]
  *   [dau|cdc_apply|transitions ...]`
  * (default ladder 100000 1000000 10000000, all pipelines; naming
  * pipeline selectors restricts the run — a 3e8 cdc-only rung must
  * not pay for a dau rung it already has)
  */
object DriveScale {
  def main(args: Array[String]): Unit = {
    val pipeSel = args.filter(a => !a.forall(_.isDigit)).toSet
    val numeric = args.filter(_.forall(_.isDigit)).toSeq
    require(pipeSel.subsetOf(Set("dau", "cdc_apply", "transitions")),
      s"unknown pipeline selector(s): ${pipeSel -- Set("dau", "cdc_apply", "transitions")}")
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
    spark.stop()
  }
}

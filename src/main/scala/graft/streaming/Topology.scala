package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's LAYERED pipeline as one running topology — its real
  * deployment shape: eleven apps chained through Kafka topics
  * (`ods/BaseDBCanalApp.scala` routes → `dwd/OrderInfoApp.scala` /
  * `OrderDetailApp.scala` parse → `dws/OrderWideApp.scala`
  * joins+apportions → `ads/TrademarkStatApp.scala` aggregates
  * exactly-once). Here each topic edge is a FileStreamSink parquet
  * directory: the sink's `_spark_metadata` commit log makes the
  * downstream FileStreamSource read exactly the committed files — the
  * supported exactly-once chaining for file edges (a Kafka deployment
  * swaps each edge for `format("kafka")`, pipeline code unchanged).
  *
  * Three concurrent streaming queries in one session:
  *   1. router: CDC JSON lines → (topic, value) parquet, partitioned
  *      by topic ([[Pipelines.routeCdc]]);
  *   2. wide: routed stream → typed order header/detail parse →
  *      watermarked interval join → stateful apportionment
  *      ([[Pipelines.orderWideJoin]] + [[Pipelines.apportion]]);
  *   3. agg: order-wide stream → per-batch-refreshed sku dim join →
  *      trademark revenue in integer cents, landed per batch_id with
  *      dynamic partition overwrite (the K5 idempotent-sink recipe).
  */
object Topology {

  /** Maxwell-shaped CDC JSON-lines fixture derived from the TPC-H
    * corpus at `sfDir` (the FIXTURES.md §3 mapping): one order_detail
    * insert per lineitem priced at cents(extendedprice × (1−discount))
    * with sku_num = 1, and one order_info insert per order whose
    * final == original == Σ its details — so the apportionment's
    * integer-cents share of every detail equals the detail itself, and
    * the chain's trademark totals must equal the BATCH trademark query
    * (GmallQueries.trademarkStat) over the same corpus, cent for cent.
    * Both sides' create_time derives from the order key (same value →
    * inside the join's skew window — the Bench stream-join convention).
    * Returns the number of CDC lines written. */
  def writeCdcFixture(spark: SparkSession, sfDir: String, outDir: String): Long = {
    val ts = date_format(timestamp_seconds(
      lit(1700000000L) + pmod(col("order_id"), lit(86400L))), "yyyy-MM-dd HH:mm:ss")
    val det = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("order_id"),
      xxhash64(col("l_orderkey"), col("l_linenumber"), col("l_partkey")).as("id"),
      col("l_partkey").as("sku_id"),
      Tables.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("amt_c"))
    val detLines = det.select(to_json(struct(
      lit("insert").as("type"), lit("order_detail").as("table"),
      struct(col("id"), col("order_id"), col("sku_id"),
        lit(1L).as("sku_num"),
        Tables.dollars(col("amt_c")).as("order_price"),
        ts.as("create_time")).as("data"))).as("value"))
    val oiLines = det.groupBy(col("order_id")).agg(sum(col("amt_c")).as("tot_c"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey")),
        col("order_id") === col("o_orderkey"))
      .select(to_json(struct(
        lit("insert").as("type"), lit("order_info").as("table"),
        struct(col("order_id").as("id"), col("o_custkey").as("user_id"),
          lit(0L).as("province_id"), lit("1001").as("order_status"),
          Tables.dollars(col("tot_c")).as("final_total_amount"),
          Tables.dollars(col("tot_c")).as("original_total_amount"),
          ts.as("create_time")).as("data"))).as("value"))
    detLines.unionByName(oiLines).write.mode("overwrite").text(outDir)
    spark.read.text(outDir).count()
  }

  /** The three running queries. [[drain]] propagates everything
    * currently visible END-TO-END: each stage's processAllAvailable
    * commits its output files (and sink metadata) before the next
    * stage's is called, so one sweep in chain order drains the whole
    * topology. Queries keep running between drains — feed more input
    * and drain again. */
  final case class Chain(router: StreamingQuery, wide: StreamingQuery,
                         agg: StreamingQuery) {
    def drain(): Unit = {
      router.processAllAvailable()
      wide.processAllAvailable()
      agg.processAllAvailable()
    }
    def stopAll(): Unit = { agg.stop(); wide.stop(); router.stop() }
  }

  /** Start the topology. Stages start in chain order with one drain
    * between starts: a FileStreamSource decides "is this directory a
    * FileStreamSink output?" when it first resolves, so each
    * downstream source must be created AFTER its upstream sink has
    * committed a batch (else it would fall back to plain directory
    * listing and could observe in-progress files). `loadSkuDim` is
    * re-invoked every agg micro-batch — the reference's per-batch dim
    * refresh (S5/J2). Triggers default to ASAP so drains are not paced
    * by a processing-time trigger; `triggerInterval` (e.g. "5 seconds")
    * switches every stage onto the reference's batch clock — the
    * local[4] parity measurement (BASELINE.md's derived latency
    * target) runs the chain under the reference's own
    * `Seconds(5)`/local[4] envelope. */
  def start(spark: SparkSession, cdcDir: String, routedDir: String,
            wideDir: String, aggDir: String, ckptRoot: String,
            loadSkuDim: () => DataFrame,
            triggerInterval: Option[String] = None): Chain = {
    import spark.implicits._
    def paced[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T]) =
      triggerInterval.fold(w)(i => w.trigger(Trigger.ProcessingTime(i)))
    val router = paced(Pipelines.routeCdc(
      spark.readStream.schema(Runner.cdcSchema).json(cdcDir))
      .writeStream.outputMode("append").format("parquet")
      .partitionBy("topic")
      .option("path", routedDir)
      .option("checkpointLocation", s"$ckptRoot/router"))
      .start()
    router.processAllAvailable() // commit sink metadata before stage 2 resolves
    val routedSchema = StructType(Seq(
      StructField("value", StringType), StructField("topic", StringType)))
    val routed = spark.readStream.schema(routedSchema)
      .option("basePath", routedDir).parquet(routedDir)
    val oi = routed.filter(col("topic") === "ods_order_info")
      .select(from_json(col("value"), Runner.orderInfoSchema).as("o"))
      .select("o.*").as[OrderInfo]
    val od = routed.filter(col("topic") === "ods_order_detail")
      .select(from_json(col("value"), Runner.orderDetailSchema).as("o"))
      .select("o.*").as[OrderDetail]
    // state TTL off: the drive/bench drains must settle (a
    // ProcessingTimeTimeout schedules timeout-only batches forever)
    val wide = paced(
      Pipelines.apportion(Pipelines.orderWideJoin(oi, od), stateTtlMs = 0)
        .writeStream.outputMode("append").format("parquet")
        .option("path", wideDir)
        .option("checkpointLocation", s"$ckptRoot/wide"))
      .start()
    wide.processAllAvailable() // commit before stage 3 resolves
    val wideSchema = Encoders.product[OrderWideSplit].schema
    val agg = paced(spark.readStream.schema(wideSchema).parquet(wideDir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$ckptRoot/agg")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.join(broadcast(loadSkuDim()),
            batch("sku_id") === col("p_partkey"))
          .groupBy(col("p_brand").as("tm_name"))
          .agg(sum(Tables.cents(col("final_detail_amount"))).as("amount_c"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(aggDir)
      })
      .start()
    Chain(router, wide, agg)
  }

  /** The chain's final answer: trademark revenue in integer cents,
    * summed across batch emissions (per-batch groups are disjoint
    * detail sets, and replays overwrite their own batch_id partition,
    * so the sum is exact). */
  def trademarkTotals(spark: SparkSession, aggDir: String): DataFrame =
    spark.read.parquet(aggDir)
      .groupBy(col("tm_name"))
      .agg(sum(col("amount_c")).as("amount_c"))

  /** Busy-trigger latency of one paced parity run ([[pacedParity]]):
    * max/mean `triggerExecution` over all BUSY triggers (numInputRows
    * > 0 — idle ticks are bookkeeping) of all three stages, how many
    * exceeded the trigger budget, and whether the chain's final totals
    * passed the cent-for-cent gate (a latency number from a chain that
    * got the answer wrong is not a parity result). `triggers` is the
    * per-trigger attribution ledger — (stage, batchId, startEpochMs,
    * durationMs) for every busy trigger — so a single over-budget
    * trigger can be PINNED to a named stage/batch (bootstrap? fold?
    * dim refresh?) instead of recurring unattributed across rounds
    * (the r16 verdict's ask). Start times ride along because the three
    * stages' batch COUNTERS drift (a drained stage ticks fewer busy
    * batches), so cross-stage correlation must align by wall-clock
    * overlap, not batch id — measured r17 run 6: wide's batch 12
    * ran concurrently with agg's batch 9. */
  final case class PacedParity(maxMs: Long, meanMs: Long, overBudget: Int,
                               busyTriggers: Int, gatePass: Boolean,
                               triggers: Seq[(String, Long, Long, Long)] = Nil)

  /** Mechanical attribution of over-budget busy triggers (the r16
    * verdict's ask, informed by the r17 ledgers): every breach falls in
    * one of three classes, so a recurring "1-of-36 over" is never an
    * anonymous tail again. Returns (bootstrap, correlated, isolated)
    * counts over `obs` = the (stage, batchId, ms) ledger.
    *
    *  - BOOTSTRAP: the stage's FIRST busy trigger — it carries the
    *    one-time costs (whole-stage codegen of the join/state plan,
    *    first state-store open, first dim broadcast) every stage pays
    *    exactly once; the reference's DStream apps pay the same
    *    first-batch cost, so a bootstrap breach is not a steady-state
    *    parity violation (measured r17 run 3: wide:0 at 5 986 ms with
    *    a 2 400 ms steady median — the recurring r16 singleton, now
    *    named).
    *  - CORRELATED, two signatures: (a) the breach belongs to a
    *    TIME-CLUSTER of non-first breaches spanning ≥ 2 DISTINCT
    *    stages — section-wide sustained load (measured r17 run 9:
    *    router+wide+agg all breached while the load inflated every
    *    stage's own median, so pairwise evidence self-defeats; a
    *    single-stage code regression cannot breach the OTHER stages'
    *    budgets). Clusters are the connected components of the
    *    non-first breaches under wall-clock NEARNESS — intervals
    *    overlapping or within one trigger budget of each other,
    *    transitively, so a sustained-load window whose per-stage
    *    breaches are sparse still chains into one cluster — and the
    *    ≥ 2-stage requirement is therefore temporally gated (ADVICE
    *    r17): two independent single-stage regressions minutes apart
    *    sit in separate single-stage clusters and can no longer
    *    launder each other out of `isolated`. Or (b) a single-stage
    *    cluster where some OTHER stage's non-first trigger whose
    *    wall-clock interval OVERLAPS the breach ran > 2× that stage's
    *    own median — the shorter capacity blip (measured r17 run 2: a
    *    ~20 s window ran 2–8× median across all stages, bracketed by
    *    quiet anchors). Overlap is by time, not batch id: the stages'
    *    batch counters drift (r17 run 6's drain tail ran wide batch 12
    *    concurrently with agg batch 9).
    *  - ISOLATED: everything else — ONE stage over budget while its
    *    concurrent neighbors sit at their medians. THIS is the class
    *    that means a code regression; the others are
    *    environment/bootstrap. (Limitation, documented: an
    *    infrastructure regression slowing ≥ 2 stages past the budget
    *    INSIDE one time window still reads correlated — but such a
    *    change also moves the mean/max parity fields and the
    *    round-over-round comparison, which is where a cross-cutting
    *    regression is caught.)
    *
    * `obs` rows are (stage, batchId, startEpochMs, durationMs); a
    * startEpochMs < 0 means the progress timestamp did not parse
    * (ADVICE r17) — such rows keep their durations in the medians but
    * carry no wall-clock position, so they never serve as nearness or
    * overlap EVIDENCE, and an unparseable breach itself falls back to
    * the non-temporal ≥ 2-breached-stages rule rather than reading
    * falsely isolated. */
  def classifyOverBudget(obs: Seq[(String, Long, Long, Long)],
                         budgetMs: Long): (Int, Int, Int) = {
    if (obs.isEmpty) return (0, 0, 0)
    def median(xs: Seq[Long]): Long = { val s = xs.sorted; s(s.size / 2) }
    val byStage = obs.groupBy(_._1)
    val med = byStage.map { case (st, v) => st -> median(v.map(_._4)) }
    val first = byStage.map { case (st, v) => st -> v.map(_._2).min }
    // the section-wide-load evidence pool: NON-FIRST breaches
    // (bootstraps never count) with a usable wall-clock position
    val pool = obs.filter { case (st, bid, t0, dur) =>
      dur > budgetMs && bid != first(st) && t0 >= 0 }.toIndexedSeq
    def near(a: (String, Long, Long, Long), b: (String, Long, Long, Long)): Boolean =
      a._3 < b._3 + b._4 + budgetMs && b._3 < a._3 + a._4 + budgetMs
    // connected components of the pool under nearness (ledgers are
    // tiny — label propagation to a fixed point is fine)
    val cluster = Array.tabulate(pool.size)(identity)
    var moved = true
    while (moved) {
      moved = false
      for (i <- pool.indices; j <- pool.indices
           if cluster(i) != cluster(j) && near(pool(i), pool(j))) {
        val m = math.min(cluster(i), cluster(j))
        cluster(i) = m; cluster(j) = m; moved = true
      }
    }
    val clusterStages = pool.indices.groupBy(cluster)
      .map { case (c, is) => c -> is.map(pool(_)._1).distinct.size }
    val poolIdx = pool.zipWithIndex.toMap
    // the pre-temporal-gate breadth count, kept ONLY as the fallback
    // for breaches with no wall-clock position
    val breachedStages = obs.collect {
      case (st, bid, _, dur) if dur > budgetMs && bid != first(st) => st
    }.distinct.size
    var (nBoot, nCorr, nIso) = (0, 0, 0)
    obs.filter(_._4 > budgetMs).foreach { case o @ (st, bid, t0, dur) =>
      if (bid == first(st)) nBoot += 1
      else {
        val breadth =
          if (t0 >= 0) poolIdx.get(o).exists(i => clusterStages(cluster(i)) >= 2)
          else breachedStages >= 2 // no wall-clock position: non-temporal rule
        val blip = t0 >= 0 && obs.exists { case (st2, bid2, t2, ms2) =>
          st2 != st && bid2 != first(st2) && t2 >= 0 &&
            t2 < t0 + dur && t2 + ms2 > t0 && // wall-clock overlap
            ms2 > 2 * med(st2)
        }
        if (breadth || blip) nCorr += 1 else nIso += 1
      }
    }
    (nBoot, nCorr, nIso)
  }

  /** The reference-envelope parity measurement (BASELINE.md's derived
    * latency target), shared by Bench's `stream_topology_local4_*`
    * fields and the manual `DriveTopology <sfDir> <triggerSec>` mode:
    * the reference runs every app on a `Seconds(triggerSec)` batch
    * clock at local[4], so drive THIS chain on a processing-time
    * trigger with the fixture arriving continuously — one
    * TIME-MONOTONIC slice per interval from the caller's thread, the
    * ordered-Kafka arrival shape (shuffled slicing would scramble
    * event time across batches and the watermark would correctly drop
    * the stragglers) — and report each busy trigger's wall against the
    * interval budget: parity holds iff busy triggers finish inside the
    * interval (DStream's batch-time < batch-interval stability
    * condition). Run on a session built with
    * [[graft.GraftSession.localStreamingCpus]](…, 4) for the
    * reference's core count. */
  def pacedParity(spark: SparkSession, sfDir: String, triggerSec: Int,
                  nSlices: Int = 12): PacedParity = {
    val root = java.nio.file.Files.createTempDirectory("graft-paced").toString
    val fixDir = s"$root/fixture"; val cdcDir = s"$root/cdc"
    val n = writeCdcFixture(spark, sfDir, fixDir)
    new java.io.File(cdcDir).mkdirs()
    def sliceFiles(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    def feed(fs: Array[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(cdcDir, f.getName))
    }
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"))
    spark.read.text(fixDir)
      .withColumn("ts", get_json_object(col("value"), "$.data.create_time"))
      .withColumn("slice",
        (((row_number().over(w) - 1) * nSlices) / n).cast("int"))
      .select("value", "slice")
      .write.partitionBy("slice").text(s"$root/slices")
    // slice dirs reuse one task's part-file name — uniquify on move
    val slices = (0 until nSlices).toArray.flatMap(i =>
      sliceFiles(s"$root/slices/slice=$i").map { f =>
        val named = new java.io.File(f.getParent, s"s$i-${f.getName}")
        java.nio.file.Files.move(f.toPath, named.toPath); named
      })
    feed(slices.take(1))
    val chain = start(spark, cdcDir,
      s"$root/routed", s"$root/wide", s"$root/agg", s"$root/ckpt",
      () => Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand")),
      triggerInterval = Some(s"$triggerSec seconds"))
    slices.drop(1).foreach { f =>
      Thread.sleep(triggerSec * 1000L); feed(Array(f))
    }
    chain.drain()
    // settle one more cycle so the tail batches' progress is recorded
    Thread.sleep(triggerSec * 1000L); chain.drain()
    val obs = Seq("router" -> chain.router, "wide" -> chain.wide,
        "agg" -> chain.agg).flatMap { case (stage, q) =>
      q.recentProgress.toSeq.filter(_.numInputRows > 0)
        .flatMap { p =>
          // -1 = unparseable (ADVICE r17): a 0 here would be a LEGAL
          // epoch and silently corrupt classifyOverBudget's wall-clock
          // tests; the sentinel keeps the duration in the ms stats
          // while excluding the row from overlap/nearness evidence
          val start = try java.time.Instant.parse(p.timestamp).toEpochMilli
                      catch { case _: Throwable => -1L }
          Option(p.durationMs.get("triggerExecution"))
            .map(ms => (stage, p.batchId, start, ms.toLong))
        }
    }
    val busy = obs.map(_._4)
    chain.stopAll()
    val got = trademarkTotals(spark, s"$root/agg")
    val want = graft.operators.GmallQueries.trademarkStat(spark, sfDir)
      .select(col("tm_name"), Tables.cents(col("amount")).as("amount_c"))
    val gatePass = got.count() > 0 &&
      want.exceptAll(got).count() == 0 && got.exceptAll(want).count() == 0
    if (busy.isEmpty) PacedParity(-1, -1, -1, 0, gatePass)
    else PacedParity(busy.max, busy.sum / busy.size,
      busy.count(_ > triggerSec * 1000L), busy.size, gatePass, obs)
  }
}

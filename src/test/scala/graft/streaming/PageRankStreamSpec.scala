package graft.streaming

import graft.GraftSession
import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The graph family's maintain loop (Runner.pageRankMaintainQuery +
  * Pipelines.transitionStream): over an in-order feed the maintained
  * store's ranks must equal batch q36 on the same events — across
  * batch boundaries, through the in-loop BatchFold, and under
  * re-delivery. */
class PageRankStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def canon(df: DataFrame): Set[(String, Double)] =
    df.select(col("node"), col("pr")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet

  test("maintained ranks == batch q36 across batches, folds, and re-delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // in-order feed: global (ts, event_id) order is per-user order too
    val all = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
      .sortBy(r => (r._2.getTime, r._3))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Long, String)]
    val graphDir = java.nio.file.Files.createTempDirectory("graft-prm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-prm-ckpt").toString
    val transitions = Pipelines.transitionStream(
      mem.toDF().toDF("user_id", "ts", "event_id", "event_type"))
    // threshold 3 with 6 chunks forces the fold to run mid-stream
    val q = Runner.pageRankMaintainQuery(spark, graphDir, transitions.toDF(),
      ckpt, compactEveryBatches = 3)
    try {
      val chunks = all.grouped((all.length + 5) / 6).toSeq
      chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      // re-deliver an EARLIER chunk: every row is at/before each user's
      // state, so zero transitions emit and the store must not move
      val before = canon(spark.read.parquet(s"$graphDir/ranks"))
      mem.addData(chunks(2).toSeq); q.processAllAvailable()
      val after = spark.read.parquet(s"$graphDir/ranks")
      assert(canon(after) === before)
      // the maintained totals equal the batch window's transition counts
      val streamedEdges = GraphOps.maintainedEdges(spark, s"$graphDir/edges")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batchEdges = GraphOps.transitionEdges(spark, sf)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamedEdges === batchEdges)
      // and the ranks equal batch q36 exactly
      assert(canon(after) === canon(GraphOps.eventPageRank(spark, sf)))
      // the fold bounded the partition depth: base + recent batches only
      assert(graft.sources.BatchFold.batchDirCount(spark, s"$graphDir/edges") <= 4)
    } finally q.stop()
  }

  test("recompute cadence (r17 verdict Next #1): ranks refresh only on " +
      "cadence batch ids and equal batch q36 at the final on-cadence " +
      "trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
      .sortBy(r => (r._2.getTime, r._3))
    // 5 in-order chunks with cadence 2: recomputes at batch ids 0, 2, 4
    val chunks = (0 until 5).map(i =>
      all.slice(i * all.length / 5, (i + 1) * all.length / 5).toSeq)
    assert(chunks.forall(_.nonEmpty))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Long, String)]
    val graphDir = java.nio.file.Files.createTempDirectory("graft-prm3").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-prm3-ck").toString
    val q = Runner.pageRankMaintainQuery(spark, graphDir,
      Pipelines.transitionStream(
        mem.toDF().toDF("user_id", "ts", "event_id", "event_type")).toDF(),
      ckpt, recomputeEveryBatches = 2)
    def ranks() = spark.read.parquet(s"$graphDir/ranks")
    def stamp(): Long = {
      val ids = ranks().select(col("batch_id")).distinct().collect()
        .map(_.getLong(0))
      assert(ids.length === 1); ids.head
    }
    try {
      mem.addData(chunks(0)); q.processAllAvailable()
      assert(stamp() === 0L)
      mem.addData(chunks(1)); q.processAllAvailable()
      // batch 1 off the cadence: edges landed, ranks did not move
      assert(stamp() === 0L)
      mem.addData(chunks(2)); q.processAllAvailable()
      assert(stamp() === 2L)
      val atBatch2 = canon(ranks())
      mem.addData(chunks(3)); q.processAllAvailable()
      // off-cadence again: byte-stable ranks, stale-but-stamped
      assert(stamp() === 2L)
      assert(canon(ranks()) === atBatch2)
      mem.addData(chunks(4)); q.processAllAvailable()
      // final chunk lands ON the cadence: ranks equal batch q36 over
      // the whole corpus
      assert(stamp() === 4L)
      assert(canon(ranks()) === canon(GraphOps.eventPageRank(spark, sf)))
    } finally q.stop()
  }

  test("same-millisecond events order by their microseconds (ADVICE r15 medium)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two events 250 us apart inside ONE millisecond: a getTime-keyed
    // fold sees a tie and falls back to event_id order — ids are
    // deliberately REVERSED so that fallback emits (B, A); the
    // compareTo fold must emit (A, B) like the batch LEAD window
    def ts(us: Long) = {
      val t = new java.sql.Timestamp(1700000000000L)
      t.setNanos((us * 1000).toInt); t
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Long, String)]
    val q = Pipelines.transitionStream(
        mem.toDF().toDF("user_id", "ts", "event_id", "event_type"))
      .writeStream.format("memory").queryName("trans_us")
      .outputMode("append").start()
    try {
      mem.addData(Seq((7L, ts(500), 9L, "A"), (7L, ts(750), 1L, "B")))
      q.processAllAvailable()
      // and a later same-ms arrival BELOW the state's micros is late:
      // dropped, no (B, C) emission, chain continues from B
      mem.addData(Seq((7L, ts(600), 2L, "C"), (7L, ts(900), 3L, "D")))
      q.processAllAvailable()
      val got = spark.table("trans_us").as[TransitionRow].collect()
        .map(t => (t.src, t.dst)).toSeq
      assert(got === Seq(("A", "B"), ("B", "D")))
    } finally q.stop()
  }

  test("a late event emits no transition and leaves the chain uncorrupted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, java.sql.Timestamp, Long, String)]
    val q = Pipelines.transitionStream(
        mem.toDF().toDF("user_id", "ts", "event_id", "event_type"))
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      mem.addData(Seq((7L, ts(10), 1L, "A"), (7L, ts(20), 2L, "B")))
      q.processAllAvailable()
      // late C (ts 15 < state's 20) must NOT emit B->C or rewind state;
      // in-order D chains from B, the true last
      mem.addData(Seq((7L, ts(15), 3L, "C"), (7L, ts(30), 4L, "D")))
      q.processAllAvailable()
      val got = spark.table("trans_out").as[TransitionRow].collect()
        .map(t => (t.src, t.dst)).toSeq.sorted
      assert(got === Seq(("A", "B"), ("B", "D")))
    } finally q.stop()
  }
}

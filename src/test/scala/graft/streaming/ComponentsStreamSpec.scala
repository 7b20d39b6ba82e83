package graft.streaming

import graft.GraftSession
import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The graph family's SECOND maintain loop
  * (Runner.componentsMaintainQuery — the pageRankMaintainQuery body
  * with the recompute swapped for GraphOps.minLabelComponents): over
  * any batching of an edge feed the maintained store's labels must
  * equal batch q37 on the same corpus — across batch boundaries,
  * through the in-loop BatchFold, and under re-delivery (components
  * depend only on edge SUPPORT, so duplicate deliveries move `w` but
  * never a label). */
class ComponentsStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def canon(df: DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("maintained labels == batch q37 across batches, folds, and re-delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val edges = GraphOps.bigramEdges(spark, sf)
      .as[(String, String)].collect().sorted
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val graphDir = java.nio.file.Files.createTempDirectory("graft-ccm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ccm-ckpt").toString
    // threshold 3 with 6 chunks forces the fold to run mid-stream
    val q = Runner.componentsMaintainQuery(spark, graphDir,
      mem.toDS().toDF("src", "dst"), ckpt, compactEveryBatches = 3)
    try {
      val chunks = edges.grouped((edges.length + 5) / 6).toSeq
      chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      val batch = canon(GraphOps.tokenComponents(spark, sf))
      assert(canon(spark.read.parquet(s"$graphDir/labels")
        .select(col("node"), col("label"))) === batch)
      // RE-DELIVER an earlier chunk: the duplicate pairs raise those
      // edges' counts (a new batch id — counts are additive by design)
      // but component membership depends only on which pairs EXIST, so
      // the recomputed labels must not move
      mem.addData(chunks(2).toSeq); q.processAllAvailable()
      assert(canon(spark.read.parquet(s"$graphDir/labels")
        .select(col("node"), col("label"))) === batch)
      // the fold bounded the partition depth: base + recent batches only
      assert(graft.sources.BatchFold
        .batchDirCount(spark, s"$graphDir/edges") <= 4)
    } finally q.stop()
  }

  test("recompute cadence (r17 verdict Next #1): labels refresh only on " +
      "cadence batch ids, equal to the batch operator AT recompute " +
      "triggers, unchanged between them, and replay keeps the decision") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val edges = GraphOps.bigramEdges(spark, sf)
      .as[(String, String)].collect().sorted
    val chunks = (0 until 4).map(i =>
      edges.slice(i * edges.length / 4, (i + 1) * edges.length / 4).toSeq)
    assert(chunks.forall(_.nonEmpty))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val graphDir = java.nio.file.Files.createTempDirectory("graft-ccm3").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ccm3-ck").toString
    val q = Runner.componentsMaintainQuery(spark, graphDir,
      mem.toDS().toDF("src", "dst"), ckpt, recomputeEveryBatches = 2)
    def labels() = spark.read.parquet(s"$graphDir/labels")
    // every recompute overwrites labels/ whole, stamped with ONE
    // producing batch id — the staleness-observability contract
    def stamp(): Long = {
      val ids = labels().select(col("batch_id")).distinct().collect()
        .map(_.getLong(0))
      assert(ids.length === 1); ids.head
    }
    def batchOver(k: Int) = canon(GraphOps.minLabelComponents(
      chunks.take(k).flatten.toDF("src", "dst"), maxIters = 8))
    try {
      mem.addData(chunks(0)); q.processAllAvailable()
      assert(stamp() === 0L) // batch 0 is on the cadence
      assert(canon(labels().select(col("node"), col("label"))) === batchOver(1))
      mem.addData(chunks(1)); q.processAllAvailable()
      // batch 1 falls OFF the cadence: edges landed, labels did not move
      assert(stamp() === 0L)
      assert(canon(labels().select(col("node"), col("label"))) === batchOver(1))
      mem.addData(chunks(2)); q.processAllAvailable()
      // batch 2 recomputes — labels equal the batch operator over
      // EVERYTHING landed so far, including the off-cadence batch 1
      assert(stamp() === 2L)
      assert(canon(labels().select(col("node"), col("label"))) === batchOver(3))
      mem.addData(chunks(3)); q.processAllAvailable()
      assert(stamp() === 2L)
      assert(canon(labels().select(col("node"), col("label"))) === batchOver(3))
      // re-delivery arrives as batch 4, ON the cadence: the recompute
      // runs over the full store, and duplicate pairs move counts but
      // never a label — full-corpus q37 exactly
      mem.addData(chunks(1)); q.processAllAvailable()
      assert(stamp() === 4L)
      assert(canon(labels().select(col("node"), col("label")))
        === canon(GraphOps.tokenComponents(spark, sf)))
    } finally q.stop()
  }

  test("empty bootstrap trigger writes nothing (the pageRank loop's guard)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val graphDir = java.nio.file.Files.createTempDirectory("graft-ccm2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ccm2-ck").toString
    val q = Runner.componentsMaintainQuery(spark, graphDir,
      mem.toDS().toDF("src", "dst"), ckpt)
    try { q.processAllAvailable() } finally q.stop()
    val edges = new java.io.File(s"$graphDir/edges")
    assert(!edges.exists() ||
      edges.listFiles().forall(_.getName.startsWith(".")))
  }
}

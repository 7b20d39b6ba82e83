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

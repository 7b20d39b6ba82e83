package graft.streaming

import graft.GraftSession
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The maintained CMS store (Runner.cmsMaintainQuery +
  * TextOps.maintainedCms / foldMaintainedCms): counters are additive,
  * so however documents are batched — and however many in-loop folds
  * run — the at-rest sums must equal the batch t34 sketch over the
  * same documents, estimates served from the store must equal the
  * in-session t35 estimates, and a replayed batch must not double any
  * counter. */
class CmsMaintainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val probes = Seq("hash", "join", "scan", "data", "zzz_absent")

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def cells(df: DataFrame): Map[(Int, Long), Long] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("maintained sums == batch t34 across batches, folds, and re-delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val cmsDir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cms-ck").toString
    // threshold 3 with 6 chunks forces the fold to run mid-stream
    val q = Runner.cmsMaintainQuery(spark, cmsDir,
      mem.toDS().toDF("doc_id", "text"), ckpt, compactEveryBatches = 3)
    try {
      val chunks = docs.grouped((docs.length + 5) / 6).toSeq
      chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      val batchSketch = cells(TextOps.cmsSketchOn(
        graft.Tables.documents(spark, sf), depth = 4, width = 512))
      assert(cells(TextOps.maintainedCms(spark, cmsDir)) === batchSketch)
      // the fold bounded the partition depth at every point past it
      assert(graft.sources.BatchFold.batchDirCount(spark, cmsDir) <= 4)
      // estimates served from the store == in-session t35
      def est(df: DataFrame) = df.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est(TextOps.cmsEstimateFrom(spark,
          TextOps.maintainedCms(spark, cmsDir), probes, 4, 512)) ===
        est(TextOps.cmsEstimate(spark, sf, probes)))
    } finally q.stop()
    // replay the in-flight batch — the only one a checkpoint re-runs:
    // re-execute the trigger body for the LAST chunk's id; dynamic
    // overwrite must rewrite that partition, never add to it
    val lastId = 5L
    val before = cells(TextOps.maintainedCms(spark, cmsDir))
    TextOps.cmsSketchOn(
        docs.grouped((docs.length + 5) / 6).toSeq.last.toSeq
          .toDF("doc_id", "text"), 4, 512)
      .withColumn("batch_id", lit(lastId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(cmsDir)
    assert(cells(TextOps.maintainedCms(spark, cmsDir)) === before,
      "a replayed batch must rewrite its partition, never double counters")
    // a manual fold of everything preserves every counter — and the
    // SERVED estimates (the cms_serve bench path: cmsEstimateFrom over
    // maintainedCms) must read identically across fold states, since
    // the fold only re-bases additive counters
    def est2(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val estLive = est2(TextOps.cmsEstimateFrom(spark,
      TextOps.maintainedCms(spark, cmsDir), probes, 4, 512))
    TextOps.foldMaintainedCms(spark, cmsDir, excludeBatchId = 999L)
    assert(cells(TextOps.maintainedCms(spark, cmsDir)) === before)
    assert(est2(TextOps.cmsEstimateFrom(spark,
        TextOps.maintainedCms(spark, cmsDir), probes, 4, 512)) === estLive,
      "estimates served from the store must not move across a fold")
  }

  test("dial drift is refused loudly; empty first trigger writes nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cmsDir = java.nio.file.Files.createTempDirectory("graft-cms2").toString
    TextOps.ensureCmsMeta(cmsDir, depth = 4, width = 512)
    val e = intercept[IllegalArgumentException] {
      TextOps.ensureCmsMeta(cmsDir, depth = 3, width = 512)
    }
    assert(e.getMessage.contains("dial mismatch"))
    // an all-empty stream leaves the store dir file-less (no meta from
    // the skipped body, no zero-row parquet): the bootstrap guard
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val dir2 = java.nio.file.Files.createTempDirectory("graft-cms3").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft-cms3-ck").toString
    val q = Runner.cmsMaintainQuery(spark, dir2,
      mem.toDS().toDF("doc_id", "text"), ck2)
    try { q.processAllAvailable() } finally q.stop()
    assert(!new java.io.File(dir2).exists() ||
      new java.io.File(dir2).listFiles().forall(_.getName.startsWith(".")))
  }
}

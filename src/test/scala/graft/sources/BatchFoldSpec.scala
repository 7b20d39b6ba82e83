package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The batch-partition fold's swap contract — the mechanics both
  * row-shaped maintained indexes (IVF, dedup intake) lean on and a
  * regression would silently corrupt: committed partitions fold into
  * the batch_id=-1 base, the excluded (replayable) batch is never
  * touched, no row is lost or duplicated, and a crash at ANY point of
  * the swap is recovered by the next [[BatchFold.recover]] — torn
  * deletes finished, incomplete stagings discarded. The torn states
  * are fabricated directly against the documented on-disk layout
  * (staging + `_folded` manifest), which IS the recovery interface. */
class BatchFoldSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.GraftSession.local("batchfold-spec")
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def writeBatch(root: String, batchId: Long, ids: Range): Unit = {
    val ss = spark; import ss.implicits._
    ids.map(i => (i.toLong, i % 4, batchId)).toDF("x", "cid", "batch_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(root)
  }

  private def stageFlat(rows: DataFrame, staging: String): Unit =
    rows.coalesce(1).write.mode("overwrite").parquet(staging)

  private def xs(root: String): Seq[Long] =
    spark.read.parquet(root).select(col("x"))
      .collect().map(_.getLong(0)).toSeq.sorted

  private def dirs(root: String): Set[String] =
    new java.io.File(root).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet

  test("fold collapses every committed batch into batch_id=-1, keeps " +
      "the excluded batch's own partition, loses and duplicates nothing") {
    val root = java.nio.file.Files.createTempDirectory("bf-basic").toString
    writeBatch(root, 0L, 0 until 10)
    writeBatch(root, 1L, 10 until 20)
    writeBatch(root, 2L, 20 until 25)
    assert(BatchFold.batchDirCount(spark, root) == 3)
    assert(BatchFold.fold(spark, root, excludeBatchId = 2L)(stageFlat) == 2)
    assert(dirs(root) == Set("batch_id=-1", "batch_id=2"))
    assert(xs(root) == (0L until 25L))
    // the base and the excluded batch carry the right SPLIT of rows
    assert(spark.read.parquet(root).filter(col("batch_id") === -1L)
      .count() == 20L)
    // a replayed in-flight batch still rewrites its own partition
    // (the exactly-once property the exclusion preserves)
    writeBatch(root, 2L, 20 until 25)
    assert(xs(root) == (0L until 25L), "replay duplicated rows")
    // the next fold absorbs the old base itself
    assert(BatchFold.fold(spark, root, excludeBatchId = 3L)(stageFlat) == 2)
    assert(dirs(root) == Set("batch_id=-1"))
    assert(xs(root) == (0L until 25L))
  }

  test("fold with nothing but the excluded batch is a no-op; a missing " +
      "root counts zero and folds zero") {
    val root = java.nio.file.Files.createTempDirectory("bf-noop").toString
    assert(BatchFold.batchDirCount(spark, s"$root/absent") == 0)
    assert(BatchFold.fold(spark, s"$root/absent", 0L)(stageFlat) == 0)
    writeBatch(root, 5L, 0 until 3)
    assert(BatchFold.fold(spark, root, excludeBatchId = 5L)(stageFlat) == 0)
    assert(dirs(root) == Set("batch_id=5"))
  }

  test("recovery finishes a swap torn mid-move: manifested dirs still " +
      "present move aside, already-moved ones are skipped, the staged " +
      "base renames in, the trash is dropped, reruns are idempotent") {
    val root = java.nio.file.Files.createTempDirectory("bf-torn").toString
    writeBatch(root, 0L, 0 until 10)
    writeBatch(root, 1L, 10 until 20)
    writeBatch(root, 2L, 20 until 25)
    // fabricate the post-manifest, mid-move crash state the fold
    // documents: staged base complete (batches 0+1), manifest present,
    // batch 0 already moved aside into the trash, batch 1 still on disk
    val staging = s"$root/.staging-fold"
    spark.read.parquet(root).filter(col("batch_id") =!= 2L)
      .drop("batch_id").coalesce(1)
      .write.mode("overwrite").parquet(staging)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$staging/_folded"),
      "batch_id=0\nbatch_id=1\n".getBytes("UTF-8"))
    new java.io.File(s"$root/.trash-fold").mkdirs()
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$root/batch_id=0"),
      java.nio.file.Paths.get(s"$root/.trash-fold/batch_id=0"))
    assert(BatchFold.recover(spark, root), "a manifested staging must recover")
    assert(dirs(root) == Set("batch_id=-1", "batch_id=2"))
    assert(xs(root) == (0L until 25L), "recovery lost or duplicated rows")
    assert(!new java.io.File(s"$root/.trash-fold").exists(),
      "recovery must drop the superseded moved-aside dirs")
    assert(!BatchFold.recover(spark, root), "recovery must be one-shot")
  }

  test("a completed fold leaves no trash behind (the old base's delete " +
      "is deferred OUTSIDE the swap, then performed)") {
    val root = java.nio.file.Files.createTempDirectory("bf-notrash").toString
    writeBatch(root, 0L, 0 until 10)
    writeBatch(root, 1L, 10 until 15)
    assert(BatchFold.fold(spark, root, excludeBatchId = 1L)(stageFlat) == 1)
    assert(!new java.io.File(s"$root/.trash-fold").exists())
    assert(!new java.io.File(s"$root/.staging-fold").exists())
    // and a lingering trash from a crash-after-swap is pre-cleaned by
    // the NEXT fold, never read as relation content
    new java.io.File(s"$root/.trash-fold/batch_id=9").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/.trash-fold/batch_id=9/part-0"),
      Array[Byte](1))
    assert(xs(root) == (0L until 15L), "trash must be invisible to reads")
    writeBatch(root, 2L, 15 until 20)
    assert(BatchFold.fold(spark, root, excludeBatchId = 3L)(stageFlat) == 3)
    assert(!new java.io.File(s"$root/.trash-fold").exists(),
      "the next fold's pre-clean must drop crash-leftover trash")
    assert(xs(root) == (0L until 20L))
  }

  test("an INCOMPLETE staging (no manifest) is not authoritative: " +
      "recover no-ops, and the next fold discards it and refolds") {
    val root = java.nio.file.Files.createTempDirectory("bf-incomplete").toString
    writeBatch(root, 0L, 0 until 10)
    writeBatch(root, 1L, 10 until 15)
    // a crash DURING the staged write: data (maybe partial) + _SUCCESS
    // possibly present, but no _folded manifest — old layout intact
    spark.read.parquet(root).filter(col("batch_id") === 0L)
      .drop("batch_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/.staging-fold")
    assert(!BatchFold.recover(spark, root),
      "no manifest => nothing to recover")
    assert(dirs(root) == Set("batch_id=0", "batch_id=1"))
    assert(BatchFold.fold(spark, root, excludeBatchId = 1L)(stageFlat) == 1)
    assert(dirs(root) == Set("batch_id=-1", "batch_id=1"))
    assert(xs(root) == (0L until 15L))
  }
}

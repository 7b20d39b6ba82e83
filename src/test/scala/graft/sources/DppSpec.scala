package graft.sources

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Dynamic partition pruning is the scale mechanism that makes
  * hive-partitioned fact layouts pay off on star joins: a filter on the
  * DIM side prunes FACT partitions at runtime, even though no fact-side
  * predicate exists to push down statically. This spec proves the engine
  * actually gets it on our write patterns — a partitioned fact joined to
  * a selectively-filtered broadcast dim must (a) plan a dynamicpruning
  * subquery on the fact scan and (b) read only the matching partitions,
  * while the same join with DPP disabled reads the whole fact table.
  */
class DppSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-dpp").toString

  override def afterAll(): Unit = spark.stop()

  private val n = 200000L
  private val nParts = 50L

  /** Scan rows surfaced by the FACT scan leaf (largest leaf — the dim
    * scan is 50 rows). AQE off so the executed plan's leaves are the
    * file scans (the LayoutSpec pattern). */
  private def factScanRows(build: => DataFrame): Long = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = build
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).max
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("star join on a partitioned fact prunes partitions from the dim filter") {
    val factPath = s"$tmp/fact"; val dimPath = s"$tmp/dim"
    // fact rows scattered across 50 hive partitions; v is payload
    spark.range(n)
      .select(col("id"), pmod(xxhash64(col("id")), lit(nParts)).as("p"),
        (col("id") % 1000).as("v"))
      .write.partitionBy("p").mode("overwrite").parquet(factPath)
    // dim: attr = p % 25, so attr = 0 selects exactly 2 of 50 partitions
    spark.range(nParts).select(col("id").as("p"), (col("id") % 25).as("attr"))
      .write.mode("overwrite").parquet(dimPath)

    def join() = spark.read.parquet(factPath)
      .join(broadcast(spark.read.parquet(dimPath).filter(col("attr") === 0)), "p")

    val expected = join().count() // answer is layout-independent
    assert(expected > 0)

    val pruned = factScanRows(join())
    val plan = join().queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan should carry a dynamicpruning subquery, plan:\n$plan")
    // 2 of 50 partitions ≈ n/25 rows; allow hash-imbalance slack
    assert(pruned <= n / 10, s"DPP should prune the fact scan, read $pruned of $n")

    val prevDpp = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try {
      assert(join().count() === expected)
      val unpruned = factScanRows(join())
      assert(unpruned >= n * 9 / 10,
        s"without DPP the fact scan should read ~everything, read $unpruned of $n")
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", prevDpp)
  }
}

package graft.sources

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Bucketed co-located join: the lineitem⋈orders shuffle disappears
  * when both tables are bucketed on the join key — the storage-level
  * optimization that matters most for recurring joins at 100 TB. */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val wh = java.nio.file.Files
    .createTempDirectory("graft-bucket-wh").toString

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh))
    // overrides AFTER tune (last write wins):
    // - no AQE: AdaptiveSparkPlanExec hides its inner plan from
    //   collect(), which would make the exchange assertions vacuous
    // - no broadcast: exercise the SMJ bucket path the tables would
    //   take at cluster scale, not a small-SF broadcast
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def exchanges(p: SparkPlan): Seq[Exchange] =
    p.collect { case e: Exchange => e }

  test("bucketed lineitem join orders plans with zero exchanges and matches the shuffled join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Bucketed.writeBucketed(li, "li_b", "l_orderkey", numBuckets = 8)
    Bucketed.writeBucketed(ord, "ord_b", "o_orderkey", numBuckets = 8)
    val joined = Bucketed.bucketedJoin(spark, "li_b", "ord_b",
      "l_orderkey", "o_orderkey")
    val ex = exchanges(joined.queryExecution.executedPlan)
    assert(ex.isEmpty,
      s"bucketed join must not shuffle, found: ${ex.map(_.nodeName)}")
    // same result as the plain (shuffling) join
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
    assert(!exchanges(plain.queryExecution.executedPlan).isEmpty,
      "control: the unbucketed join should shuffle under these settings")
    assert(joined.count() === plain.count())
    // integer cents: double sums differ by partial-aggregation order
    val s1 = joined.agg(sum(graft.Tables.cents(col("l_extendedprice")))).head.getLong(0)
    val s2 = plain.agg(sum(graft.Tables.cents(col("l_extendedprice")))).head.getLong(0)
    assert(s1 === s2)
  }
}

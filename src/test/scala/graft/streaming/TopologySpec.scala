package graft.streaming

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The full LAYERED topology under the repeatable test gate (the
  * DriveTopology assertion as a spec, single-chunk feed at sf0.001):
  * three concurrent streaming queries chained through FileStreamSink/
  * Source edges — router → interval join + apportionment → per-batch-
  * dim-refreshed trademark aggregation — must reproduce the BATCH
  * trademark query cent-for-cent. This is the reference's actual
  * multi-app deployment shape run end-to-end, not stage-by-stage
  * (EndToEndStreamSpec covers the stages individually). */
class TopologySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("chained streaming trademark totals == batch q1, cent for cent") {
    val root = java.nio.file.Files.createTempDirectory("graft-topospec").toString
    Topology.writeCdcFixture(spark, sf, s"$root/cdc")
    val chain = Topology.start(spark, s"$root/cdc",
      s"$root/routed", s"$root/wide", s"$root/agg", s"$root/ckpt",
      () => Tables.part(spark, sf).select(col("p_partkey"), col("p_brand")))
    try chain.drain() finally chain.stopAll()
    val got = Topology.trademarkTotals(spark, s"$root/agg")
    val want = graft.operators.GmallQueries.trademarkStat(spark, sf)
      .select(col("tm_name"), Tables.cents(col("amount")).as("amount_c"))
    assert(got.count() > 0)
    assert(want.exceptAll(got).count() === 0L)
    assert(got.exceptAll(want).count() === 0L)
  }
}

package graft.tools

import graft.{GraftSession, Tables}
import graft.streaming.Topology
import org.apache.spark.sql.functions._

/** End-to-end drive of the reference's LAYERED topology (router →
  * order-wide join+apportion → trademark stat) as three CONCURRENT
  * streaming queries chained through file edges in one session —
  * `sbt "Test/runMain graft.tools.DriveTopology [sfDir]"`.
  *
  * The fixture is fed in two chunks — one before the topology starts,
  * one while all three queries are running — so the mid-flight chunk
  * exercises genuine multi-stage concurrent propagation, not a
  * pre-staged batch. Exit 0 iff the chain's final trademark totals
  * equal the BATCH trademark query (q1) over the same corpus, cent
  * for cent.
  */
object DriveTopology {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.localStreaming("drive-topology")
    val root = java.nio.file.Files.createTempDirectory("graft-topo").toString
    val fixDir = s"$root/fixture"; val cdcDir = s"$root/cdc"
    val n = Topology.writeCdcFixture(spark, sfDir, fixDir)
    println(s"[topology] fixture: $n CDC lines from $sfDir")
    // two-chunk feed: move half the fixture files in before start
    new java.io.File(cdcDir).mkdirs()
    val files = new java.io.File(fixDir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    require(files.length >= 2, s"fixture produced ${files.length} files; " +
      "need >= 2 for the two-chunk feed")
    val (first, second) = files.splitAt(files.length / 2)
    def feed(fs: Array[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(cdcDir, f.getName))
    }
    feed(first)
    val chain = Topology.start(spark, cdcDir,
      s"$root/routed", s"$root/wide", s"$root/agg", s"$root/ckpt",
      () => Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand")))
    println("[topology] chunk 1 propagated; feeding chunk 2 mid-flight")
    feed(second)
    chain.drain()
    chain.stopAll()
    val got = Topology.trademarkTotals(spark, s"$root/agg")
    val want = graft.operators.GmallQueries.trademarkStat(spark, sfDir)
      .select(col("tm_name"), Tables.cents(col("amount")).as("amount_c"))
    val missing = want.exceptAll(got).count()
    val extra = got.exceptAll(want).count()
    val nBrands = got.count()
    println(s"[topology] brands=$nBrands missing=$missing extra=$extra")
    got.orderBy(desc("amount_c")).show(5, false)
    if (missing == 0 && extra == 0 && nBrands > 0) {
      println("[topology] PASS: chained streaming totals == batch q1, cent for cent")
      spark.stop()
    } else {
      println("[topology] FAIL: totals diverge from the batch answer")
      spark.stop(); sys.exit(1)
    }
  }
}

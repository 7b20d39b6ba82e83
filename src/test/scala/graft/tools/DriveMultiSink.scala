package graft.tools

import graft.GraftSession
import graft.streaming.Runner

/** Drives the multi-sink DWS pipeline on file edges. */
object DriveMultiSink {
  def main(args: Array[String]): Unit = {
    val Array(cdcDir, outRoot) = args
    val spark = GraftSession.localStreaming("drive-multisink")
    val q = Runner.orderWideMultiSinkQuery(spark, cdcDir,
      s"$outRoot/detail", s"$outRoot/agg", s"$outRoot/ckpt")
    val deadline = System.nanoTime() + 45L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline &&
      !new java.io.File(s"$outRoot/detail").exists()) Thread.sleep(1000)
    Thread.sleep(12000)
    q.stop()
    println("DETAIL SINK:")
    spark.read.parquet(s"$outRoot/detail").orderBy("order_detail_id").show(10, false)
    println("AGG SINK:")
    spark.read.parquet(s"$outRoot/agg").orderBy("order_id").show(10, false)
    spark.stop()
  }
}

package graft.tools

import graft.GraftSession
import graft.streaming.Runner
import org.apache.spark.sql.SparkSession

/** File-edged DAU drive on the RocksDB state store (production config). */
object DriveRocksDau {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outRoot) = args
    val spark = GraftSession.streamingTune(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("stateStore provider = " +
      spark.conf.get("spark.sql.streaming.stateStore.providerClass"))
    val q = Runner.dauQuery(spark, inDir, s"$outRoot/dau", s"$outRoot/ckpt")
    q.processAllAvailable(); q.stop()
    spark.read.parquet(s"$outRoot/dau").show(10, false)
    spark.stop()
  }
}

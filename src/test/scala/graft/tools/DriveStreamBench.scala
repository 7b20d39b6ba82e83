package graft.tools

import graft.{GraftSession, Tables}

object DriveStreamBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("drive-sb")
    val sfDir = "/root/testdata/sf0.01"
    val n = Tables.events(spark, sfDir).count()
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(s"$sfDir/events.parquet")
    val ev = (raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }).selectExpr("cast(user_id as string) as mid", "ts")
    val ckpt = java.nio.file.Files.createTempDirectory("sb-ckpt").toString
    val q = graft.streaming.Pipelines.dauFirstVisits(ev)
      .writeStream.format("noop").option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    println("OK rows=" + n)
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, Tables}

object DriveStreamBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("drive-sb")
    val sfDir = "/root/testdata/sf0.01"
    val n = Tables.events(spark, sfDir).count()
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // file-stream sources need a directory basePath; symlink the corpus
    // file into a temp dir (the Bench streamOf pattern)
    val dir = java.nio.file.Files.createTempDirectory("sb-events")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    val ev = Tables.normalizeEventTs(raw)
      .selectExpr("cast(user_id as string) as mid", "ts")
    val ckpt = java.nio.file.Files.createTempDirectory("sb-ckpt").toString
    val q = graft.streaming.Pipelines.dauFirstVisits(ev)
      .writeStream.format("noop").option("checkpointLocation", ckpt).start()
    q.processAllAvailable(); q.stop()
    println("OK rows=" + n)
    spark.stop()
  }
}

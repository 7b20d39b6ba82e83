package graft.tools

import graft.{GraftSession, Tables}

/** Correlates stream-bench rate swings with filesystem sync latency.
  *
  * Observation (round 6): back-to-back idle Bench runs report dau
  * rates of 115k then 28k rows/s while BOTH runs' CPU calibrations
  * (calib_sec / calib_end_sec) are identical — the swing is not CPU
  * contention. The dau section is one micro-batch whose wall time is
  * dominated by checkpoint/state-store commit fsyncs on /tmp (a VM
  * virtual disk shared with neighbors), so host-side I/O pressure —
  * invisible to load average and the CPU calib — shifts whole stream
  * sections uniformly. This tool times (a) an fsync microbench and
  * (b) the sf0.1 dau stream with a fresh checkpoint, interleaved N
  * times, so the correlation is observable in one run.
  */
object ProfileStreamIo {
  def fsyncMicro(): Double = {
    val d = java.nio.file.Files.createTempDirectory("psio-fsync")
    val t0 = System.nanoTime()
    (0 until 100).foreach { i =>
      val p = d.resolve(s"f$i")
      val ch = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      ch.write(java.nio.ByteBuffer.wrap(Array.fill[Byte](4096)(1)))
      ch.force(true)
      ch.close()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    d.toFile.listFiles.foreach(_.delete()); d.toFile.delete()
    sec
  }

  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val rep = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("profile-stream-io")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val n = Tables.events(spark, sfDir).count() * rep
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    (1 to passes).foreach { pass =>
      val fs1 = fsyncMicro()
      val src = java.nio.file.Files.createTempDirectory("psio-src")
      java.nio.file.Files.createSymbolicLink(
        src.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
      import org.apache.spark.sql.functions._
      val ev = Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(src.toString))
        .withColumn("rep", explode(lit((0 until rep).toArray)))
        .selectExpr("concat(cast(user_id as string), '#', rep) as mid", "ts")
      val ckpt = java.nio.file.Files.createTempDirectory("psio-ckpt").toString
      val t0 = System.nanoTime()
      val q = graft.streaming.Pipelines.dauFirstVisits(ev)
        .writeStream.format("noop").option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val fs2 = fsyncMicro()
      println(f"[psio] pass=$pass rep=$rep fsync100_before=${fs1}%.3fs dau_wall=${wall}%.2fs " +
        f"rate=${n / wall}%.0f rows/s fsync100_after=${fs2}%.3fs")
    }
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, Tables}

/** Micro-batch duration breakdown for the DAU dedup stream (informed the
  * Bench stream-section tuning). Knobs: GRAFT_ROCKS=1 → RocksDB state
  * store; GRAFT_SHUF=n → shuffle/state partitions; SPARK_GRAFT_SF_DIR. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val spark = {
      val s = GraftSession.local("profile-stream")
      sys.env.get("GRAFT_ROCKS").foreach(_ => s.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
      sys.env.get("GRAFT_SHUF").foreach(n =>
        s.conf.set("spark.sql.shuffle.partitions", n))
      s
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val srcDir = java.nio.file.Files.createTempDirectory("ps-src")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val raw = spark.readStream.schema(schema).parquet(srcDir.toString)
    val ev = Tables.normalizeEventTs(raw)
      .selectExpr("cast(user_id as string) as mid", "ts")
    val ckpt = java.nio.file.Files.createTempDirectory("ps-ckpt").toString
    val t0 = System.nanoTime()
    val q = graft.streaming.Pipelines.dauFirstVisits(ev)
      .writeStream.format("noop").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    q.recentProgress.foreach { p =>
      println(s"[ps] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} stateOps=${p.stateOperators.headOption.map(s =>
          s"rows=${s.numRowsTotal} updated=${s.numRowsUpdated} commitMs=${s.allUpdatesTimeMs}/${s.commitTimeMs}")}")
    }
    println(f"[ps] wall=$wall%.2f s")
    q.stop(); spark.stop()
  }
}

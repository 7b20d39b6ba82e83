package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A warm-up pass at sf0.001 first — JVM/JIT, codegen compilation and
  * Hadoop filesystem init otherwise land entirely in whichever query
  * runs first and distort per-query numbers. The timed pass then runs
  * each query once, forcing full materialization via count().
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val spark = GraftSession.local("graft-bench")
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    spark.catalog.clearCache() // drop warm-up persists
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators persist small intermediates internally; clear between
      // queries so timings are independent of bench order / cache churn
      spark.catalog.clearCache()
      // a crashed query must not masquerade as a fast success — report -1
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // headline total covers successful queries only — a crashed query's
    // -1 sentinel must not subtract from (i.e. flatter) the total; it is
    // reported separately in "failed" so a crash is loud, not invisible
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // streaming throughput: the DAU pipeline through a REAL streaming
    // query — file-stream source → watermark → state-store dedup → noop
    // sink (a batch DataFrame would take Pipelines' non-streaming
    // branch and skip the state store entirely). The reference's
    // envelope is "fits a 5 s trigger on 4 cores" (BASELINE.md);
    // rows/sec makes that comparable.
    val streamRate = try {
      val n = Tables.events(spark, sfDir).count()
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      // file-stream sources need a directory; expose the single events
      // file through a temp dir symlink
      val srcDir = java.nio.file.Files.createTempDirectory("graft-bench-src")
      java.nio.file.Files.createSymbolicLink(
        srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
      val raw = spark.readStream.schema(schema).parquet(srcDir.toString)
      val ev = Tables.normalizeEventTs(raw)
        .selectExpr("cast(user_id as string) as mid", "ts")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-ckpt").toString
      // size the state shuffle to the single-batch volume: 8 partitions
      // carry ~12k state rows each here; 32 just multiplies per-partition
      // store-commit overhead (profiled via tools/ProfileStream). The
      // partition count is pinned into the checkpoint at first start, so
      // set it before and restore after.
      val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val rate = try {
        val t0 = System.nanoTime()
        val q = streaming.Pipelines.dauFirstVisits(ev)
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .start()
        // batch-0 planning reads the conf asynchronously after start():
        // only restore once the query has fully stopped
        q.processAllAvailable(); q.stop()
        n / ((System.nanoTime() - t0) / 1e9)
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      rate
    } catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":$failed,"stream_dau_rows_per_sec":${streamRate.toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}

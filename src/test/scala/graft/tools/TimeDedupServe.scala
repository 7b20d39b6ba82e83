package graft.tools

import org.apache.spark.sql.functions.col

/** Dev-side timing for the dedup-serve deployment shape: build the
  * at-rest LSH index (untimed), then time a bounded-batch probe
  * min-of-2. `Test/runMain graft.tools.TimeDedupServe [sfDir] [batchN]` */
object TimeDedupServe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val batchN = if (args.length > 1) args(1).toInt else 100
    val spark = graft.GraftSession.local("graft-time-dedup-serve")
    val idx = java.nio.file.Files.createTempDirectory("graft-tds-idx").toString
    val t0 = System.nanoTime()
    graft.operators.Dedup.writeDedupIndex(spark, sfDir, idx)
    println(f"[tds] build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val batch = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < batchN).select(col("doc_id"), col("text"))
    val t = (1 to 2).map { _ =>
      val s = System.nanoTime()
      graft.operators.Dedup.dedupServeBatch(spark, idx, batch).count()
      val dt = (System.nanoTime() - s) / 1e9
      spark.catalog.clearCache()
      dt
    }.min
    println(f"[tds] serve batch=$batchN t=$t%.2f s")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions.col

/** Dev-side plan dump for the dedup-serve candidate join: is the
  * buckets scan dynamically partition-pruned? `Test/runMain
  * graft.tools.PeekDedupServe [sfDir]` */
object PeekDedupServe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.local("graft-peek-dedup-serve")
    spark.sparkContext.setLogLevel("WARN")
    val idx = java.nio.file.Files.createTempDirectory("pds-idx").toString
    graft.operators.Dedup.writeDedupIndex(spark, sfDir, idx)
    val one = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 100).select(col("doc_id"), col("text"))
    val served = graft.operators.Dedup.dedupServeBatch(spark, idx, one)
    val opt = served.queryExecution.optimizedPlan.toString
    val phys = served.queryExecution.executedPlan.toString
    println("=== optimized contains dynamicpruning: " +
      opt.toLowerCase.contains("dynamicpruning"))
    println("=== physical contains SubqueryBroadcast/dynamicpruning: " +
      (phys.contains("SubqueryBroadcast") ||
        phys.toLowerCase.contains("dynamicpruning")))
    phys.linesIterator.filter(l => l.contains("PartitionFilters") ||
      l.toLowerCase.contains("dynamicpruning")).take(6).foreach(println)
    served.collect()
    val scanned = served.queryExecution.executedPlan.collectLeaves()
      .filter(_.toString.contains("bucket"))
      .flatMap(_.metrics.get("numOutputRows").map(_.value))
    println(s"=== scanned buckets rows: ${scanned.mkString(",")}")
    spark.stop()
  }
}

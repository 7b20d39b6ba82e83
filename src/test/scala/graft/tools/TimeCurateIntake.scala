package graft.tools

import org.apache.spark.sql.functions.col

/** Dev-side throughput for the full streaming curation intake
  * (Runner.curateIntakeQuery): feed documents through the rules +
  * classifier + decontamination + dedup-vs-accepted pipeline in
  * `nBatches` micro-batches against a fresh maintained index, and
  * report docs/s end-to-end (model/eval-dict build included — they
  * amortize across a real stream's lifetime but belong in an honest
  * single-feed number).
  *
  * The feed is the sf corpus's documents by default; passing `nDocs`
  * swaps in the DriveDedupScale synthetic corpus (distinct ~40-token
  * docs, ~2% near-dups — a realistic mix, unlike replicating the
  * 5 000 testdata docs, which would drown the dup path) so the
  * FIXED-COST AMORTIZATION claim in SCALE.md carries measured
  * points: per-trigger cost is ~15 Spark jobs regardless of batch
  * size, so docs/s must rise with batch size until the stages' own
  * work dominates. Models still come from `sfDir`'s seed classes.
  *
  * `Test/runMain graft.tools.TimeCurateIntake [sfDir] [nBatches]
  * [nDocs]` */
object TimeCurateIntake {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val nDocs = if (args.length > 2) args(2).toLong else 0L
    val spark = graft.GraftSession.local("graft-time-curate-intake")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed =
      if (nDocs > 0) DriveDedupScale.syntheticDocs(spark, nDocs)
      else graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val docs = feed.as[(Long, String)].collect().sortBy(_._1)
    val idx = java.nio.file.Files.createTempDirectory("graft-tci-idx").toString
    val out = java.nio.file.Files.createTempDirectory("graft-tci-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tci-ckpt").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val t0 = System.nanoTime()
    val q = graft.streaming.Runner.curateIntakeQuery(spark, sfDir, idx,
      mem.toDS().toDF("doc_id", "text"), out, ckpt)
    try {
      docs.grouped(math.max(docs.length / nBatches, 1)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val dec = spark.read.parquet(out)
    val nAccepted = dec.filter(col("accepted")).count()
    val byReason = dec.filter(!col("accepted"))
      .groupBy(col("drop_reason")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(f"[tci] docs=${docs.length} batches=$nBatches sec=$sec%.1f " +
      f"docs_per_sec=${(docs.length / sec).toLong} accepted=$nAccepted " +
      s"dropped=$byReason")
    spark.stop()
  }
}

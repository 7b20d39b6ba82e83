package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition proof that the
  * operator families form a usable training-data pipeline, not isolated
  * queries: quality filter (t10) ∩ near-dup keep-best survivors (d8) ∩
  * decontamination (t12) → curated corpus, written range-clustered by
  * doc_id ([[graft.sources.Layout]]) so downstream readers slice it by
  * id range for free.
  *
  * Each stage is the already-gate-checked operator; curation combines
  * their DECISIONS via left-semi joins on doc_id (three id-only
  * relations — at 100 TB the decision sets are a small fraction of
  * corpus bytes, and the payload-carrying `documents` relation is
  * scanned once at the end). Eval documents (doc_id < evalN) are
  * excluded by construction — they are the decontamination REFERENCE,
  * never training data.
  */
object Curation {

  /** Run the pipeline, write the curated corpus to `outDir`
    * (range-clustered parquet), return the per-stage funnel summary
    * (stage, n_docs) for reporting/monitoring. */
  def curate(spark: SparkSession, dir: String, outDir: String,
             evalN: Long = 50): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val quality = TextOps.filterDecision(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
    val survivors = Dedup.keepBest(spark, dir)
      .select(col("keep_id").as("doc_id"))
    val clean = TextOps.decontaminate(spark, dir, evalN)
      .filter(!col("contaminated")).select(col("doc_id"))
    val curated = docs
      .join(quality, Seq("doc_id"), "left_semi")
      .join(survivors, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
    graft.sources.Layout.writeRangeClustered(curated, outDir, Seq("doc_id"))
    // funnel counts are monitoring output, not a hot path — each is one
    // id-relation action (the written corpus count reads the output
    // back: it reports what was PERSISTED, not what was planned)
    Seq(
      "total" -> docs.count(),
      "quality_keep" -> quality.count(),
      "dedup_survivors" -> survivors.count(),
      "decontaminated_clean" -> clean.count(),
      "curated_written" -> spark.read.parquet(outDir).count())
      .toDF("stage", "n_docs")
  }
}

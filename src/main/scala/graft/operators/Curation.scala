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

  /** The FULL training-data recipe — [[curate]]'s filter ∩ dedup ∩
    * decontaminate composition extended through selection and
    * materialization: the per-language quality-quantile band (t15)
    * joins the decision set; the stratified sample (t14's core) then
    * draws `quota` docs per language FROM THE CURATED SET (sampling
    * after filtering, so strata fill with surviving docs); and the
    * final selection is packed into fixed-token-budget training
    * sequences (t16's core) — the relation a trainer actually reads.
    * Writes the packed assignment to `outDir` range-clustered by
    * (grp, bin) so a trainer's sequence reader slices bins for free;
    * returns the funnel summary.
    *
    * Scale shape: unchanged from the parts — decision sets are id-only
    * relations combined by semi-joins; the sample is a per-stratum
    * WindowGroupLimit over the curated ids; only the final ≤
    * strata × quota selection carries text into the packing windows. */
  def curateFull(spark: SparkSession, dir: String, outDir: String,
                 evalN: Long = 50, keepFrac: Double = 0.5,
                 quota: Int = 20, budget: Int = 512,
                 nGroups: Int = 8): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val quality = TextOps.filterDecision(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
    val survivors = Dedup.keepBest(spark, dir)
      .select(col("keep_id").as("doc_id"))
    val clean = TextOps.decontaminate(spark, dir, evalN)
      .filter(!col("contaminated")).select(col("doc_id"))
    val band = TextOps.quantileFilter(spark, dir, keepFrac)
      .select(col("doc_id"))
    // the 4-decision composition is the expensive part of the recipe;
    // persist its (doc_id, lang) projection so the funnel counts, the
    // sample, and the packed write all read ONE evaluation of it
    // (id+lang only — tiny relative to corpus bytes). Explicit persist
    // rather than ScratchCache.arm: this method runs several actions
    // over the relation, and arm() sweeps after the first.
    val curatedIds = docs.select(col("doc_id"), col("lang"))
      .join(quality, Seq("doc_id"), "left_semi")
      .join(survivors, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
      .join(band, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sampled = TextOps.stratifiedSampleOf(curatedIds, quota)
        .select(col("doc_id"))
      val selection = docs.join(sampled, Seq("doc_id"), "left_semi")
      val packed = TextOps.packSequencesOf(selection, budget, nGroups)
      graft.sources.Layout.writeRangeClustered(packed, outDir, Seq("grp", "bin"))
      Seq(
        "total" -> docs.count(),
        "curated" -> curatedIds.count(),
        "sampled" -> sampled.count(),
        "packed_written" -> spark.read.parquet(outDir).count())
        .toDF("stage", "n_docs")
    } finally curatedIds.unpersist(blocking = false)
  }

  /** The MODERN LLM-pretraining recipe — [[curateFull]]'s composition
    * upgraded with the round-8 operators, in the order production
    * pipelines run them: rule filter (t10) ∩ near-dup keep-best (d8) ∩
    * decontamination (t12) ∩ **trained quality classifier** (t29) →
    * **exact-substring span removal** (d16, computed among the
    * survivors so cross-doc spans duplicated within the retained set
    * are excised; docs deduplicated down to nothing drop out) →
    * **DSIR importance resampling** (t30's core, target-vs-survivor
    * distributions — selection AFTER filtering, the curateFull
    * convention) → fixed-budget sequence packing (t16) of the CLEANED
    * text, written range-clustered by (grp, bin).
    *
    * Scale shape: unchanged from the parts — decisions are id-only
    * semi-joins; the span rewrite and DSIR scoring run once over the
    * persisted survivor relation; only the ≤ `budget` selection
    * carries cleaned text into the packing windows. */
  def curateLlm(spark: SparkSession, dir: String, outDir: String,
                evalN: Long = 50, targetSource: String = "src0",
                budget: Int = 100, packBudget: Int = 512,
                nGroups: Int = 8): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val quality = TextOps.filterDecision(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
    val survivors = Dedup.keepBest(spark, dir)
      .select(col("keep_id").as("doc_id"))
    val clean = TextOps.decontaminate(spark, dir, evalN)
      .filter(!col("contaminated")).select(col("doc_id"))
    val classified = TextOps.nbQuality(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
    // survivors carry text (span-dedup AND dsir both read it) — persist
    // the full rows; several actions run over this relation
    val curated = docs
      .join(quality, Seq("doc_id"), "left_semi")
      .join(survivors, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
      .join(classified, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cleaned = Dedup.spanDedupOn(curated, 8)
        .filter(col("dedup_text") =!= "") // fully-copied docs drop out
      val sampled = TextOps.dsirSampleOf(curated, targetSource, 1024, budget)
        .select(col("doc_id"))
      val selection = cleaned.join(sampled, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("dedup_text").as("text"))
      val packed = TextOps.packSequencesOf(selection, packBudget, nGroups)
      graft.sources.Layout.writeRangeClustered(packed, outDir, Seq("grp", "bin"))
      Seq(
        "total" -> docs.count(),
        "curated" -> curated.count(),
        "span_cleaned_nonempty" -> cleaned.count(),
        "dsir_sampled" -> sampled.count(),
        "packed_written" -> spark.read.parquet(outDir).count())
        .toDF("stage", "n_docs")
    } finally curated.unpersist(blocking = false)
  }
}

package graft.operators

import graft.{GraftSession, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The curation pipeline's contract: the written corpus is EXACTLY the
  * intersection of its stages' keep-decisions, carries no duplicates
  * and no contamination, and the funnel summary reports the persisted
  * truth. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("curate: output == ∩ of stage decisions; dup-free; contamination-free") {
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    val summary = Curation.curate(spark, sf, out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val curated = spark.read.parquet(out)
    val ids = curated.select("doc_id").collect().map(_.getLong(0)).toSet

    // funnel reports the persisted truth and shrinks monotonically
    assert(summary("curated_written") === ids.size)
    assert(summary("curated_written") <= summary("quality_keep"))
    assert(summary("curated_written") <= summary("dedup_survivors"))
    assert(summary("curated_written") <= summary("decontaminated_clean"))
    assert(summary("curated_written") > 0, "curation must keep something")

    // exactly the intersection of the three decisions
    def idsOf(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col(c)).collect().map(_.getLong(0)).toSet
    val quality = idsOf(TextOps.filterDecision(spark, sf).filter(col("keep")), "doc_id")
    val survivors = idsOf(Dedup.keepBest(spark, sf), "keep_id")
    val clean = idsOf(TextOps.decontaminate(spark, sf)
      .filter(!col("contaminated")), "doc_id")
    assert(ids === (quality & survivors & clean))

    // eval reference never leaks into training data
    assert(ids.forall(_ >= 50))
    // keep-best left one survivor per cluster → no two curated docs
    // share content (order-insensitive fingerprint)
    val nFps = curated
      .select(md5(array_join(array_sort(split(trim(col("text")), "\\s+")), " ")
        .cast("binary")).as("fp"))
      .distinct().count()
    assert(nFps === ids.size.toLong, "curated corpus must be content-dup-free")
  }

  test("curateFull: sample ⊆ curated band, packed output covers exactly the sample") {
    val out = java.nio.file.Files.createTempDirectory("graft-packed").toString
    val quota = 7
    val summary = Curation.curateFull(spark, sf, out, quota = quota,
        budget = 64, nGroups = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val packed = spark.read.parquet(out)
    val packedIds = packed.select("doc_id").collect().map(_.getLong(0)).toSet

    // funnel: monotone, persisted truth (one packed row per sampled doc)
    assert(summary("sampled") <= summary("curated"))
    assert(summary("packed_written") === summary("sampled"))
    assert(packedIds.size.toLong === summary("sampled"))
    assert(summary("sampled") > 0)

    // the sample is drawn from the curated set INCLUDING the quantile
    // band: every packed doc passes all four decisions
    def idsOf(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col(c)).collect().map(_.getLong(0)).toSet
    val curated4 = idsOf(TextOps.filterDecision(spark, sf).filter(col("keep")), "doc_id") &
      idsOf(Dedup.keepBest(spark, sf), "keep_id") &
      idsOf(TextOps.decontaminate(spark, sf).filter(!col("contaminated")), "doc_id") &
      idsOf(TextOps.quantileFilter(spark, sf), "doc_id")
    assert(packedIds.subsetOf(curated4))
    // per-language quota respected
    val byLang = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(packedIds.groupBy(byLang).values.forall(_.size <= quota))

    // packing invariants on the final selection: offsets are per-group
    // prefix sums of token counts; bins derive from offsets
    val rows = packed.select("grp", "n_tokens", "start_off", "bin").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sum === g.map(r => r._3 + r._2).max)
    }
    assert(rows.forall { case (_, _, off, bin) => bin === (off / 64).toInt })

    // the gate form (q35) is THE SAME relation curateFull writes at
    // the same non-default dials — the q34 lockstep assertion applied
    // to the selection-centric recipe
    val gate = Curation.curateFullPacked(spark, sf, quota = quota,
        budget = 64, nGroups = 2)
      .collect().map(_.toSeq).toSet
    val written = packed
      .select("doc_id", "grp", "n_tokens", "start_off", "bin")
      .collect().map(_.toSeq).toSet
    assert(gate === written, "curateFullPacked must equal curateFull's written relation")
  }

  test("curateLlm: classifier decision honored, packed text is the span-cleaned rewrite") {
    val out = java.nio.file.Files.createTempDirectory("graft-llm").toString
    val summary = Curation.curateLlm(spark, sf, out, budget = 40,
        packBudget = 64, nGroups = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val packed = spark.read.parquet(out)
    val packedIds = packed.select("doc_id").collect().map(_.getLong(0)).toSet

    // funnel: monotone, bounded by the DSIR budget
    assert(summary("curated") <= summary("total"))
    assert(summary("span_cleaned_nonempty") <= summary("curated"))
    assert(summary("dsir_sampled") <= 40L)
    assert(summary("packed_written") === packedIds.size.toLong)
    assert(packedIds.nonEmpty, "the recipe must select something")

    // every packed doc passes ALL FOUR decisions incl. the classifier
    def idsOf(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col(c)).collect().map(_.getLong(0)).toSet
    val curated4 = idsOf(TextOps.filterDecision(spark, sf).filter(col("keep")), "doc_id") &
      idsOf(Dedup.keepBest(spark, sf), "keep_id") &
      idsOf(TextOps.decontaminate(spark, sf).filter(!col("contaminated")), "doc_id") &
      idsOf(TextOps.nbQuality(spark, sf).filter(col("keep")), "doc_id")
    assert(packedIds.subsetOf(curated4))

    // the packed token counts are the CLEANED counts: n_tokens equals
    // the survivor-scoped span-dedup kept-token count, not the raw one
    val curatedDocs = Tables.documents(spark, sf)
      .join(spark.createDataFrame(curated4.toSeq.map(Tuple1(_)))
        .toDF("doc_id"), Seq("doc_id"), "left_semi")
    val cleanedCounts = Dedup.spanDedupOn(curatedDocs, 8)
      .filter(col("dedup_text") =!= "")
      .select("doc_id", "n_tokens", "n_removed").collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    val packedCounts = packed.select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    packedCounts.foreach { case (id, n) =>
      assert(cleanedCounts(id) === n, s"packed token count for doc $id")
    }

    // the gate form (q34) is THE SAME relation curateLlm writes: same
    // non-default dials, row-for-row equality — so the driver's DuckDB
    // hash on curateLlmPacked certifies the writing recipe too
    val gate = Curation.curateLlmPacked(spark, sf, budget = 40,
        packBudget = 64, nGroups = 2)
      .collect().map(_.toSeq).toSet
    val written = packed
      .select("doc_id", "grp", "n_tokens", "start_off", "bin")
      .collect().map(_.toSeq).toSet
    assert(gate === written, "curateLlmPacked must equal curateLlm's written relation")
  }
}

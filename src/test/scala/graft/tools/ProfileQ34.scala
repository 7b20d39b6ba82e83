package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** q34 funnel decomposition (round 12, r11 verdict Next #7): would the
  * d16 span-removal and t30 DSIR stages pay for a SHARED tokenization
  * pass? Both call `tokens(text)` over the persisted survivor relation
  * — this tool measures each stage's wall AND the cost of the
  * tokenization alone, so the possible saving (one of the two splits)
  * is bounded by measurement instead of guessed.
  *
  * `Test/runMain graft.tools.ProfileQ34 [sfDir]` (default sf0.1)
  */
object ProfileQ34 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("profile-q34")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Curation, Dedup, TextOps}

    def time(name: String)(f: => Unit): Double = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q34] $name%-28s ${best}%6.2f s")
      best
    }

    // the funnel's persisted survivor relation, exactly as curateLlm
    // builds it
    val curated = Curation.llmCuratedDocs(spark, sfDir, 50)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("curate (4-stage decisions)") { curated.count() }

    // the shareable work: ONE regex-split pass over the survivors'
    // text (forced via a size() aggregate so nothing else rides along)
    time("tokens() pass alone") {
      curated.select(sum(size(TextOps.tokens(col("text"))))).head
    }
    time("d16 spanDedupOn") { Dedup.spanDedupOn(curated, 8).count() }
    time("t30 dsirSampleOf") {
      TextOps.dsirSampleOf(curated, "src0", 1024, 100).count()
    }
    val full = time("q34 curateLlmPacked (full)") {
      Curation.curateLlmPacked(spark, sfDir).count()
    }
    println(f"[q34] full gate: $full%6.2f s")
    curated.unpersist()
    spark.stop()
  }
}

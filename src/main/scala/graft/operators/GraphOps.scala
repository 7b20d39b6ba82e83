package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph computation — the one query shape the rest of the
  * surface lacks: a FIXED-POINT loop where iteration i's relation
  * feeds iteration i+1. PageRank is the canonical instance (the same
  * driver-side loop + keyed join/agg body runs label propagation,
  * SimRank, etc.); the gate wires it to the event-type transition
  * graph derived from `events`.
  *
  * Scale shape per iteration: ONE shuffle keyed on `dst` (the contrib
  * aggregation); the edges relation is hash-partitioned on `src` once
  * and REUSED by every iteration (persisted via ScratchCache), so the
  * per-iteration cost is a bounded |nodes|-sized build join against it
  * plus the dst-keyed agg — never a rescan of the raw event log. Each
  * iteration's ranks are eagerly localCheckpoint'd, so the logical
  * plan stays one-iteration deep (lineage does not accumulate — the
  * classic iterative-Spark trap; see the in-method comment for the
  * measured cost of caching without truncation). At web scale the
  * identical loop runs with |nodes| ≫ memory because ranks and edges
  * only ever meet in keyed joins.
  *
  * Semantics: the standard simplified PageRank (Brin & Page damping,
  * NO dangling-mass redistribution — mass leaking through sink nodes
  * is the common formulation and what the oracle replays; ranks then
  * sum to < 1 exactly when sinks exist, == 1 otherwise, spec-pinned).
  * Fixed `iters` iterations keep the gate deterministic; a production
  * run would stop on max |Δrank| < ε — the loop already has the delta
  * relation available (join ranks vs prev), documented rather than
  * dialed to keep the oracle a pure replay.
  */
object GraphOps {

  /** Weighted directed event-type transition graph: an edge (src →
    * dst, w) counts how often `dst` immediately followed `src` within
    * one user's event stream (ordered by ts, event_id — the q24-style
    * deterministic tie-break). One window pass + one bounded groupBy
    * (≤ |types|² keys). */
  def transitionEdges(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank over an (src, dst, w) edge list. Ranks start
    * uniform at 1/N; each iteration sends rank(src) × w/out_w(src)
    * along every edge and re-bases at (1−damping)/N + damping × Σ.
    * All arithmetic is plain double in the same association order as
    * the DuckDB oracle ((rank × w) / out_w; (1.0 − damping)/N), so
    * the engines agree to the final 6-dp rounding. */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0.0 && damping < 1.0)
    // Loop scratch is persisted MANUALLY, not via ScratchCache.arm: the
    // in-loop materializations are actions, and the arm sweep would
    // unpersist the edge relation right after iteration 1 read it.
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Non-positive-weight edges are DROPPED in-plan (documented
    // semantics, zero cost): a w <= 0 edge would put 0 (or a negative)
    // into out_w and turn every downstream division into a silent
    // NaN/Inf that ranks as if it were data. A no-op for count-derived
    // edge lists like transitionEdges (counts are >= 1).
    val e = edges.filter(col("w") > 0)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().persist(sl)
    val outW = e.groupBy(col("src")).agg(sum(col("w").cast("double")).as("out_w"))
    val ed = e.select(col("src"), col("dst"), col("w").cast("double").as("w"))
      .join(outW, "src").persist(sl) // (src, dst, w, out_w), reused every iteration
    val n = nodes.count() // one scalar aggregate, driver-held like the IVF model
    val base = lit((1.0 - damping) / n)
    // Each generation is an EAGER localCheckpoint: persist+count alone
    // caches the DATA but the logical plan still deepens by one
    // join+agg per generation, and Catalyst re-analyzes the whole
    // chain on every action — measured SUPERLINEAR driver cost (10
    // iterations 7.6× the price of 5 on the 5-node gate graph). The
    // checkpoint truncates lineage to the materialized blocks, holding
    // plan depth (and per-iteration cost) constant. Generation blocks
    // are freed by the ContextCleaner as references drop — the
    // documented localCheckpoint trade; a fault-tolerant cluster run
    // swaps in reliable checkpoint() + setCheckpointDir, same loop.
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contribs = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("out_w")).as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    nodes.unpersist(blocking = false)
    ed.unpersist(blocking = false)
    ranks.select(col("node"), round(col("rank"), 6).as("pr"))
  }

  /** q36: PageRank of the event-type transition graph. */
  def eventPageRank(spark: SparkSession, dir: String,
                    iters: Int = 10, damping: Double = 0.85): DataFrame =
    pageRank(transitionEdges(spark, dir), iters, damping)

  /** q36's oracle, parameterized by (iters, damping): the same edge
    * derivation (LEAD window with the same tie-break), then `iters`
    * mechanically-chained iteration CTEs replaying the identical
    * double arithmetic. */
  private def pageRankSql(iters: Int, damping: Double): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT ed.dst AS node, SUM(r.rank * ed.w / ed.out_w) AS s
         |  FROM ed JOIN r${i - 1} r ON r.node = ed.src GROUP BY ed.dst),
         |r$i AS (
         |  SELECT nodes.node,
         |         (1.0 - $damping) / nn.n + $damping * COALESCE(c.s, 0.0) AS rank
         |  FROM nodes CROSS JOIN nn LEFT JOIN c$i c ON c.node = nodes.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH nxt AS (
       |  SELECT event_type AS src,
       |         LEAD(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts, event_id) AS dst
       |  FROM events),
       |e AS (
       |  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
       |  FROM nxt WHERE dst IS NOT NULL GROUP BY src, dst),
       |ed AS (
       |  SELECT e.*, SUM(w) OVER (PARTITION BY src) AS out_w FROM e),
       |nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
       |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT node, ROUND(rank, 6) AS pr FROM r$iters""".stripMargin
  }

  /** Fold a maintained edge store's committed `batch_id=` partitions
    * into the `batch_id=-1` base (the round-15 BatchFold contract —
    * [[graft.sources.BatchFold]]): counts are additive, so the base is
    * simply the per-(src, dst) SUM of everything folded, one file. */
  def foldMaintainedEdges(spark: SparkSession, edgesDir: String,
                          excludeBatchId: Long): Int =
    graft.sources.BatchFold.fold(spark, edgesDir, excludeBatchId) {
      (rows, staging) =>
        rows.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
          .coalesce(1)
          .write.mode("overwrite").parquet(staging)
    }

  /** Current edge relation of a maintained store: per-(src, dst) sums
    * across the base and every live batch partition. */
  def maintainedEdges(spark: SparkSession, edgesDir: String): DataFrame =
    spark.read.parquet(edgesDir)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_pagerank" -> ((s, d) => eventPageRank(s, d)),
    "q36_pagerank_dial2" -> ((s, d) => eventPageRank(s, d, iters = 5, damping = 0.5)),
  )

  val oracle: Map[String, String] = Map(
    "q36_pagerank" -> pageRankSql(10, 0.85),
    "q36_pagerank_dial2" -> pageRankSql(5, 0.5),
  )
}

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
  * Fixed `iters` iterations keep the gate deterministic (a pure oracle
  * replay); the production stop rule is [[pageRankConverged]] — run
  * until max |Δrank| < tol with an iteration cap as backstop, the same
  * loop body plus one node-sized delta aggregate per iteration.
  *
  * [[minLabelComponents]] is the loop discipline's second instance:
  * min-label propagation to connected components (the distributed
  * semantics of Dedup.componentsOf's fall-through, re-expressed on
  * this loop), gated over the adjacent-bigram token graph (q37).
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
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
               driverMaxEdges: Int = defaultDriverMaxEdges): DataFrame =
    pageRankLoop(edges, iters, damping, tol = 0.0, driverMaxEdges)._1

  /** Edge bound under which the iterative loops run on the DRIVER
    * (collect once, iterate in memory, ship the node-sized result
    * back) instead of launching diameter-many distributed rounds — the
    * d7 `componentsOf` union-find precedent applied to the fixed-point
    * loops. The gate graphs are structurally bounded (q36: ≤ |event
    * types|² transition edges; q37: the ≥ minCount collocation graph),
    * and a distributed round costs 2 jobs + a shuffle + an eager
    * checkpoint EACH — measured ~0.3 s/iteration of pure fixed cost on
    * an 11-node graph while 31 cores idle (opt guide §5: the driver
    * should do almost no data work — but node-bounded iteration on a
    * collected SMALL graph is less driver work than scheduling 10×
    * that many jobs). The collect is STRICTLY bounded
    * (limit driverMaxEdges+1); oversized graphs fall through to the
    * distributed loop unchanged. 0 forces the distributed path. */
  val defaultDriverMaxEdges: Int = 100000

  /** UTF-8 binary ordering for driver-side label minima — matches both
    * Spark's `least`/`min` on StringType (UTF8String compares unsigned
    * UTF-8 bytes) and DuckDB's binary collation; Java's
    * String.compareTo compares UTF-16 chars, which DIVERGES on
    * supplementary-plane text, so it must not be used here. */
  private val utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** Ordering for a node column's runtime values, when the type has a
    * driver-replicable one (None → caller stays distributed). */
  private def nodeOrdering(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => Some(utf8Ordering.asInstanceOf[Ordering[Any]])
      case LongType => Some(Ordering.Long.asInstanceOf[Ordering[Any]])
      case IntegerType => Some(Ordering.Int.asInstanceOf[Ordering[Any]])
      case ShortType => Some(Ordering.Short.asInstanceOf[Ordering[Any]])
      case _ => None
    }
  }

  /** The production stop rule: iterate until max |Δrank| < `tol`
    * (checked on the UNROUNDED ranks), with `maxIters` as the backstop
    * for graphs that converge slowly or not at all at this tolerance.
    * Returns (ranks, iterations actually run). The converged result
    * equals [[pageRank]] at exactly that depth — same loop, same
    * arithmetic; the delta check is one extra |nodes|-sized join+max
    * per iteration against the previous generation's checkpointed
    * blocks (never a rescan of edges), so the check costs a small
    * fraction of the iteration that produced the ranks. */
  def pageRankConverged(edges: DataFrame, tol: Double = 1e-6,
                        maxIters: Int = 50,
                        damping: Double = 0.85,
                        driverMaxEdges: Int = defaultDriverMaxEdges): (DataFrame, Int) = {
    require(tol > 0.0, s"tol ($tol) must be > 0; use pageRank for fixed iterations")
    pageRankLoop(edges, maxIters, damping, tol, driverMaxEdges)
  }

  /** SMALL-GRAPH FAST PATH (see [[defaultDriverMaxEdges]]): the whole
    * loop on the driver over a bounded collect, identical arithmetic
    * to the distributed body ((rank × w) / out_w per edge, base +
    * damping × Σ per node, coalesce-to-0 for contribution-less nodes;
    * the Σ association order differs by partitioning in the
    * distributed form too, so the cross-path noise is the same
    * ≤ ulp-scale the cross-ENGINE oracle already tolerates at the 6-dp
    * rounding). Returns None when the graph exceeds the bound or the
    * node type has no local representation. */
  private def pageRankDriver(edges: DataFrame, iters: Int, damping: Double,
                             tol: Double, maxEdges: Int): Option[(DataFrame, Int)] = {
    val spark = edges.sparkSession
    val nodeType = edges.schema("src").dataType
    // rank keys only need equality, but keep the supported-type set
    // explicit and small (the components ordering set); anything
    // exotic stays distributed
    if (nodeOrdering(nodeType).isEmpty) return None
    val sample = edges.filter(col("w") > 0)
      .select(col("src"), col("dst"), col("w").cast("double").as("w"))
      .limit(maxEdges + 1).collect()
    if (sample.length > maxEdges) return None
    // null src/dst: the distributed loop's join-equality semantics
    // (null never matches, but null still appears in the node union)
    // have no cheap driver replica — defer to the canonical path
    // instead of diverging (ADVICE r18)
    if (sample.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None
    import scala.collection.mutable
    val outW = mutable.LinkedHashMap.empty[Any, Double]
    val nodes = mutable.LinkedHashSet.empty[Any]
    sample.foreach { r =>
      val (s, d, w) = (r.get(0), r.get(1), r.getDouble(2))
      outW.update(s, outW.getOrElse(s, 0.0) + w)
      nodes += s; nodes += d
    }
    val n = nodes.size
    if (n == 0) {
      // no positive-weight edges → no nodes, the distributed loop's
      // empty result with the same schema
      return Some((emptyRanks(spark, nodeType), 0))
    }
    val base = (1.0 - damping) / n
    var rank = nodes.iterator.map(_ -> 1.0 / n).to(mutable.LinkedHashMap)
    var itersRun = 0
    var converged = false
    while (itersRun < iters && !converged) {
      val contrib = mutable.HashMap.empty[Any, Double]
      sample.foreach { r =>
        val (s, d, w) = (r.get(0), r.get(1), r.getDouble(2))
        contrib.update(d, contrib.getOrElse(d, 0.0) + rank(s) * w / outW(s))
      }
      var maxDelta = 0.0
      val next = nodes.iterator.map { nd =>
        val v = base + damping * contrib.getOrElse(nd, 0.0)
        if (tol > 0.0) maxDelta = math.max(maxDelta, math.abs(v - rank(nd)))
        nd -> v
      }.to(mutable.LinkedHashMap)
      rank = next
      itersRun += 1
      if (tol > 0.0) converged = maxDelta < tol
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(nodes.iterator.map(nd =>
        org.apache.spark.sql.Row(nd,
          BigDecimal(rank(nd)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)).toSeq: _*)
    Some((spark.createDataFrame(rows, ranksSchema(nodeType)), itersRun))
  }

  private def ranksSchema(nodeType: org.apache.spark.sql.types.DataType) =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("pr",
        org.apache.spark.sql.types.DoubleType)))

  private def emptyRanks(spark: SparkSession,
                         nodeType: org.apache.spark.sql.types.DataType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      ranksSchema(nodeType))

  private def pageRankLoop(edges: DataFrame, iters: Int, damping: Double,
                           tol: Double,
                           driverMaxEdges: Int = defaultDriverMaxEdges): (DataFrame, Int) = {
    require(iters >= 1 && damping > 0.0 && damping < 1.0)
    if (driverMaxEdges > 0) {
      pageRankDriver(edges, iters, damping, tol, driverMaxEdges) match {
        case Some(r) => return r
        case None => () // oversized or exotic node type: distributed
      }
    }
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
    if (n == 0) {
      // no positive-weight edges → no nodes: return the empty ranks
      // relation with itersRun = 0, agreeing with the driver fast path
      // and closing the tol > 0 NPE (max over an empty aggregate is
      // null) — ADVICE r18
      nodes.unpersist(blocking = false)
      ed.unpersist(blocking = false)
      return (emptyRanks(edges.sparkSession, edges.schema("src").dataType), 0)
    }
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
    var itersRun = 0
    var converged = false
    while (itersRun < iters && !converged) {
      val prev = ranks
      val contribs = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("out_w")).as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("s"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      itersRun += 1
      if (tol > 0.0) {
        // both sides are checkpointed node-sized relations — the delta
        // probe never touches the edge relation
        val maxDelta = ranks.join(prev.select(col("node"),
            col("rank").as("prev_rank")), "node")
          .agg(max(abs(col("rank") - col("prev_rank")))).collect()(0).getDouble(0)
        converged = maxDelta < tol
      }
    }
    nodes.unpersist(blocking = false)
    ed.unpersist(blocking = false)
    (ranks.select(col("node"), round(col("rank"), 6).as("pr")), itersRun)
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

  /** Connected components by min-label propagation — the fixed-point
    * loop's SECOND instance, proving the discipline (eager
    * localCheckpoint per generation, one persisted+reused edge
    * relation, one keyed shuffle per iteration) is generic and not a
    * PageRank special case. Semantically the distributed fall-through
    * of Dedup.componentsOf (d7's min-label machinery), re-expressed on
    * this loop: labels start at the node's own id; each iteration
    * every node takes the minimum of its label and its neighbors'
    * labels; after convergence the label IS the component's minimum
    * node id. `pairs` is an undirected pair list in either
    * orientation — symmetrized (and deduplicated) here.
    *
    * Fixed `maxIters` keeps the gate oracle a mechanical CTE replay
    * (like q36); the loop additionally stops EARLY when an iteration
    * changes no label, which cannot diverge from the oracle: min-label
    * propagation is monotone and idempotent at the fixpoint, so
    * iterations after convergence are no-ops in both engines. The
    * early-stop probe is one |changed-nodes| existence check per
    * iteration between two checkpointed node-sized generations.
    *
    * Scale shape: identical to pageRank's — per iteration ONE shuffle
    * keyed on `dst` (the neighbor-min aggregation) against the reused
    * edge relation; labels never leave keyed joins, so |nodes| ≫
    * memory runs fine. Iterations needed = component diameter (the
    * classic min-label bound); at web scale the large-star/small-star
    * optimization would cut that — out of scope, documented. */
  def minLabelComponents(pairs: DataFrame, maxIters: Int = 8,
                         driverMaxEdges: Int = defaultDriverMaxEdges): DataFrame = {
    require(maxIters >= 1)
    // SMALL-GRAPH FAST PATH (see defaultDriverMaxEdges): the bounded-hop
    // min-label propagation on the driver — NOT union-find (d7's exact
    // fixpoint): the contract here is "minimum label reachable within
    // maxIters hops", so the driver replays the same per-iteration
    // simultaneous update (label ← min(label, min over neighbors of
    // their PREVIOUS label)) with the same early stop (an unchanged
    // iteration is a fixpoint in both engines). String minima use
    // UTF-8 binary order (what Spark's `least` and DuckDB's binary
    // collation both compute). Bounded collect; oversized graphs fall
    // through unchanged; driverMaxEdges=0 forces the distributed path.
    if (driverMaxEdges > 0) {
      val nodeType = pairs.schema("src").dataType
      nodeOrdering(nodeType) match {
        case Some(ord) =>
          val sample = pairs.select(col("src"), col("dst"))
            .limit(driverMaxEdges + 1).collect()
          // null endpoints: fall through to the distributed loop (its
          // join-equality null semantics are canonical — ADVICE r18);
          // the sample is the COMPLETE edge set whenever it fits the
          // bound, so the existence check cannot miss a null
          if (sample.length <= driverMaxEdges &&
              !sample.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
            import scala.collection.mutable
            // symmetrized, deduplicated adjacency (the distributed
            // union+distinct), insertion-ordered for determinism
            val adj = mutable.LinkedHashMap.empty[Any, mutable.LinkedHashSet[Any]]
            def addEdge(s: Any, d: Any): Unit =
              adj.getOrElseUpdate(s, mutable.LinkedHashSet.empty[Any]) += d
            sample.foreach { r =>
              val (s, d) = (r.get(0), r.get(1))
              addEdge(s, d); addEdge(d, s)
            }
            var label = adj.keysIterator.map(n => n -> n).to(mutable.LinkedHashMap)
            var itersRun = 0
            var converged = false
            while (itersRun < maxIters && !converged) {
              var changed = false
              val next = adj.iterator.map { case (n, nbrs) =>
                // neighbor minimum over the PREVIOUS generation — the
                // distributed loop's simultaneous update
                var m = label(n)
                nbrs.foreach { s =>
                  val l = label(s)
                  if (ord.lt(l, m)) m = l
                }
                if (m != label(n)) changed = true
                n -> m
              }.to(mutable.LinkedHashMap)
              label = next
              converged = !changed
              itersRun += 1
            }
            val schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("node", nodeType),
              org.apache.spark.sql.types.StructField("label", nodeType)))
            val rows: java.util.List[org.apache.spark.sql.Row] =
              java.util.Arrays.asList(adj.keysIterator.map(n =>
                org.apache.spark.sql.Row(n, label(n))).toSeq: _*)
            return pairs.sparkSession.createDataFrame(rows, schema)
          }
        case None => () // exotic node type: distributed
      }
    }
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ed = pairs.select(col("src"), col("dst"))
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist(sl)
    var labels = ed.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var itersRun = 0
    var converged = false
    while (itersRun < maxIters && !converged) {
      val neighborMin = ed.join(labels, ed("src") === labels("node"))
        .groupBy(ed("dst").as("node")).agg(min(col("label")).as("minl"))
      val next = labels.select(col("node"), col("label").as("old_label"))
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("old_label"),
          least(col("old_label"), coalesce(col("minl"), col("old_label")))
            .as("label"))
        .localCheckpoint(true)
      converged = next.filter(col("label") =!= col("old_label")).isEmpty
      labels = next.select(col("node"), col("label"))
      itersRun += 1
    }
    ed.unpersist(blocking = false)
    labels
  }

  /** q37's graph: the PER-LANGUAGE adjacent-bigram token graph — an
    * edge (lang:w1, lang:w2) whenever the bigram "w1 w2" occurs ≥
    * `minCount` times within one language's documents (t37's support
    * floor, same derivation, stratified like t36's sampler). Components
    * are per-language collocation families — the phrase-vocabulary
    * clusters a tokenizer-prep pass groups before merging; keying
    * nodes by language keeps the gate graph genuinely multi-component
    * (components cannot cross languages by construction). Vocab-
    * bounded like every t11/t19-family shape: the one corpus scan
    * feeds a distinct-(lang, bigram)-bounded aggregation, never a
    * corpus-sized shuffle. */
  def bigramEdges(spark: SparkSession, dir: String, minCount: Long = 5): DataFrame = {
    require(minCount >= 1)
    Tables.documents(spark, dir)
      .select(col("lang"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("lang"), explode(TextOps.tokenWindows(col("toks"), 2, 1)).as("bg"))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .select(
        concat(col("lang"), lit(":"), substring_index(col("bg"), " ", 1)).as("src"),
        concat(col("lang"), lit(":"), substring_index(col("bg"), " ", -1)).as("dst"))
  }

  /** q37: connected components of the bigram token graph. Output one
    * (tok, component) row per token that participates in a kept
    * bigram; component = lexicographic minimum token reachable within
    * `maxIters` hops (both engines replay the same depth). */
  def tokenComponents(spark: SparkSession, dir: String,
                      minCount: Long = 5, maxIters: Int = 8): DataFrame =
    minLabelComponents(bigramEdges(spark, dir, minCount), maxIters)
      .select(col("node").as("tok"), col("label").as("component"))

  /** q37's oracle, parameterized by (minCount, iters): the t37 bigram
    * derivation, symmetrized by UNION (which deduplicates, matching
    * the operator's union+distinct), then `iters` mechanically-chained
    * min-label CTEs — c_i takes each node's neighbor minimum, l_i
    * folds it in with LEAST. */
  private def tokenComponentsSql(minCount: Long, iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT ed.dst AS node, MIN(l.label) AS minl
         |  FROM ed JOIN l${i - 1} l ON l.node = ed.src GROUP BY ed.dst),
         |l$i AS (
         |  SELECT l.node, LEAST(l.label, COALESCE(c.minl, l.label)) AS label
         |  FROM l${i - 1} l LEFT JOIN c$i c ON c.node = l.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT lang, string_split_regex(TRIM(text), '\\s+') AS t FROM documents),
       |bgx AS (
       |  SELECT lang, UNNEST([array_to_string(t[i+1:i+2], ' ')
       |                       FOR i IN range(0, GREATEST(LEN(t)-2, 0) + 1)]) AS bg
       |  FROM toks WHERE LEN(t) >= 2),
       |bc AS (
       |  SELECT lang, bg FROM bgx GROUP BY lang, bg HAVING COUNT(*) >= $minCount),
       |e0 AS (
       |  SELECT lang || ':' || split_part(bg, ' ', 1) AS src,
       |         lang || ':' || split_part(bg, ' ', 2) AS dst
       |  FROM bc),
       |ed AS (
       |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |l0 AS (
       |  SELECT node, node AS label FROM (SELECT DISTINCT src AS node FROM ed)),
       |$iterCtes
       |SELECT node AS tok, label AS component FROM l$iters""".stripMargin
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
    "q37_token_components" -> ((s, d) => tokenComponents(s, d)),
    "q37_token_components_dial2" -> ((s, d) =>
      tokenComponents(s, d, minCount = 10, maxIters = 4)),
  )

  val oracle: Map[String, String] = Map(
    "q36_pagerank" -> pageRankSql(10, 0.85),
    "q36_pagerank_dial2" -> pageRankSql(5, 0.5),
    "q37_token_components" -> tokenComponentsSql(5, 8),
    "q37_token_components_dial2" -> tokenComponentsSql(10, 4),
  )
}

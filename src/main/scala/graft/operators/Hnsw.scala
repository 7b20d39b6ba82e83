package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HNSW-style graph ANN — encode family #5, and the first family whose
  * index is a NAVIGABLE GRAPH rather than an inverted file (Malkov &
  * Yashunin 2016, the structure behind most modern vector stores).
  *
  * Division of labor (the pattern every graft ANN family follows —
  * candidate GENERATION may approximate, SCORING is exact Spark):
  * the graph is built and searched ON THE DRIVER behind the loud
  * `driverMaxVectors` bound (the union-find `driverMaxEdges` pattern:
  * a graph walk is inherently sequential random access — no Spark
  * operator expresses it without one round-trip per hop — so the
  * honest formulation is a bounded driver structure, refusing loudly
  * past the bound), and each query's ef-search SHORTLIST is rescored
  * IN SPARK with the same `cosine` expression and (cos desc, vec_id)
  * window every other family uses. Gate equality with the exact v1
  * sweep therefore only needs the shortlist to CONTAIN the true
  * top-k — the IVF families' recall-complete-dial contract, probed by
  * the same `tools/Probe` harness (family `hnsw`, dial `efSearch`) and
  * auto-demoted by Verify if a regenerated corpus ever breaks it.
  *
  * 100 TB story: HNSW is the IN-MEMORY SERVING family — the graph (a
  * few hundred bytes/vector) lives where the search runs. At corpus
  * scale you shard: one graph per corpus partition, fan the query to
  * every shard, merge top-k (exactly how distributed vector stores
  * deploy HNSW). Here the driver IS the one serving shard, the bound
  * is explicit, and `driverMaxVectors` names the sharded path instead
  * of silently collecting a corpus that doesn't fit.
  *
  * Determinism (the gate precondition): level assignment is
  * hash-derived (no RNG state), insertion order is ascending vec_id,
  * all candidate orderings break ties on (distance, id), and
  * distances are sequential double folds — the same graph and the
  * same shortlists on every run, so recall-completeness on a pinned
  * corpus is a fact the probe can check, not a probability. */
object Hnsw {

  /** Refuse-loudly bound for the driver-held graph (vectors + adjacency
    * both live on the driver during build/search). 64-dim floats at
    * 2M vectors ≈ 0.5 GB + adjacency ≈ 0.13 GB — comfortable; past it,
    * shard the corpus and merge per-shard top-k (see class doc). */
  val driverMaxVectors: Int = 2000000

  /** In-memory graph: `ids` maps node index → vec_id (ascending),
    * `vecs` the corpus vectors, `layers(l)(node)` the adjacency at
    * level l (empty array when the node doesn't reach l). */
  final class Graph(val ids: Array[Long], val vecs: Array[Array[Float]],
                    val layers: Array[Array[Array[Int]]],
                    val entry: Int, val maxLevel: Int, val m: Int,
                    val efConstruction: Int)

  /** 1 − cosine, sequential double fold — smaller is closer. */
  private def dist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0) 1.0 else 1.0 - dot / denom
  }

  /** Deterministic geometric level: the standard floor(−ln(u)·mL) with
    * u hash-derived from the vec_id (XXH64, seed 42 — the plane-matrix
    * convention), mL = 1/ln(m). No RNG state anywhere. */
  private def levelOf(id: Long, m: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val h = XXH64.hashLong(id, 42L)
    // map to (0, 1]: (h >>> 11) has 53 uniform bits; +1 avoids ln(0)
    val u = ((h >>> 11) + 1).toDouble / (1L << 53).toDouble
    (-math.log(u) / math.log(m.toDouble)).toInt
  }

  private val ord: Ordering[(Double, Int)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)

  /** ef-bounded best-first search on one layer (Malkov Alg. 2), from
    * `entries`. `neighbors` abstracts the adjacency so the BUILD (live
    * ArrayBuffers) and SEARCH (frozen arrays) paths share one walk
    * without copying adjacency per call. Returns up to `ef` nearest
    * (dist, node) pairs, every ordering tie-broken (dist, node) so the
    * walk — and thus the graph build — is deterministic. */
  private def searchLayer(q: Array[Float], entries: Seq[(Double, Int)],
                          ef: Int, neighbors: Int => scala.collection.IndexedSeq[Int],
                          vecs: Array[Array[Float]],
                          visited: java.util.BitSet): Seq[(Double, Int)] = {
    val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord.reverse) // min-first
    val found = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord) // max-first
    visited.clear()
    entries.foreach { e =>
      if (!visited.get(e._2)) {
        visited.set(e._2); cand.enqueue(e); found.enqueue(e)
        if (found.size > ef) found.dequeue()
      }
    }
    while (cand.nonEmpty) {
      val c = cand.dequeue()
      if (found.size >= ef && ord.gt((c._1, c._2), found.head)) {
        cand.clear() // nearest unexpanded is farther than the worst kept → done
      } else {
        val ns = neighbors(c._2)
        var i = 0
        while (i < ns.length) {
          val n = ns(i)
          if (!visited.get(n)) {
            visited.set(n)
            val d = (dist(q, vecs(n)), n)
            if (found.size < ef || ord.lt(d, found.head)) {
              cand.enqueue(d); found.enqueue(d)
              if (found.size > ef) found.dequeue()
            }
          }
          i += 1
        }
      }
    }
    found.dequeueAll.reverse // nearest first
  }

  private val emptyAdj: scala.collection.IndexedSeq[Int] = Vector.empty

  /** Neighbor selection, Malkov Alg. 4 (the HEURISTIC, with pruned
    * backfill — hnswlib's default): walk candidates nearest-first and
    * keep one only if it is closer to `base` than to every
    * already-kept neighbor, then backfill remaining slots from the
    * pruned, nearest-first. Plain top-M selection fills a node's list
    * with its own cluster's members and drops the long-range links
    * greedy navigation needs — measured on the clustered ladder
    * corpus as a recall PLATEAU (~0.60 at ANY ef: the walk cannot
    * reach 40% of true neighbors); the heuristic keeps one edge per
    * "direction" instead, restoring reachability. Deterministic:
    * candidates arrive (dist, id)-sorted and ties prune (strict <),
    * with the backfill re-adding them in the same order. */
  private def selectHeuristic(base: Array[Float], cands: Seq[(Double, Int)],
                              m: Int, vecs: Array[Array[Float]]): Seq[(Double, Int)] = {
    val sorted = cands.sorted(ord)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
    val pruned = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
    val it = sorted.iterator
    while (it.hasNext && kept.length < m) {
      val c = it.next()
      if (kept.forall { case (_, r) => c._1 < dist(vecs(c._2), vecs(r)) })
        kept += c
      else pruned += c
    }
    val fill = pruned.iterator
    while (kept.length < m && fill.hasNext) kept += fill.next()
    kept.toSeq
  }

  /** Build the graph: ascending-vec_id insertion, simple-heuristic
    * neighbor selection (top-M by distance — deterministic), Mmax = m
    * above level 0 and 2m at level 0 (the paper's defaults). */
  def buildGraph(ids: Array[Long], vecs: Array[Array[Float]],
                 m: Int, efConstruction: Int): Graph = {
    require(ids.length == vecs.length, "ids/vecs length mismatch")
    require(ids.length <= driverMaxVectors,
      s"Hnsw.buildGraph: ${ids.length} vectors exceeds driverMaxVectors=" +
        s"$driverMaxVectors — the graph is driver-held; shard the corpus " +
        "(one graph per shard, merge per-shard top-k) past this bound")
    val n = ids.length
    val levels = Array.tabulate(n)(i => levelOf(ids(i), m))
    val maxLevel = if (n == 0) 0 else levels.max
    // layers(l)(node): growable neighbor lists during build
    val adj = Array.fill(maxLevel + 1, n)(null: scala.collection.mutable.ArrayBuffer[Int])
    for (l <- 0 to maxLevel; i <- 0 until n)
      if (levels(i) >= l) adj(l)(i) = scala.collection.mutable.ArrayBuffer.empty[Int]
    val visited = new java.util.BitSet(n)
    var entry = -1
    var entryLevel = -1
    def live(l: Int): Int => scala.collection.IndexedSeq[Int] =
      node => { val b = adj(l)(node); if (b == null) emptyAdj else b }
    for (i <- 0 until n) {
      val q = vecs(i)
      val lvl = levels(i)
      if (entry < 0) { entry = i; entryLevel = lvl }
      else {
        var ep = Seq((dist(q, vecs(entry)), entry))
        // greedy descent through layers above the node's level
        var l = entryLevel
        while (l > lvl) {
          ep = searchLayer(q, ep, 1, live(l), vecs, visited).take(1)
          l -= 1
        }
        // connect on each layer from min(lvl, entryLevel) down to 0
        l = math.min(lvl, entryLevel)
        while (l >= 0) {
          val cands = searchLayer(q, ep, efConstruction, live(l), vecs, visited)
          val mmax = if (l == 0) 2 * m else m
          val chosen = selectHeuristic(q, cands, m, vecs)
          chosen.foreach { case (_, c) =>
            adj(l)(i) += c
            val back = adj(l)(c)
            back += i
            if (back.length > mmax) {
              // shrink with the same heuristic, base = the overflowing
              // node (keeps ITS long-range links too)
              val kept = selectHeuristic(vecs(c),
                back.map(x => (dist(vecs(c), vecs(x)), x)).toSeq, mmax, vecs)
              back.clear(); back ++= kept.map(_._2)
            }
          }
          ep = cands
          l -= 1
        }
        if (lvl > entryLevel) { entry = i; entryLevel = lvl }
      }
    }
    new Graph(ids, vecs,
      Array.tabulate(maxLevel + 1)(l =>
        adj(l).map(b => if (b == null) Array.empty[Int] else b.toArray)),
      entry, entryLevel, m, efConstruction)
  }

  /** Search the graph for `q`: greedy descent to layer 0, then one
    * ef-bounded layer-0 sweep; nearest-first (dist, node) pairs. */
  def search(g: Graph, q: Array[Float], ef: Int,
             visited: java.util.BitSet): Seq[(Double, Int)] = {
    if (g.ids.isEmpty) return Nil
    def frozen(l: Int): Int => scala.collection.IndexedSeq[Int] =
      node => scala.collection.immutable.ArraySeq.unsafeWrapArray(g.layers(l)(node))
    var ep = Seq((dist(q, g.vecs(g.entry)), g.entry))
    var l = g.maxLevel
    while (l > 0) {
      ep = searchLayer(q, ep, 1, frozen(l), g.vecs, visited).take(1)
      l -= 1
    }
    searchLayer(q, ep, ef, frozen(0), g.vecs, visited)
  }

  /** Session graph memo — the centsFor/booksFor pattern: the graph is a
    * deterministic function of (corpus, m, efConstruction), so a session
    * answering many queries builds it once (the production shape: build
    * once, serve). */
  private val graphMemo = new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Int), Graph]()
  private[graft] def invalidateGraphMemo(): Unit = graphMemo.clear()

  private[graft] def graphFor(spark: SparkSession, dir: String,
                              m: Int, efConstruction: Int): Graph =
    // keyed by applicationId like every model memo in Similarity
    // (centsFor/booksFor): a corpus regenerated under a new session at
    // the same path must rebuild, never serve a stale graph
    graphMemo.computeIfAbsent((spark.sparkContext.applicationId, dir, m, efConstruction), _ => {
      // bounded collect: the corpus vector relation, checked against
      // driverMaxVectors BEFORE collecting (count is a cheap column-
      // pruned scan; collecting first would OOM before the require)
      val emb = Tables.embeddings(spark, dir)
      val nVec = emb.count()
      require(nVec <= driverMaxVectors,
        s"Hnsw: corpus has $nVec vectors, driverMaxVectors=$driverMaxVectors " +
          "— shard the corpus (one graph per shard, merge per-shard top-k)")
      import spark.implicits._
      val rows = emb.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      buildGraph(rows.map(_._1), rows.map(_._2), m, efConstruction)
    })

  /** v18: HNSW ANN — driver graph search generates each query's
    * efSearch-shortlist; Spark rescores exactly (same cosine
    * expression + (cos desc, vec_id) window as every family) and cuts
    * top-k. Gate profile: the Probe-verified recall-complete efSearch
    * (see `tools/Probe` family `hnsw`); production dials are the
    * defaults. */
  def annHnsw(spark: SparkSession, dir: String, nQueries: Int = 10,
              k: Int = 5, m: Int = 8, efConstruction: Int = 96,
              efSearch: Int = 64): DataFrame = {
    val g = graphFor(spark, dir, m, efConstruction)
    val emb = Tables.embeddings(spark, dir)
    shortlistRescore(spark, emb, g, nQueries, k, efSearch)
  }

  /** Shared by [[annHnsw]] and the at-rest serve path: search the
    * graph for the first `nQueries` corpus vectors, rescore in Spark. */
  private def shortlistRescore(spark: SparkSession, emb: DataFrame, g: Graph,
                               nQueries: Int, k: Int, efSearch: Int): DataFrame = {
    import spark.implicits._
    // driver-held queries (≤ nQueries rows — the model-collect pattern)
    val qs = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val visited = new java.util.BitSet(g.ids.length)
    // shortlist pairs: (query_id, candidate vec_id); self-matches are
    // dropped here AND filtered in the rescore (belt and braces)
    val pairs = qs.flatMap { case (qid, qv) =>
      search(g, qv, efSearch, visited)
        .map { case (_, node) => (qid, g.ids(node)) }
        .filter(_._2 != qid)
    }
    val shortlist = spark.createDataset(pairs.toSeq)
      .toDF("query_id", "vec_id")
    val qdf = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    shortlist
      .join(emb, "vec_id")
      .join(broadcast(qdf), "query_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
  }

  // ---------------------------------------------------------------
  // At-rest index (the writeAnnIndex deployment split, graph-shaped)
  // ---------------------------------------------------------------

  /** The graph AT REST: `graph/` holds one row per (node, level) with
    * its neighbor list — vec_ids, not node indexes, so the relation is
    * self-contained — plus the entry point; `_meta.json` pins the
    * build dials (the IndexMeta contract shared with the IVF and
    * dedup indexes: a serve re-deriving a DIFFERENT graph from
    * different dials would silently change recall). Vectors are NOT
    * duplicated into the index — serve loads them from the corpus
    * relation (the codes-only trade; at 2M×64 floats they are the
    * same 0.5 GB either way). */
  def writeHnswIndex(spark: SparkSession, dir: String, out: String,
                     m: Int = 8, efConstruction: Int = 96): Unit = {
    val g = graphFor(spark, dir, m, efConstruction)
    graft.sources.IndexMeta.write(out, Seq(
      "family" -> "hnsw", "m" -> m, "efConstruction" -> efConstruction,
      "entryId" -> g.ids(g.entry), "maxLevel" -> g.maxLevel))
    val rows = for {
      l <- (0 to g.maxLevel).iterator
      node <- g.layers(l).indices.iterator
      if g.layers(l)(node).nonEmpty || (l == 0 && g.ids.length == 1)
    } yield (g.ids(node), l, g.layers(l)(node).map(g.ids(_)).toSeq)
    import spark.implicits._
    spark.createDataset(rows.toSeq)
      .toDF("vec_id", "level", "neighbor_ids")
      .repartition(1) // a few hundred B/vector — one file reads fastest
      .write.mode("overwrite").parquet(s"$out/graph")
  }

  /** Serve memo: at-rest graphs reloaded once per (indexPath) — the
    * annIvfPqServeQueries model-memo idea for the graph family. */
  private val servedMemo = new java.util.concurrent.ConcurrentHashMap[(String, String, String), Graph]()
  private[graft] def invalidateServedMemo(): Unit = servedMemo.clear()

  /** Load a [[writeHnswIndex]] graph: dials and entry from `_meta.json`
    * (REQUIRED — the self-description contract), adjacency from
    * `graph/`, vectors from the CORPUS relation (which must contain
    * EXACTLY the indexed vec_ids — checked loudly below, because both
    * drift directions are silent recall loss: an indexed id missing
    * from the corpus has no vector to walk through, and a corpus
    * vector missing from the graph has no in-edges, so no walk can
    * ever shortlist it). */
  private def loadGraph(spark: SparkSession, dir: String, indexPath: String): Graph =
    // keyed by (applicationId, dir, indexPath) — the graph's VECTORS
    // come from `dir`, so the same index served against a different
    // corpus relation (or a regenerated one in a new session) must
    // reload, never reuse shortlists walked over the wrong vectors
    servedMemo.computeIfAbsent((spark.sparkContext.applicationId, dir, indexPath), _ => {
      import graft.sources.IndexMeta.{intField, strField}
      val meta = graft.sources.IndexMeta.readRaw(indexPath, "writeHnswIndex")
      require(strField(meta, "family") == "hnsw",
        s"$indexPath is a '${strField(meta, "family")}' index, not hnsw")
      val m = intField(meta, "m")
      val efC = intField(meta, "efConstruction")
      val maxLevel = intField(meta, "maxLevel")
      // entryId is a vec_id — parse as Long (intField would overflow on
      // a 64-bit id space)
      val entryId = {
        val mt = "\"entryId\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(meta)
        require(mt.isDefined, s"_meta.json missing entryId: $meta")
        mt.get.group(1).toLong
      }
      import spark.implicits._
      val emb = Tables.embeddings(spark, dir)
      val nVec = emb.count()
      require(nVec <= driverMaxVectors,
        s"Hnsw serve: corpus has $nVec vectors, driverMaxVectors=$driverMaxVectors")
      val rows = emb.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val ids = rows.map(_._1)
      val idx = ids.zipWithIndex.toMap
      // loud on BOTH drift directions (refuse-loudly house style):
      def resolve(id: Long, what: String): Int = idx.getOrElse(id,
        throw new IllegalArgumentException(
          s"Hnsw serve: indexed $what vec_id=$id is not in the corpus at " +
            s"$dir — the index at $indexPath was built over a different " +
            "corpus; rebuild it (writeHnswIndex) or serve the right dir"))
      val layers = Array.fill(maxLevel + 1, ids.length)(Array.empty[Int])
      val graphIds = scala.collection.mutable.LongMap.empty[Unit]
      spark.read.parquet(s"$indexPath/graph")
        .select(col("vec_id"), col("level"), col("neighbor_ids"))
        .as[(Long, Int, Seq[Long])].collect()
        .foreach { case (id, l, ns) =>
          graphIds.update(id, ())
          layers(l)(resolve(id, "graph-node")) =
            ns.map(resolve(_, "neighbor")).toArray
        }
      val orphans = ids.count(!graphIds.contains(_))
      require(orphans == 0,
        s"Hnsw serve: corpus at $dir has $orphans vectors the index at " +
          s"$indexPath never saw — un-indexed vectors have no in-edges, " +
          "so no graph walk can ever reach them (silent recall loss); " +
          "appendHnswIndex the new vectors or rebuild")
      new Graph(ids, rows.map(_._2), layers, resolve(entryId, "entry"), maxLevel, m, efC)
    })

  /** Serve v18 from the at-rest graph — same shortlist + exact Spark
    * rescore as the in-session operator, so serve == in-session at
    * equal dials (HnswSpec pins it). */
  def annHnswServe(spark: SparkSession, dir: String, indexPath: String,
                   nQueries: Int = 10, k: Int = 5,
                   efSearch: Int = 64): DataFrame = {
    val g = loadGraph(spark, dir, indexPath)
    shortlistRescore(spark, Tables.embeddings(spark, dir), g, nQueries, k, efSearch)
  }
}

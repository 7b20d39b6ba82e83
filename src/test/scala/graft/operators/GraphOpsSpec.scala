package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** PageRank invariants on controlled graphs (the DuckDB oracle pins
  * the event-transition values; these pin the operator's semantics on
  * graphs with known answers). */
class GraphOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ranksOf(edges: Seq[(String, String, Long)],
                      iters: Int = 10, damping: Double = 0.85): Map[String, Double] = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("src", "dst", "w"), iters, damping)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("symmetric 2-cycle: both nodes hold exactly 1/2") {
    val r = ranksOf(Seq(("a", "b", 1L), ("b", "a", 1L)))
    assert(r === Map("a" -> 0.5, "b" -> 0.5))
  }

  test("no sinks: ranks sum to 1; with a sink: mass leaks (documented variant)") {
    val cycle = ranksOf(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)))
    // each of the 3 emitted ranks is rounded to 6 dp, so the sum can
    // sit up to 1.5e-6 off exact unity
    assert(math.abs(cycle.values.sum - 1.0) < 2e-6)
    // d only receives: it is a sink, so total mass drops below 1
    val sink = ranksOf(Seq(("a", "b", 1L), ("b", "a", 1L), ("a", "d", 1L)))
    assert(sink.values.sum < 1.0 - 1e-4)
    assert(sink.keySet === Set("a", "b", "d"))
  }

  test("weight matters: the heavier-in-edge target outranks, hub outranks spokes") {
    // star: spokes all point at hub, hub spreads back evenly
    val star = ranksOf(Seq(
      ("s1", "hub", 1L), ("s2", "hub", 1L), ("s3", "hub", 1L),
      ("hub", "s1", 1L), ("hub", "s2", 1L), ("hub", "s3", 1L)))
    assert(star("hub") > star("s1") && star("s1") === star("s2"))
    // same topology, but b gets 9x a's weight from the source
    val wt = ranksOf(Seq(("src", "a", 1L), ("src", "b", 9L),
      ("a", "src", 1L), ("b", "src", 1L)))
    assert(wt("b") > wt("a"))
  }

  test("non-positive-weight edges are dropped, not propagated as NaN/Inf") {
    // a w=0 edge out of 'a' would zero nothing but poison out_w sums;
    // the result must equal the graph without that edge entirely
    val withZero = ranksOf(Seq(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 0L)))
    val without = ranksOf(Seq(("a", "b", 1L), ("b", "a", 1L)))
    assert(withZero === without)
    assert(withZero.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("deterministic: recompute returns identical rounded ranks") {
    val sf = "/root/testdata/sf0.001"
    val a = GraphOps.eventPageRank(spark, sf).collect().map(_.toSeq).toSet
    val b = GraphOps.eventPageRank(spark, sf).collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }

  test("pageRankConverged: early stop fires on a fast-converging graph") {
    import spark.implicits._
    // symmetric 2-cycle: ranks are exactly 1/2 from iteration 1 on, so
    // the delta probe sees 0 at iteration 2 and stops far below the cap
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val (ranks, itersRun) = GraphOps.pageRankConverged(edges, tol = 1e-12, maxIters = 50)
    assert(itersRun < 5, s"expected early stop, ran $itersRun iterations")
    val r = ranks.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r === Map("a" -> 0.5, "b" -> 0.5))
  }

  test("pageRankConverged == fixed-iters pageRank at the depth it stopped") {
    val sf = "/root/testdata/sf0.001"
    val edges = GraphOps.transitionEdges(spark, sf)
    val (converged, itersRun) = GraphOps.pageRankConverged(edges, tol = 1e-9, maxIters = 60)
    assert(itersRun < 60, s"gate graph should converge at 1e-9 within the cap")
    val fixed = GraphOps.pageRank(edges, iters = itersRun)
    assert(converged.collect().map(_.toSeq).toSet ===
      fixed.collect().map(_.toSeq).toSet)
  }

  test("minLabelComponents: disjoint chains get their minimum as label") {
    import spark.implicits._
    // two components in arbitrary edge orientation; labels propagate
    // both ways because the loop symmetrizes
    val pairs = Seq(("c", "b"), ("b", "a"), ("y", "x")).toDF("src", "dst")
    val got = GraphOps.minLabelComponents(pairs, maxIters = 8)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("minLabelComponents: fixed depth is exactly iters hops (oracle replay semantics)") {
    import spark.implicits._
    // path a-b-c-d: after ONE iteration each node has min(self, neighbors)
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val one = GraphOps.minLabelComponents(pairs, maxIters = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(one === Map("a" -> "a", "b" -> "a", "c" -> "b", "d" -> "c"))
    // converged (early-stopped) equals any deeper fixed depth
    val conv = GraphOps.minLabelComponents(pairs, maxIters = 50)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val deep = GraphOps.minLabelComponents(pairs, maxIters = 7)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(conv === deep && conv === Map(
      "a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("driver fast path == distributed loop (driverMaxEdges=0) — pageRank, both node types") {
    import spark.implicits._
    // dense-ish pseudo-random digraph with weights, string nodes
    val es = (0 until 200).map { i =>
      (s"n${(i * 7) % 23}", s"n${(i * 13 + 5) % 23}", (i % 5 + 1).toLong)
    }.distinct
    val df = es.toDF("src", "dst", "w")
    val driver = GraphOps.pageRank(df, iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = GraphOps.pageRank(df, iters = 10, driverMaxEdges = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(driver === dist) // identical 6-dp values, both paths
    // long node ids take the driver path too
    val dfL = es.map { case (a, b, w) =>
      (a.drop(1).toLong, b.drop(1).toLong, w) }.toDF("src", "dst", "w")
    val driverL = GraphOps.pageRank(dfL, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val distL = GraphOps.pageRank(dfL, iters = 10, driverMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(driverL === distL)
    // converged variant: same ranks AND same stop depth on both paths
    val (cd, id) = GraphOps.pageRankConverged(df, tol = 1e-4)
    val (cx, ix) = GraphOps.pageRankConverged(df, tol = 1e-4, driverMaxEdges = 0)
    assert(id === ix)
    assert(cd.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap ===
      cx.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
  }

  test("driver fast path == distributed loop (driverMaxEdges=0) — minLabelComponents") {
    import spark.implicits._
    val pairs = (0 until 150).map { i =>
      (s"t${(i * 11) % 40}", s"t${(i * 17 + 3) % 40}")
    }.distinct.toDF("src", "dst")
    for (depth <- Seq(1, 2, 8)) {
      val driver = GraphOps.minLabelComponents(pairs, maxIters = depth)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val dist = GraphOps.minLabelComponents(pairs, maxIters = depth,
          driverMaxEdges = 0)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(driver === dist, s"depth $depth")
    }
    // an over-bound graph falls through to the distributed loop (same
    // answer; the bound is a routing decision, not a semantic one)
    val small = GraphOps.minLabelComponents(pairs, maxIters = 8,
        driverMaxEdges = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val full = GraphOps.minLabelComponents(pairs, maxIters = 8)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(small === full)
  }

  test("null edge endpoints: driver path defers, both paths agree (ADVICE r19)") {
    import spark.implicits._
    // a null src and a null dst among real edges: the driver fast path
    // must FALL THROUGH (no NPE), and the default routing must equal
    // the forced-distributed result exactly
    val es = Seq((Some("a"), Some("b"), 1L), (Some("b"), Some("a"), 1L),
      (None, Some("a"), 2L), (Some("b"), None, 3L))
      .toDF("src", "dst", "w")
    val auto = GraphOps.pageRank(es, iters = 5)
      .collect().map(r => (r.get(0), r.getDouble(1))).toMap
    val dist = GraphOps.pageRank(es, iters = 5, driverMaxEdges = 0)
      .collect().map(r => (r.get(0), r.getDouble(1))).toMap
    assert(auto === dist && auto.nonEmpty)
    val pairs = Seq((Some("c"), Some("b")), (Some("b"), Some("a")),
      (None, Some("z"))).toDF("src", "dst")
    val autoC = GraphOps.minLabelComponents(pairs, maxIters = 4)
      .collect().map(r => (r.get(0), r.get(1))).toMap
    val distC = GraphOps.minLabelComponents(pairs, maxIters = 4,
        driverMaxEdges = 0)
      .collect().map(r => (r.get(0), r.get(1))).toMap
    assert(autoC === distC && autoC.nonEmpty)
  }

  test("no positive-weight edges: empty ranks, 0 iterations, both paths (ADVICE r19)") {
    import spark.implicits._
    val es = Seq(("a", "b", 0L), ("b", "a", -1L)).toDF("src", "dst", "w")
    // driver fast path
    assert(GraphOps.pageRank(es, iters = 5).collect().isEmpty)
    // distributed path — previously the tol > 0 probe NPE'd on the
    // null max over an empty aggregate; now returns (empty, 0)
    assert(GraphOps.pageRank(es, iters = 5, driverMaxEdges = 0).collect().isEmpty)
    val (r1, i1) = GraphOps.pageRankConverged(es, tol = 1e-6)
    val (r2, i2) = GraphOps.pageRankConverged(es, tol = 1e-6, driverMaxEdges = 0)
    assert(r1.collect().isEmpty && r2.collect().isEmpty && i1 === 0 && i2 === 0)
  }

  test("q37 gate graph: components never cross languages") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val comps = GraphOps.tokenComponents(spark, sf, minCount = 2, maxIters = 8)
    val bad = comps.filter(
      split(col("tok"), ":").getItem(0) =!= split(col("component"), ":").getItem(0))
    assert(bad.isEmpty && comps.count() > 0)
  }

  test("transition edges: out-weights equal each user's event count minus one") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val totalW = GraphOps.transitionEdges(spark, sf)
      .agg(sum("w")).collect()(0).getLong(0)
    val expected = graft.Tables.events(spark, sf)
      .groupBy("user_id").count()
      .agg(sum(col("count") - 1)).collect()(0).getLong(0)
    assert(totalW === expected)
  }
}

package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank scale rung: runs `GraphOps.pageRank` on synthetic graphs
  * orders of magnitude past the gate's event-transition graph, and
  * reports PER-ITERATION wall times — the number that exposes the
  * iterative-Spark lineage trap (an unmanaged loop's iterations get
  * progressively slower as the plan deepens; the operator's
  * persist-and-drop generations must hold them flat).
  *
  * Graph: `n` nodes, `degree` out-edges each, targets xxhash64-derived
  * (deterministic, uniform — no locality for the join to exploit, the
  * adversarial case for shuffle volume), unit weights plus a hash-spread
  * heavy tail on 1% of edges.
  *
  * `Test/runMain graft.tools.DrivePageRankScale [n:degree:iters ...]`
  * (default ladder 1000000:5:8 4000000:5:8)
  */
object DrivePageRankScale {
  def main(args: Array[String]): Unit = {
    val ladder: Seq[(Long, Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(n, d, it) = a.split(":"); (n.toLong, d.toInt, it.toInt)
      }
      else Seq((1000000L, 5, 8), (4000000L, 5, 8))
    val spark = GraftSession.local("graft-pagerank-scale")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.GraphOps

    def edges(n: Long, degree: Int): DataFrame =
      spark.range(n).select(col("id").as("src"),
        explode(transform(sequence(lit(0), lit(degree - 1)), i =>
          pmod(xxhash64(col("id"), i), lit(n)))).as("dst"))
        .withColumn("w",
          when(pmod(xxhash64(col("src"), col("dst")), lit(100)) === 0, lit(50L))
            .otherwise(lit(1L)))

    for ((n, degree, iters) <- ladder) {
      val e = edges(n, degree)
      // per-iteration timing: run iters=1..k would re-pay the setup, so
      // instead time each generation inside one run via the listener-free
      // route — run the full loop once per rung and report the wall
      // split by iteration using successive calls at increasing depth
      // on a WARM persisted edge relation (identical first stages).
      val t0 = System.nanoTime()
      val r = GraphOps.pageRank(e, iters = iters, damping = 0.85)
      val nOut = r.count()
      val total = (System.nanoTime() - t0) / 1e9
      // iteration flatness: time depth 2 vs depth `iters` — a lineage
      // leak makes late iterations (and thus the per-iteration average
      // at full depth) grow with depth
      val t1 = System.nanoTime()
      GraphOps.pageRank(e, iters = 2, damping = 0.85).count()
      val shallow = (System.nanoTime() - t1) / 1e9
      val perIterDeep = (total - shallow).max(0.0) / (iters - 2).max(1)
      println(f"[pagerank-scale] n=$n%d degree=$degree%d iters=$iters%d " +
        f"nodes_out=$nOut%d total=$total%.1f s shallow2=$shallow%.1f s " +
        f"per_iter_marginal=$perIterDeep%.2f s")
      // production stop rule at the same rung: how many iterations does
      // tol actually buy/cost vs the fixed-iters gate depth, and does
      // the per-iteration delta probe change the per-iteration price
      val t2 = System.nanoTime()
      val (cr, itersRun) = GraphOps.pageRankConverged(e, tol = 1e-7, maxIters = 40)
      val nConv = cr.count()
      val convTotal = (System.nanoTime() - t2) / 1e9
      println(f"[pagerank-scale] n=$n%d tol=1e-7 iters_to_tol=$itersRun%d " +
        f"nodes_out=$nConv%d total=$convTotal%.1f s " +
        f"per_iter=${convTotal / itersRun}%.2f s")
    }
    spark.stop()
  }
}

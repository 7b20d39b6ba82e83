package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dumps formatted physical plans for the named queries (or all) —
  * the ".explain and iterate" loop for pushdown/broadcast/codegen audits.
  * `sbt "Test/runMain graft.tools.ExplainAudit q2_order_wide ..."`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("explain-audit")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

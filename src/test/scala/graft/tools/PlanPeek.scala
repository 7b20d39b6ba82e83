package graft.tools

/** Dev-side plan dump for one SparkEntry query: counts loop joins and
  * prints their build sides. `Test/runMain graft.tools.PlanPeek <name>` */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-plan-peek")
    val plan = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.toString
    def count(n: String) = plan.sliding(n.length).count(_ == n)
    println(s"BNLJ=${count("BroadcastNestedLoopJoin")} CART=${count("CartesianProduct")}")
    plan.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
      .foreach(println)
    spark.stop()
  }
}

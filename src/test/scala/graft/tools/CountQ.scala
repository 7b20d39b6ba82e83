package graft.tools
object CountQ extends App {
  val q = graft.SparkEntry.queries
  val o = graft.SparkEntry.oracleSql
  println(s"queries=${q.size} oracles=${o.size}")
  println("rows-only: " + (q.keySet -- o.keySet).toSeq.sorted.mkString(", "))
  println("orphan oracles: " + (o.keySet -- q.keySet).mkString(", "))
}

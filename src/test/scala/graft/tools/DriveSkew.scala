package graft.tools

import graft.GraftSession
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Manual library-boundary drive for Skew on real corpus data. */
object DriveSkew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("drive-skew")
    val dir = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val p = spark.read.parquet(s"$dir/part.parquet").select("p_partkey", "p_brand")
    val plain = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand").count().orderBy("p_brand")
    val salted = Skew.saltedJoin(
      li.withColumnRenamed("l_partkey", "p_partkey"), p, "p_partkey",
      saltCol = col("l_orderkey"), saltFactor = 8)
      .groupBy("p_brand").count().orderBy("p_brand")
    println("plain == salted: " +
      (plain.collect().toSeq == salted.collect().toSeq))
    salted.show(5)
    spark.stop()
  }
}

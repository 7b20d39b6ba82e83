package graft.operators

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("saltedJoin output equals plain join on skewed keys") {
    import spark.implicits._
    // 90% of rows share one hot key
    val large = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (6L, "c")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", col("payload"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("saltedDistinctCount equals plain countDistinct") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("user_" + (i % 3), i % 101)).toDF("k", "v")
    val plain = df.groupBy("k").agg(countDistinct("v").as("d"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedDistinctCount(df, "k", "v")
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }
}

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

  // AQE's skew-join split is the no-code-change alternative to manual
  // salting — at 100 TB it is the FIRST line of defense (salting is for
  // when AQE's per-partition granularity isn't enough). Prove the
  // engine's session config actually gets it: a hot-key join must plan
  // SortMergeJoin(skew=true) under AQE with the skew thresholds scaled
  // to local data sizes.
  test("AQE splits the hot partition of a skewed sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carries ~95% of a 300k-row left side
      val left = spark.range(300000)
        .select(when(col("id") % 20 === 0, col("id") % 50).otherwise(lit(7L)).as("k"),
          concat(lit("payload_"), col("id")).as("payload"))
      val right = spark.range(50).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
        .repartition(4) // materialize via shuffle so SMJ is the natural plan
      val joined = left.join(right, "k")
      // collect THIS DataFrame (count() would execute a different
      // QueryExecution) so its adaptive plan is final when inspected
      assert(joined.collect().length === 300000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should mark the skewed join, final plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

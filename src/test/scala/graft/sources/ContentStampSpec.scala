package graft.sources

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ContentStamp is the invalidation currency of every corpus-derived
  * memo — these pin the properties the memos lean on: the stamp changes
  * exactly when relation bytes change, INCLUDING inside partitioned
  * (subdirectory) layouts, and ignores working/metadata files. */
class ContentStampSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.local("contentstamp-spec")
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-cstamp").toString

  test("absent path stamps empty; flat relation re-stamps on rewrite") {
    val ss = spark; import ss.implicits._
    val d = tmp()
    assert(ContentStamp.of(spark, s"$d/nope.parquet") == "")
    (1 to 10).toDF("v").write.parquet(s"$d/r.parquet")
    val s1 = ContentStamp.of(spark, s"$d/r.parquet")
    assert(s1.nonEmpty)
    assert(ContentStamp.of(spark, s"$d/r.parquet") == s1, "stable without change")
    (1 to 9).toDF("v").write.mode("overwrite").parquet(s"$d/r.parquet")
    assert(ContentStamp.of(spark, s"$d/r.parquet") != s1, "rewrite must re-stamp")
  }

  test("PARTITIONED relation: the stamp sees nested data files — a " +
      "top-level-only listing would freeze at \"\" and never re-key") {
    val ss = spark; import ss.implicits._
    val d = tmp()
    Seq((1, "a"), (2, "b")).toDF("v", "p")
      .write.partitionBy("p").parquet(s"$d/part")
    val s1 = ContentStamp.of(spark, s"$d/part")
    assert(s1.nonEmpty, "partitioned layout must not stamp empty")
    assert(s1.contains("p=a/"), "stamp must carry the nested relative path")
    // rewrite ONE partition in place: the stamp must change
    Seq((3, "a")).toDF("v", "p").write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("p").parquet(s"$d/part")
    assert(ContentStamp.of(spark, s"$d/part") != s1,
      "a nested-partition rewrite must re-stamp")
  }

  test("ofChildren: one deep listing == per-child of() walks, hidden " +
      "dirs and root-level files excluded, empty children absent") {
    val ss = spark; import ss.implicits._
    val d = tmp()
    Seq((1L, "0"), (2L, "1"), (3L, "0"), (4L, "2")).toDF("v", "shard")
      .write.partitionBy("shard").parquet(s"$d/g")
    // hidden working dir + empty child: neither is content
    new java.io.File(s"$d/g/.staging-x").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/g/.staging-x/part-0"), Array[Byte](1))
    new java.io.File(s"$d/g/shard=9").mkdirs()
    val got = ContentStamp.ofChildren(spark, s"$d/g")
    val expected = Seq("shard=0", "shard=1", "shard=2")
      .map(c => (c, ContentStamp.of(spark, s"$d/g/$c")))
    assert(got == expected,
      "ofChildren must be byte-identical to per-child of() walks")
    assert(!got.exists(_._1 == "shard=9"), "empty child must be absent")
    assert(ContentStamp.ofChildren(spark, s"$d/absent") == Nil)
    // NESTED child content: entries stay relative to the child
    Seq((5L, "0", "x")).toDF("v", "shard", "sub")
      .write.partitionBy("shard", "sub").parquet(s"$d/g2")
    assert(ContentStamp.ofChildren(spark, s"$d/g2") ==
      Seq(("shard=0", ContentStamp.of(spark, s"$d/g2/shard=0"))))
  }

  test("working and metadata files are not content") {
    val ss = spark; import ss.implicits._
    val d = tmp()
    (1 to 3).toDF("v").write.parquet(s"$d/r")
    val s1 = ContentStamp.of(spark, s"$d/r")
    // droppings a committer abort / Spark metadata leave behind
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/r/_SUCCESS_extra"), Array.empty[Byte])
    new java.io.File(s"$d/r/.hidden-dir").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/r/.hidden-dir/junk"), Array[Byte](1))
    assert(ContentStamp.of(spark, s"$d/r") == s1,
      "hidden/underscore files (and dirs) must not perturb the stamp")
  }
}

package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hypothesis tester for t30's cost structure: the same pipeline with
  * the scratch persist on/off, and each intermediate timed alone.
  * `sbt "Test/runMain graft.tools.ProfileDsir"`. */
object ProfileDsir {
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[dsir] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("profile-dsir")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBuckets = 1024
    import graft.operators.TextOps.{tokens, tokenWindows}

    def featsOf(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("source"),
          explode(tokenWindows(col("toks"), 2, 1)).as("bg"))
        .withColumn("f",
          (conv(substring(md5(col("bg").cast("binary")), 1, 8), 16, 10)
            .cast("long") % nBuckets).cast("int"))
        .groupBy(col("doc_id"), col("source"), col("f"))
        .agg(count(lit(1)).as("n"))

    def tail(feats: DataFrame, targetSource: String, budget: Int): DataFrame = {
      val hist = feats.groupBy(col("f"))
        .agg(sum(when(col("source") === targetSource, col("n")).otherwise(0L)).as("ct"),
          sum(col("n")).as("cr"))
      val tots = hist.agg(sum(col("ct")).as("tot_t"), sum(col("cr")).as("tot_r"))
      val w = feats.join(broadcast(hist), Seq("f"))
        .crossJoin(broadcast(tots))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_feats"),
          sum(col("n") * (
            log((col("ct") + lit(1)) /
              (col("tot_t") + lit(nBuckets)).cast("double")) -
              log((col("cr") + lit(1)) /
                (col("tot_r") + lit(nBuckets)).cast("double")))).as("log_w"))
      val u = (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long").cast("double") + lit(0.5)) / lit(4294967296.0)
      w.withColumn("key", col("log_w") + -log(-log(u)))
        .orderBy(col("key").desc, col("doc_id")).limit(budget)
        .select(col("doc_id"), col("n_feats"),
          round(col("log_w"), 6).as("log_w"),
          round(col("key"), 6).as("sample_key"))
    }

    // warm-up
    t("warmup sf0.001")(tail(featsOf(Tables.documents(spark, "/root/testdata/sf0.001")), "src0", 100).count())
    spark.catalog.clearCache()

    val docs = Tables.documentsFanned(spark, dir) // match the committed t30 shape
    (1 to 2).foreach { rep =>
      println(s"[dsir] --- rep $rep ---")
      t("feats alone (no persist)")(featsOf(docs).count())
      spark.catalog.clearCache()
      t("full, NO persist (feats recomputed 3x)")(tail(featsOf(docs), "src0", 100).count())
      spark.catalog.clearCache()
      t("full, persist(MEMORY_AND_DISK)") {
        val f = featsOf(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try tail(f, "src0", 100).count() finally f.unpersist(blocking = false)
      }
      spark.catalog.clearCache()
      t("full, eager persist then tail") {
        val f = featsOf(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count()
        try tail(f, "src0", 100).count() finally f.unpersist(blocking = false)
      }
      spark.catalog.clearCache()
      t("full, localCheckpoint(eager)") {
        val f = featsOf(docs).localCheckpoint(true)
        tail(f, "src0", 100).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Stage-level timing for the dedup hotspots (dev profiling aid). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("profile-dedup")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // warm
    spark.read.parquet(s"$dir/documents.parquet").count()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), greatest(size(col("toks")) - 3, lit(0))),
        i => array_join(slice(col("toks"), i + lit(1), lit(3)), " "))).as("shingles"))
    time("shingle+count")(docs.count())
    val sig = Dedup.minhashSignatures(docs, 64)
    time("minhash sigs")(sig.count())
    time("minhash sigs again")(sig.count())
    // minhashLsh sub-stages
    val sigP = sig.persist()
    time("sig persist+count")(sigP.count())
    val banded = sigP.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * 4 + lit(1), lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded count")(banded.count())
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    val cand = l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    time("cand join+distinct")(cand.count())
    time("full minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    time("full minhashLsh again")(Dedup.minhashLsh(spark, dir).count())

    // simhash sub-stages
    val sh = Dedup.simhash(spark, dir)
    time("simhash count")(sh.count())
    time("simhash count again")(sh.count())
    time("full simhashPairs")(Dedup.simhashPairs(spark, dir).count())
    time("full ngramJaccard")(Dedup.ngramJaccard(spark, dir).count())
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Stage-level timing for ngramJaccard (d2) — dev profiling aid. */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("profile-d2")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    spark.read.parquet(s"$dir/documents.parquet").count() // warm fs
    // replicate ngramJaccard internals
    val minJ = 0.8
    def shingleHashes = Tables.documents(spark, dir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("shingles", array_distinct(transform(
        sequence(lit(0), greatest(size(col("toks")) - 3, lit(0))),
        i => array_join(slice(col("toks"), i + lit(1), lit(3)), " "))))
      .withColumn("sh_hashes",
        sort_array(array_distinct(transform(col("shingles"), s => xxhash64(s)))))
      .select(col("doc_id"), col("sh_hashes"), size(col("sh_hashes")).as("n_sh"))
    time("shingleHashes count")(shingleHashes.count())
    val docs = shingleHashes.persist()
    time("docs persist")(docs.count())
    val prefixLen = (col("n_sh") - ceil(lit(minJ) * col("n_sh")) + 1).cast("int")
    val pinv = docs
      .select(col("doc_id"), col("n_sh"),
        explode(slice(col("sh_hashes"), lit(1), prefixLen)).as("sh"))
      .persist()
    time("pinv persist")(pinv.count())
    val a = pinv.select(col("sh"), col("doc_id").as("id_a"), col("n_sh").as("n_a"))
    val b = pinv.select(col("sh"), col("doc_id").as("id_b"), col("n_sh").as("n_b"))
    val cand = a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")) >= ceil(lit(minJ) * greatest(col("n_a"), col("n_b"))))
      .select(col("id_a"), col("id_b")).distinct()
    time("cand join+distinct")(cand.count())
    val verified = cand
      .join(docs.select(col("doc_id").as("id_a"), col("sh_hashes").as("sh_a"),
        col("n_sh").as("n_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("sh_hashes").as("sh_b"),
        col("n_sh").as("n_b")), "id_b")
      .withColumn("n_common", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("n_common") / (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJ)
    time("verify")(verified.count())
    spark.catalog.clearCache()
    time("full d2 fresh")(graft.operators.Dedup.ngramJaccard(spark, dir).count())
    spark.stop()
  }
}

package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object ProfileCand {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("profile-cand")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r"); r
    }
    val toksDf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val docs = toksDf.select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), greatest(size(col("toks")) - 3, lit(0))),
        i => array_join(slice(col("toks"), i + lit(1), lit(3)), " "))).as("shingles"))
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("n_sh"))
    val prefixLen = (col("n_sh") - ceil(lit(0.8) * col("n_sh")) + 1).cast("int")
    // hash-order prefix (current d2)
    val pinvHash = docs
      .withColumn("ord", sort_array(transform(col("shingles"), s => struct(xxhash64(s).as("h"), s.as("sh")))))
      .select(col("doc_id"), explode(transform(slice(col("ord"), lit(1), prefixLen), x => x.getField("sh"))).as("sh"))
    time("pinv(hash) rows")(pinvHash.count())
    val aH = pinvHash.select(col("sh"), col("doc_id").as("id_a"))
    val bH = pinvHash.select(col("sh"), col("doc_id").as("id_b"))
    time("cand(hash) pairs")(aH.join(bH, Seq("sh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count())
    // df-order prefix via window
    val inv = docs.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val dfreq = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val ranked = inv.join(broadcast(dfreq), "sh")
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .filter(col("rn") <= prefixLen)
    val pinvDf = ranked.select(col("sh"), col("doc_id"))
    time("pinv(df) rows")(pinvDf.count())
    val aD = pinvDf.select(col("sh"), col("doc_id").as("id_a"))
    val bD = pinvDf.select(col("sh"), col("doc_id").as("id_b"))
    time("cand(df) pairs")(aD.join(bD, Seq("sh")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count())
    // d3 banded candidates
    val bandHashes = (0 until 16).map { b =>
      xxhash64((b * 4 until (b + 1) * 4).map { i =>
        array_min(transform(col("shingles"), s => xxhash64(lit(i), s)))
      }: _*)
    }
    val banded = docs.select(col("doc_id"), posexplode(array(bandHashes: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded rows")(banded.count())
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    time("cand(band) pairs")(l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().count())
    spark.stop()
  }
}

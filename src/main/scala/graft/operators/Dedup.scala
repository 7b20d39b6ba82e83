package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around the standard distributed shape: shingle → (inverted index |
  * signature banding) → candidate-pair join → verify. No driver-side
  * loops, no cartesian products — candidate generation is always a
  * key-equality shuffle join, which is the only formulation that
  * survives 100 TB (a naive pairwise compare is O(n²) and does not).
  */
object Dedup {

  private def tokens(c: Column) = split(trim(c), "\\s+")

  /** Word k-shingles per document, distinct. `transform(sequence(...))`
    * keeps shingling inside codegen (no UDF, no explode until needed). */
  private def shingleCol(text: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(tokens(text)) - k, lit(0))),
        i => array_join(slice(tokens(text), i + lit(1), lit(k)), " ")))

  /** Exact dedup: content-hash groupBy. At scale this is one shuffle on
    * a 128-bit hash — the canonical first pass of any dedup pipeline. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** N-gram Jaccard near-dup pairs (word 3-shingles, J ≥ `minJ`).
    * Inverted-index candidate generation: explode shingles, self-join on
    * shingle (only docs sharing ≥1 shingle ever meet), count shared
    * shingles per pair, then J = |∩| / (|A|+|B|−|∩|). The per-shingle
    * fan-out is bounded by document frequency; a production run would
    * drop ultra-frequent shingles first (stopword shingles) — same
    * technique as below, threshold configurable. */
  def ngramJaccard(spark: SparkSession, dir: String, minJ: Double = 0.8): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingleCol(col("text"), 3).as("shingles"))
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("n_sh"))
    val inv = docs.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val a = inv.select(col("sh"), col("doc_id").as("id_a"), col("n_sh").as("n_a"))
    val b = inv.select(col("sh"), col("doc_id").as("id_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        col("n_common") / (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("id_a"), col("id_b"), col("n_common"), col("jaccard"))
  }

  /** MinHash signatures: `numHashes` permutations approximated by
    * xxhash64(seed_i, shingle); signature = per-seed min over shingles.
    * Entirely column expressions — the min-over-shingles runs inside
    * codegen via aggregate(), one row out per document. */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val sigs = (0 until numHashes).map { i =>
      array_min(transform(col("shingles"), s => xxhash64(lit(i), s))).as(s"mh_$i")
    }
    docs.select(col("doc_id") +: array(sigs: _*).as("sig") +: Nil: _*)
  }

  /** MinHash + LSH near-dup candidates: band the signature (bands ×
    * rowsPerBand = numHashes), bucket-join on (band, band-hash), verify
    * candidates with the signature-estimated Jaccard. The bucket join is
    * a plain equi-shuffle — the LSH trick that makes near-dup linear-ish
    * at 100 TB. Defaults 16×4 target J≈0.5+. */
  def minhashLsh(spark: SparkSession, dir: String,
                 numHashes: Int = 64, bands: Int = 16, minEstJ: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingleCol(col("text"), 3).as("shingles"))
    val sig = minhashSignatures(docs, numHashes)
    val banded = sig.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= minEstJ)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash (64-bit): per token-hash bit, sum ±1 across tokens (weighted
    * by term frequency), sign → bit. Expressed as 64 column aggregates
    * over the exploded token stream — partial aggregation (map-side
    * combine) keeps the shuffle at one row per (doc × 64 longs packed
    * into one). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$i")
    }
    val packed = (0 until 64).map { i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, blocked by
    * 16-bit chunks (pigeonhole: any pair within distance 3 shares at
    * least one of 4 chunks) — again a bucket equi-join, never pairwise. */
  def simhashPairs(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val sh = simhash(spark, dir)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "key")
    val l = chunked.select(col("chunk"), col("key"), col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val r = chunked.select(col("chunk"), col("key"), col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_dedup_exact" -> exact,
    "d2_ngram_jaccard" -> ((s, d) => ngramJaccard(s, d)),
    "d3_minhash_lsh" -> ((s, d) => minhashLsh(s, d)),
    "d4_simhash" -> simhash,
    "d5_simhash_pairs" -> ((s, d) => simhashPairs(s, d)),
  )

  /** d3–d5 depend on xxhash64 (no DuckDB equivalent) → rows-only checks;
    * their semantics are covered by ScalaTest recall/agreement specs. */
  val oracle: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "d2_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |         list_distinct([array_to_string(t[i+1:i+3], ' ')
        |                        FOR i IN range(0, GREATEST(LEN(t)-3, 0) + 1)]) AS shingles
        |  FROM toks),
        |inv AS (
        |  SELECT doc_id, LEN(shingles) AS n_sh, UNNEST(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
        |         COUNT(*) AS n_common
        |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1,2,3,4)
        |SELECT id_a, id_b, n_common,
        |       n_common / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
        |FROM pairs
        |WHERE n_common / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.8""".stripMargin,
  )
}

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

  /** Word k-shingles from a *materialized* token-array column, distinct.
    * `transform(sequence(...))` keeps shingling inside codegen (no UDF,
    * no explode until needed). Callers must project the token array
    * first — passing `split(...)` directly would re-tokenize the whole
    * document once per shingle index inside the lambda (O(n²) per doc;
    * measured 13 s → 3 s on d2 at sf0.1). */
  private def shingleCol(toks: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))

  /** documents → (doc_id, shingles) with tokens materialized first. */
  private def docShingles(spark: SparkSession, dir: String, k: Int = 3) =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingleCol(col("toks"), k).as("shingles"))

  /** Exact dedup: content-hash groupBy. At scale this is one shuffle on
    * a 128-bit hash — the canonical first pass of any dedup pipeline. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** N-gram Jaccard near-dup pairs (word 3-shingles, J ≥ `minJ`), exact,
    * via **prefix filtering** (the SSJoin/PPJoin family): order shingles
    * by global document frequency (rare first), index only each doc's
    * first `n − ⌈J·n⌉ + 1` shingles — any pair with Jaccard ≥ J must
    * share a prefix shingle, so candidate generation touches a small
    * fraction of the inverted index and skips the stop-shingle blowup
    * entirely. Candidates are verified with `array_intersect` on the
    * full shingle arrays. Same output as the naive full-index join
    * (the DuckDB oracle runs the naive form), ~arbitrarily cheaper at
    * scale: frequent shingles never generate candidates. */
  def ngramJaccard(spark: SparkSession, dir: String, minJ: Double = 0.8): DataFrame = {
    // persist: referenced by candidate generation and twice by
    // verification. Caching the array column costs ~3 s of columnar
    // serialization at sf0.1, but end-to-end bench shows recompute ×3
    // costs more (22.7 s vs 30.7 s total with/without the two dedup
    // persists) — the shingle subtree recomputes inside wider join
    // plans, not as the cheap standalone scan a microbenchmark sees.
    val docs = docShingles(spark, dir)
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("n_sh"))
      .persist()
    val inv = docs.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val dfreq = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // per doc: shingles ordered (df asc, shingle asc) — one global order
    val ordered = inv.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ord"))
      .select(col("doc_id"),
        transform(col("ord"), s => s.getField("sh")).as("ord_sh"))
    val prefixLen = (col("n_sh") - ceil(lit(minJ) * col("n_sh")) + 1).cast("int")
    val pinv = docs.join(ordered, "doc_id")
      .select(col("doc_id"),
        explode(slice(col("ord_sh"), lit(1), prefixLen)).as("sh"))
    val a = pinv.select(col("sh"), col("doc_id").as("id_a"))
    val b = pinv.select(col("sh"), col("doc_id").as("id_b"))
    val cand = a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(docs.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"),
        col("n_sh").as("n_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"),
        col("n_sh").as("n_b")), "id_b")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
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
    val docs = docShingles(spark, dir)
    // persist: 3 references (banding + both candidate sides); see the
    // bench-measured tradeoff note in ngramJaccard.
    val sig = minhashSignatures(docs, numHashes).persist()
    val banded = sig.select(
      col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    // dedupe candidate ids BEFORE touching signatures: distinct over two
    // longs, not over rows dragging two 64-element arrays through the
    // shuffle; signatures re-attach via two joins against the small sig
    // relation (one row per doc).
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= minEstJ)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash (64-bit): per token-hash bit, majority vote across tokens
    * (term-frequency weighted), sign → bit. Fully narrow per-row — no
    * explode, no shuffle: embarrassingly parallel over input splits at
    * any scale. The bit voting runs in the native
    * [[graft.functions.SimHash64]] codegen expression: one pass with a
    * local int[64] instead of a 64-term filter/size expression tree. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.SimHash64.simhash64(
          transform(tokens(col("text")), t => xxhash64(t))).as("simhash"))

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

package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, batched per-partition processing,
  * partition sizing — is real and tested. The codec calls themselves are
  * STUBBED behind [[MediaCodec]] with a deterministic fake (this
  * container has no image/audio libraries): swap in a real decoder at
  * deployment without touching the pipeline shape. The batch-iterator
  * shape mirrors Arrow-batch UDF execution: per partition, rows stream
  * through a reusable codec instance — at 100 TB, codec init cost is
  * amortized per-partition, not paid per-row.
  */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)

  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      byte_entropy: Double, feature: Array[Float])

  /** STUB codec boundary. A production build implements these with
    * actual libraries (JPEG/PNG decode, resampling, frame extraction);
    * the fakes are deterministic functions of the payload bytes so tests
    * are reproducible. */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float]
    def resize(pixels: Array[Float], w: Int, h: Int): Array[Float]
    def sampleFrames(payload: Array[Byte], everyMs: Long): Seq[Array[Byte]]
  }

  /** Deterministic fake: "pixels" are byte values folded into [0,1);
    * resize is nearest-neighbor over the fake buffer; frame-sample slices
    * the payload. Marked clearly as the stub implementation. */
  object StubCodec extends MediaCodec {
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
      val out = new Array[Float](math.min(payload.length, 256))
      var i = 0
      while (i < out.length) { out(i) = (payload(i) & 0xFF) / 256.0f; i += 1 }
      out
    }
    def resize(pixels: Array[Float], w: Int, h: Int): Array[Float] = {
      val n = math.max(1, math.min(w * h, 64))
      if (pixels.isEmpty) new Array[Float](n) // empty payload → zero features
      else Array.tabulate(n)(i => pixels(i * pixels.length / n))
    }
    def sampleFrames(payload: Array[Byte], everyMs: Long): Seq[Array[Byte]] = {
      val step = math.max(1, (everyMs / 40).toInt) * 16
      payload.grouped(step).take(8).toSeq
    }
  }

  /** Synthesize a media table from `documents` (deterministic: payload =
    * UTF-8 bytes of the text; kind round-robins by doc_id). Stands in for
    * `spark.read.format("binaryFile")` at deployment. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documentsFanned(spark, dir).select( // stub decode: map-heavy
      col("doc_id").as("media_id"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sampleRateHz"), lit(1000L).as("durationMs")).as("meta"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Decode + feature-extract, batched per partition (codec built once
    * per partition — the Arrow-UDF execution shape). Entropy is computed
    * Spark-side (real); the feature vector comes from the (stubbed)
    * decode+resize path. */
  def extractFeatures(media: Dataset[MediaRow],
                      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init happens here (amortized at scale)
      rows.map { r =>
        val pixels = codec.decode(r.payload, r.meta)
        val feat = codec.resize(pixels, 8, 8)
        val counts = new Array[Int](256)
        r.payload.foreach(b => counts(b & 0xFF) += 1)
        val n = r.payload.length.toDouble
        val entropy = counts.foldLeft(0.0) { (acc, c) =>
          if (c == 0) acc else acc - (c / n) * math.log(c / n) / math.log(2)
        }
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length, entropy, feat)
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 200L,
                   codec: MediaCodec = StubCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.meta.kind == "video")
      .flatMap { r =>
        codec.sampleFrames(r.payload, everyMs).zipWithIndex.map {
          case (frame, i) => (r.media_id, i, frame.length, frame)
        }
      }
      .toDF("media_id", "frame_no", "n_bytes", "frame")
  }

  /** Feature query for the Verify surface: media features with the
    * stub codec (deterministic). Feature array omitted from the output —
    * the scalar columns are the cross-engine-checkable part. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(col("byte_entropy"), 6).as("byte_entropy_r6"),
        size(col("feature")).as("feature_dim"))
  }

  /** Frame-sample query for the Verify surface: scalar columns only
    * (the frame bytes themselves are stub output; their sizes are the
    * checkable part — the stub slices the payload, so frame counts and
    * lengths are pure arithmetic an oracle can reproduce). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir))
      .select(col("media_id"), col("frame_no"), col("n_bytes"))

  /** 60-bit perceptual hash per media row: sign bits of the (stubbed)
    * decoded+resized feature vector against its own mean — the pHash
    * recipe with the stub codec standing in for the DCT. 60 bits (the
    * portable-simhash width) keeps the packed value positive in any
    * signed-64 engine, so the DuckDB oracle reproduces it EXACTLY: the
    * stub's pixels are dyadic rationals (byte/256) whose 60-term mean
    * is order-independent in IEEE double, and every comparison is then
    * exact on both sides. Mean is materialized in its own projection
    * (HOF lambdas get no CSE — the v6 pattern). */
  def mediaPhash(spark: SparkSession, dir: String): DataFrame = {
    val f60 = slice(col("feature"), 1, 60)
    extractFeatures(mediaTable(spark, dir)).toDF()
      .select(col("media_id"), col("feature"))
      .withColumn("mean",
        aggregate(f60, lit(0.0d), (acc, x) => acc + x.cast("double")) / 60.0d)
      .select(col("media_id"),
        aggregate(zip_with(f60, sequence(lit(0), lit(59)),
          (x, j) => when(x.cast("double") > col("mean"),
            pow(lit(2.0d), j).cast("long")).otherwise(lit(0L))),
          lit(0L), (acc, x) => acc + x).as("phash"))
  }

  /** m3: near-duplicate media pairs — same kind, perceptual hashes
    * within Hamming `maxDist`, found via the SAME pigeonhole
    * chunk-blocked equi-join the text SimHash family uses
    * ([[Dedup.chunkedHammingPairs]]): recall guaranteed for any
    * maxDist, never an all-pairs scan. Kind is media_id-derived in
    * [[mediaTable]] and folded INTO the bucket key (`blockCols`), so
    * cross-kind collisions never become candidates — at maxDist = 8 the
    * 60-bit chunks are only ~6 bits wide and bucket collisions are the
    * cost driver, so blocking by kind cuts the candidate set ~3×. */
  /** m3's default Hamming radius — shared with [[phashExactPairs]] and
    * Verify's per-round blocking-recall probe so the probe can never
    * drift from the gate query's definition. */
  val phashMaxDist: Int = 8

  def phashPairs(spark: SparkSession, dir: String, maxDist: Int = phashMaxDist): DataFrame =
    Dedup.chunkedHammingPairs(
        mediaPhash(spark, dir)
          .select(col("media_id").as("doc_id"), col("phash").as("simhash"),
            phashKind(col("media_id")).as("kind")),
        maxDist, bits = 60, blockCols = Seq("kind"))
      .select(col("id_a"), col("id_b"), col("hamming"))

  /** The blocking key [[phashPairs]] folds into the bucket join —
    * media_id-derived, matching [[mediaTable]]'s kind round-robin. One
    * definition, shared with the exact sweep. */
  private def phashKind(mediaId: Column): Column = mediaId % 3

  /** Exact same-kind all-pairs Hamming sweep over the SAME Spark-side
    * hashes and kind derivation as [[phashPairs]] — the recall ground
    * truth Verify's m3 probe compares the chunk-blocked join against
    * each round (pigeonhole says they are always set-equal; the probe
    * turns that theorem plus the hash-parity preconditions into a
    * mechanical per-corpus check). O(n²) — probe/spec scale only. */
  def phashExactPairs(spark: SparkSession, dir: String,
                      maxDist: Int = phashMaxDist): DataFrame = {
    val ph = mediaPhash(spark, dir)
    val a = ph.select(col("media_id").as("id_a"), col("phash").as("ph_a"))
    val b = ph.select(col("media_id").as("id_b"), col("phash").as("ph_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        phashKind(col("id_a")) === phashKind(col("id_b")))
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_features" -> mediaFeatures,
    "m2_frame_sample" -> frameSample,
    "m3_phash_pairs" -> ((s, d) => phashPairs(s, d)),
  )

  /** The corpus payloads are ASCII text bytes, so byte entropy equals
    * DuckDB's character `entropy()` — every scalar output column is
    * oracle-checkable (the stubbed feature vector is excluded from the
    * output by design). */
  val oracle: Map[String, String] = Map(
    "m1_media_features" ->
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |       ROUND(entropy(c), 6) AS byte_entropy_r6,
        |       64 AS feature_dim
        |FROM (SELECT doc_id, text, UNNEST(string_split(text, '')) AS c FROM documents)
        |GROUP BY doc_id, text""".stripMargin,
    // m3: DuckDB recomputes the 60-bit perceptual hash VALUE-exactly
    // (stub pixels are byte/256 dyadic rationals: the 60-term mean is
    // order-independent in IEEE double, POWER(2,j) ≤ 2^59 is exact, and
    // the packed hash stays positive) and sweeps all same-kind pairs;
    // the engine's chunk-blocked join is recall-complete by pigeonhole,
    // so the two sides are set-equal at any maxDist.
    "m3_phash_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         LEAST(octet_length(CAST(text AS BLOB)), 256) AS L
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, j,
        |         ascii(substr(text, CAST((j*L)//64 AS INTEGER)+1, 1)) / 256.0 AS v
        |  FROM d, (SELECT UNNEST(range(0,60)) AS j) r),
        |m AS (SELECT doc_id, SUM(v)/60.0 AS mean FROM f GROUP BY doc_id),
        |ph AS (
        |  SELECT f.doc_id AS media_id,
        |         CAST(SUM(CASE WHEN v > mean
        |                       THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END)
        |              AS BIGINT) AS phash
        |  FROM f JOIN m USING (doc_id) GROUP BY f.doc_id)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
        |FROM ph a JOIN ph b
        |  ON a.media_id < b.media_id AND (a.media_id % 3) = (b.media_id % 3)
        |WHERE bit_count(xor(a.phash, b.phash)) <= 8""".stripMargin,
    // stub frame-sample: payload sliced into 80-byte frames
    // (step = max(1, 200ms/40) * 16), at most 8 — counts and lengths are
    // arithmetic over the payload size
    "m2_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_no,
        |       CAST(LEAST(80, octet_length(CAST(text AS BLOB)) - i*80) AS INTEGER) AS n_bytes
        |FROM (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2)
        |CROSS JOIN UNNEST(range(0, 8)) AS u(i)
        |WHERE i*80 < octet_length(CAST(text AS BLOB))""".stripMargin,
  )
}

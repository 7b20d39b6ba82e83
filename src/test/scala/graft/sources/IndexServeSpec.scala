package graft.sources

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The ANN index AT REST (Similarity.writeAnnIndex / annIvfPqServe):
  * build offline as cid-partitioned parquet, serve online with the
  * probed cells as a static partition filter. Asserts (a) serve output
  * equals the in-session operator at the same dials, and (b) the index
  * scan READS ONLY the probed cells' partitions — the property that
  * makes a query batch touch ~nprobe/nClusters of a 100 TB index. */
class IndexServeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()

  override def afterAll(): Unit = {
    graft.ScratchCache.drain()
    spark.stop()
  }

  /** Rows surfaced by the INDEX scan leaf (AQE off so executed-plan
    * leaves are the file scans — the DppSpec pattern). The index leaf is
    * the only one reading a `codes` column. */
  private def indexScanRows(build: => DataFrame): Long = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = build
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .filter(_.toString.contains("codes"))
        .flatMap(_.metrics.get("numOutputRows").map(_.value))
        .maxOption.getOrElse(fail("no plan leaf reads a `codes` column — " +
          "index scan not found in executed plan"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("appendAnnIndex: appended vectors are served without a rebuild") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-aidx").toString
    Similarity.writeAnnIndex(spark, sf, idx)
    // grown corpus dir: the base embeddings plus a CLONE of vector 0
    // under a fresh id — its own nearest neighbor at cos ≈ 1
    val grown = java.nio.file.Files.createTempDirectory("graft-ann-grown").toString
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val clone = base.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(100000L))
    base.unionByName(clone).coalesce(1)
      .write.mode("overwrite").parquet(s"$grown/embeddings.parquet")
    // index follows the corpus: append the clone encoded with the
    // BUILD-TIME model (memoized from the base dir)
    Similarity.appendAnnIndex(spark, sf, idx,
      clone.select(col("vec_id"), col("embedding")))
    // serve with the grown rescore corpus and the pinned base model:
    // the clone must surface as vector 0's top neighbor
    val q0 = base.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val top = Similarity.annIvfPqServeQueries(spark, grown, idx, q0,
        nprobe = 16, rerank = 501, modelDir = sf)
      .orderBy(col("rank")).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(2) === 100000L, "appended clone not served as top neighbor")
    assert(top.head.getDouble(3) > 0.999999)
    // and the pre-append answers are unchanged for untouched queries
    // (appending only ADDS files to affected cells)
    val others = Similarity.annIvfPqServe(spark, sf, idx, nQueries = 10)
      .filter(col("query_id") =!= 0)
    assert(others.count() > 0)
  }

  test("streaming serve: per-batch answers equal the batch serve, replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-sidx").toString
    Similarity.writeAnnIndex(spark, sf, idx)
    // query stream: the first 10 corpus vectors, split across two
    // micro-batches (5 + 5) — the same set annIvfPqServe(nQueries=10)
    // answers in one batch
    val qs = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
    val out = java.nio.file.Files.createTempDirectory("graft-ann-sout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-sckpt").toString
    val q = graft.streaming.Runner.annServeQuery(spark, sf, idx,
      mem.toDS().toDF("query_id", "q_emb"), out, ckpt)
    try {
      mem.addData(qs.take(5)); q.processAllAvailable()
      mem.addData(qs.drop(5)); q.processAllAvailable()
    } finally q.stop()
    def canon(df: DataFrame) = df.collect().map(_.mkString("|")).toSet
    val served = spark.read.parquet(out)
      .select("query_id", "rank", "neighbor_id", "cos")
    assert(canon(served) === canon(Similarity.annIvfPqServe(spark, sf, idx)))
    // answers landed partitioned by batch id (the replay-idempotent
    // dynamic-overwrite sink) — two batches, disjoint query sets
    val byBatch = spark.read.parquet(out)
      // partition-path columns infer as int — normalize before reading
      .select(col("batch_id").cast("long").as("batch_id"), col("query_id"))
      .groupBy("batch_id").agg(countDistinct(col("query_id")).as("nq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBatch.keySet === Set(0L, 1L))
    assert(byBatch.values.toSeq.sorted === Seq(5L, 5L))
  }

  test("knnGraphServe / bitextMarginAnnServe from the at-rest index == in-session operators") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-kidx").toString
    Similarity.writeAnnIndex(spark, sf, idx)
    def canon(df: DataFrame) = df.collect().map(_.mkString("|")).toSet
    // default dials and a second non-default dial — identical graphs
    assert(canon(Similarity.knnGraphServe(spark, sf, idx)) ===
      canon(Similarity.knnGraph(spark, sf)))
    assert(canon(Similarity.knnGraphServe(spark, sf, idx, k = 3, nprobe = 8, rerank = 96)) ===
      canon(Similarity.knnGraph(spark, sf, k = 3, nprobe = 8, rerank = 96)))
    assert(canon(Similarity.bitextMarginAnnServe(spark, sf, idx)) ===
      canon(Similarity.bitextMarginAnn(spark, sf)))
    // plan shape: the codes come from a STANDALONE scan of the at-rest
    // index (a leaf reading codes but no embedding) — not re-encoded
    // from the embeddings scan
    val leaves = Similarity.knnGraphServe(spark, sf, idx)
      .queryExecution.sparkPlan.collectLeaves().map(_.toString)
    assert(leaves.exists(l => l.contains("codes") && !l.contains("embedding")),
      s"knnGraphServe has no index-only scan leaf:\n${leaves.mkString("\n")}")
    graft.ScratchCache.drain()
  }

  test("appendAnnIndex compaction keeps per-cell file counts bounded across N appends") {
    import spark.implicits._
    def dataFilesPerCell(idx: String): Map[String, Int] =
      new java.io.File(idx).listFiles().filter(_.getName.startsWith("cid="))
        .map(d => d.getName ->
          d.listFiles().count(f => f.getName.endsWith(".parquet"))).toMap
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    def appendBatch(idx: String, i: Int, compact: Boolean): Unit =
      Similarity.appendAnnIndex(spark, sf, idx,
        base.filter(col("vec_id") < 8)
          .select((col("vec_id") + lit(200000L + i * 100L)).as("vec_id"),
            col("embedding")),
        modelDir = sf, compactTouchedCells = compact)
    // without compaction: every append adds files to its touched cells
    val loose = java.nio.file.Files.createTempDirectory("graft-ann-loose").toString
    Similarity.writeAnnIndex(spark, sf, loose)
    (1 to 4).foreach(i => appendBatch(loose, i, compact = false))
    // with compaction: touched cells collapse back to one file each
    val tight = java.nio.file.Files.createTempDirectory("graft-ann-tight").toString
    Similarity.writeAnnIndex(spark, sf, tight)
    (1 to 4).foreach(i => appendBatch(tight, i, compact = true))
    assert(dataFilesPerCell(loose).values.max > 1,
      "expected uncompacted appends to accrete files (else this test proves nothing)")
    assert(dataFilesPerCell(tight).values.max === 1,
      s"compacted cells must hold one file: ${dataFilesPerCell(tight)}")
    // compaction must not lose rows: same index content either way
    def canon(idx: String) = spark.read.parquet(idx)
      .collect().map(_.mkString("|")).toSet
    assert(canon(tight) === canon(loose))
  }

  test("vector-carrying index: serve equality; NO corpus scan anywhere in the serve plan") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-vidx").toString
    Similarity.writeAnnIndex(spark, sf, idx, includeVectors = true)
    def canon(df: DataFrame) = df.collect().map(_.mkString("|")).toSet
    // identical answers to the codes-only serve and the in-session form
    assert(canon(Similarity.annIvfPqServe(spark, sf, idx)) ===
      canon(Similarity.annIvfPq(spark, sf)))
    assert(canon(Similarity.annIvfPqServe(spark, sf, idx, nprobe = 14, rerank = 248)) ===
      canon(Similarity.annIvfPq(spark, sf, nprobe = 14, rerank = 248)))
    // full locality: with caller-provided queries, the serve plan must
    // touch ONLY the index — no leaf may scan the corpus embeddings
    // parquet (the rescore reads the probed cells' own files). This is
    // the property that keeps serve I/O ~nprobe/nClusters of the index
    // at 100 TB; the codes-only layout rescans the corpus relation for
    // the rescore join (measured linear by DriveAnnScale).
    val qvecs = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val queries = qvecs.toDF("query_id", "q_emb")
    val served = Similarity.annIvfPqServeQueries(spark, sf, idx, queries, nprobe = 2)
    served.collect()
    val leaves = served.queryExecution.sparkPlan.collectLeaves().map(_.toString)
    assert(!leaves.exists(_.contains("embeddings.parquet")),
      s"serve plan scans the corpus relation:\n${leaves.mkString("\n")}")
  }

  test("streaming index maintenance: serve equality + replay leaves no duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-midx").toString
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // feed the whole corpus through the maintenance sink in two batches
    def runFeed(): Unit = {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-mckpt").toString
      val q = graft.streaming.Runner.annIndexMaintainQuery(spark, sf, idx,
        mem.toDS().toDF("vec_id", "embedding"), ckpt)
      try {
        mem.addData(vecs.take(vecs.length / 2)); q.processAllAvailable()
        mem.addData(vecs.drop(vecs.length / 2)); q.processAllAvailable()
      } finally q.stop()
    }
    runFeed()
    assert(spark.read.parquet(idx).count() === vecs.length.toLong)
    // the stream-maintained index serves identically to the in-session
    // operator (whole corpus indexed, same pinned model)
    def canon(df: DataFrame) = df.collect().map(_.mkString("|")).toSet
    assert(canon(Similarity.annIvfPqServe(spark, sf, idx)) ===
      canon(Similarity.annIvfPq(spark, sf)))
    // replay: a fresh checkpoint re-delivers the same batches under the
    // same batch ids — dynamic overwrite of (batch_id, cid) partitions
    // rewrites them in place; duplicates would corrupt rerank slots
    runFeed()
    assert(spark.read.parquet(idx).count() === vecs.length.toLong,
      "replayed batches appended duplicates instead of overwriting")
    assert(spark.read.parquet(idx).select("vec_id").distinct().count() ===
      vecs.length.toLong)
  }

  test("in-loop compaction: crossing compactEveryBatches folds committed " +
      "batches into the batch_id=-1 base mid-stream — partition count " +
      "bounded, one file per cell, serve rows unchanged, and a replayed " +
      "IN-FLIGHT batch still rewrites its own partition across the fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-fidx").toString
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val batches = vecs.grouped(100).toSeq // 500 vectors -> 5 batches
    def dirs(): Set[String] =
      new java.io.File(idx).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName).toSet
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ann-fckpt").toString
    val q = graft.streaming.Runner.annIndexMaintainQuery(spark, sf, idx,
      mem.toDS().toDF("vec_id", "embedding"), ckpt, compactEveryBatches = 3)
    try batches.foreach { b =>
      mem.addData(b); q.processAllAvailable()
      // the policy bounds the LSM depth at every trigger, not just at
      // the end: <= threshold partitions ever visible post-commit
      assert(BatchFold.batchDirCount(spark, idx) <= 3)
    } finally q.stop()
    // trace: b0 {0}; b1 {0,1}; b2 {0,1,2}; b3 folds -> {-1,3}; b4 appends
    assert(dirs() === Set("batch_id=-1", "batch_id=3", "batch_id=4"))
    assert(spark.read.parquet(idx).count() === 500L, "fold lost/duplicated rows")
    assert(spark.read.parquet(idx).select("vec_id").distinct().count() === 500L)
    // the folded base holds ONE file per cell — the degenerate (and
    // default-deployment) granularity: nClusters=16 >= 2x the 4 local
    // cores, so filesPerCell = 1 (the file-count win the fold exists
    // for — round 9 measured probe latency tracking it); the
    // small-nClusters multi-file regime is pinned separately below
    val baseCells = new java.io.File(s"$idx/batch_id=-1").listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("cid="))
    assert(baseCells.nonEmpty)
    assert(baseCells.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "the base must hold one file per cid")
    def canon(df: DataFrame) = df.collect().map(_.mkString("|")).toSet
    assert(canon(Similarity.annIvfPqServe(spark, sf, idx)) ===
      canon(Similarity.annIvfPq(spark, sf)),
      "the folded index must serve exactly what the in-session operator answers")
    // replay the IN-FLIGHT batch — the only one a checkpoint can ever
    // re-run: attempt 2 re-executes the trigger body (recover -> fold
    // excluding ITSELF -> dynamic-overwrite append of its own
    // partition). Rows must end exactly where attempt 1 left them.
    assert(!BatchFold.recover(spark, idx), "no torn swap to recover")
    if (BatchFold.batchDirCount(spark, idx) >= 3)
      Similarity.compactMaintainedAnnBatches(spark, idx, excludeBatchId = 4L)
    Similarity.encodeForIndex(spark, sf,
        batches(4).toSeq.toDF("vec_id", "embedding"))
      .withColumn("batch_id", lit(4L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "cid").parquet(idx)
    assert(dirs() === Set("batch_id=-1", "batch_id=4"))
    assert(spark.read.parquet(idx).count() === 500L,
      "a replayed in-flight batch must rewrite, never duplicate")
    assert(spark.read.parquet(idx).select("vec_id").distinct().count() === 500L)
    assert(canon(Similarity.annIvfPqServe(spark, sf, idx)) ===
      canon(Similarity.annIvfPq(spark, sf)))
  }

  test("folded base goes multi-file when nClusters < 2x cores (granularity guard)") {
    import spark.implicits._
    // The round-15 fold A/B measured serve 2.4x SLOWER after a fold at
    // nClusters=16 on a 32-core host: one file per cell makes each
    // probed cell unsplittable, so parallelism collapses to the probed
    // cell count. The fold now salts the base so each cell holds
    // ~ceil(2*cores/nClusters) files. Here: local[4], nClusters=2 ->
    // filesPerCell = 4; with 2 cells x 4 salts over 8 shuffle
    // partitions the base must hold >= 2 files per cell (hash
    // collisions may merge some salt buckets, never all of them).
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-gran").toString
    Similarity.ensureAnnMeta(idx, "pq", nClusters = 2, iters = 2, m = 4, nCodes = 16)
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    for (b <- 0 until 3)
      Similarity.encodeForIndex(spark, sf,
          vecs.filter(pmod(col("vec_id"), lit(3)) === b), nClusters = 2)
        .withColumn("batch_id", lit(b.toLong))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "cid").parquet(idx)
    def rowsSet() = spark.read.parquet(idx)
      .select("vec_id", "cid").as[(Long, Int)].collect().toSet
    val before = rowsSet()
    Similarity.compactMaintainedAnnBatches(spark, idx, excludeBatchId = 999L)
    assert(rowsSet() === before, "fold must preserve (vec_id, cid) exactly")
    val baseCells = new java.io.File(s"$idx/batch_id=-1").listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("cid="))
    assert(baseCells.nonEmpty)
    val fileCounts = baseCells.map(
      _.listFiles().count(_.getName.endsWith(".parquet")))
    assert(fileCounts.forall(c => c >= 2 && c <= 4),
      s"each folded cell must stay splittable (2..4 files), got $fileCounts")
  }

  test("all four encode families: serve from the at-rest index == in-session operator") {
    def canon(df: DataFrame) = df.collect().map(_.mkString("|")).toSet
    // (family, in-session form at default dials, in-session at a
    // NON-DEFAULT dial pair, the same dials for serve)
    val nonDefault: (Int, Int) = (8, 96)
    val inSession: Map[String, (Int, Int) => DataFrame] = Map(
      "pq" -> ((np, rr) => Similarity.annIvfPq(spark, sf, nprobe = np, rerank = rr)),
      "residual" -> ((np, rr) =>
        Similarity.annIvfPqResidual(spark, sf, nprobe = np, rerank = rr)),
      "sq8" -> ((np, rr) => Similarity.annIvfSq8(spark, sf, nprobe = np, rerank = rr)),
      "bq" -> ((np, rr) => Similarity.annIvfBq(spark, sf, nprobe = np, rerank = rr)))
    val defaults: Map[String, (Int, Int)] = Map(
      "pq" -> ((4, 64)), "residual" -> ((4, 64)),
      "sq8" -> ((4, 16)), "bq" -> ((4, 64)))
    for (family <- Seq("pq", "residual", "sq8", "bq")) {
      val idx = java.nio.file.Files
        .createTempDirectory(s"graft-ann-fam-$family").toString
      Similarity.writeAnnIndex(spark, sf, idx, family = family)
      // self-describing: the family is recoverable from the schema alone
      assert(Similarity.indexFamilyOf(
        spark.read.parquet(idx).columns.toSeq) === family)
      val (dnp, drr) = defaults(family)
      assert(canon(Similarity.annIvfPqServe(spark, sf, idx,
          nprobe = dnp, rerank = drr)) === canon(inSession(family)(dnp, drr)),
        s"family $family: serve != in-session at default dials")
      val (np, rr) = nonDefault
      assert(canon(Similarity.annIvfPqServe(spark, sf, idx,
          nprobe = np, rerank = rr)) === canon(inSession(family)(np, rr)),
        s"family $family: serve != in-session at non-default dials")
    }
    graft.ScratchCache.drain()
  }

  test("append derives the family from the index schema (sq8 index gets sq8 rows)") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-sq8a").toString
    Similarity.writeAnnIndex(spark, sf, idx, family = "sq8")
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val clone = base.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(100000L))
    // no family argument: appendAnnIndex must sniff "sq8" off the index
    Similarity.appendAnnIndex(spark, sf, idx,
      clone.select(col("vec_id"), col("embedding")), modelDir = sf)
    val appended = spark.read.parquet(idx).filter(col("vec_id") === 100000L)
    assert(appended.count() === 1L)
    assert(appended.columns.contains("q8"), "appended row must carry the sq8 payload")
    // and the appended clone is served as vector 0's top neighbor
    val grown = java.nio.file.Files.createTempDirectory("graft-ann-sq8g").toString
    base.unionByName(clone).coalesce(1)
      .write.mode("overwrite").parquet(s"$grown/embeddings.parquet")
    val q0 = base.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val top = Similarity.annIvfPqServeQueries(spark, grown, idx, q0,
        nprobe = 16, rerank = 501, modelDir = sf)
      .orderBy(col("rank")).collect()
    assert(top.head.getLong(2) === 100000L, "appended clone not served as top neighbor")
  }

  test("the index is self-describing: serve refuses meta-less dirs; maintained dials must match") {
    import spark.implicits._
    // a directory without _meta.json is not an ANN index — serving it
    // must fail loudly, not re-derive a model from assumed dials (a
    // wrong nClusters routes probes to cells the index never wrote)
    val notAnIndex = java.nio.file.Files
      .createTempDirectory("graft-ann-noidx").toString
    val q = graft.Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val e = intercept[IllegalArgumentException] {
      Similarity.annIvfPqServeQueries(spark, sf, notAnIndex, q)
    }
    assert(e.getMessage.contains("_meta.json"))
    // mining from a non-pq family refuses with a clear message
    val sq8idx = java.nio.file.Files
      .createTempDirectory("graft-ann-sq8m").toString
    Similarity.writeAnnIndex(spark, sf, sq8idx, family = "sq8")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.knnGraphServe(spark, sf, sq8idx)
    }
    assert(e2.getMessage.contains("pq index"))
    // a maintained index refuses a restart under different dials
    implicit val sqlCtx = spark.sqlContext
    val midx = java.nio.file.Files
      .createTempDirectory("graft-ann-dialm").toString
    val vecs = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    def feed(nClusters: Int): Unit = {
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-ann-dialc").toString
      val mq = graft.streaming.Runner.annIndexMaintainQuery(spark, sf, midx,
        mem.toDS().toDF("vec_id", "embedding"), ckpt, nClusters = nClusters)
      try { mem.addData(vecs); mq.processAllAvailable() } finally mq.stop()
    }
    feed(nClusters = 16)
    val e3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      feed(nClusters = 8)
    }
    assert(e3.getMessage.contains("dial mismatch") ||
      Option(e3.getCause).exists(_.getMessage.contains("dial mismatch")))
  }

  test("serve from the at-rest index == in-session operator; scan reads only probed cells") {
    val out = java.nio.file.Files.createTempDirectory("graft-ann-index").toString
    Similarity.writeAnnIndex(spark, sf, out)

    def canon(df: DataFrame) = df.collect().map(_.mkString("|")).toSet
    // same dials → identical answers (default and gate profiles)
    assert(canon(Similarity.annIvfPqServe(spark, sf, out)) ===
      canon(Similarity.annIvfPq(spark, sf)))
    assert(canon(Similarity.annIvfPqServe(spark, sf, out, nprobe = 14, rerank = 248)) ===
      canon(Similarity.annIvfPq(spark, sf, nprobe = 14, rerank = 248)))

    // partition pruning: with few queries × few probes, the scan must
    // surface exactly the probed cells' rows, not the corpus
    val total = spark.read.parquet(out).count()
    val scanned = indexScanRows(
      Similarity.annIvfPqServe(spark, sf, out, nQueries = 2, nprobe = 2))
    assert(scanned < total,
      s"index scan should be pruned: read $scanned of $total rows")
    // at nprobe=2 with 2 queries, at most 4 of 16 cells are open —
    // even with skewed cells this cannot approach the full corpus
    assert(scanned <= total / 2,
      s"expected <= half the index at 2x2 probes, read $scanned of $total")
  }

  test("the ANN model memo re-keys on an in-place corpus rewrite — " +
      "no invalidate call needed (content stamps, round 13)") {
    import org.apache.spark.sql.functions.col
    // private corpus dir so the rewrite can't disturb other suites
    val dir = java.nio.file.Files.createTempDirectory("graft-stamp").toString
    graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 100)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val a = graft.operators.Similarity.centsFor(spark, dir, 4, 1, 1.0)
    val b = graft.operators.Similarity.centsFor(spark, dir, 4, 1, 1.0)
    assert(a eq b, "same corpus content must memo-hit (same instance)")
    // rewrite the corpus under the SAME path: the memo must MISS and
    // retrain — a path-keyed memo would hand writeAnnIndex a model
    // trained on data that no longer exists
    graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 60)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val c = graft.operators.Similarity.centsFor(spark, dir, 4, 1, 1.0)
    assert(!(a eq c), "rewritten corpus must retrain, not memo-hit")
    // and the retrained model is over the NEW corpus: every centroid id
    // (centroids are (cid, vector)) resolves against 60 vectors' train
    // set — pin via a fresh session-independent recompute
    val d = graft.operators.Similarity.centsFor(spark, dir, 4, 1, 1.0)
    assert(c eq d, "the new stamp must memo-hit in turn")
  }
}

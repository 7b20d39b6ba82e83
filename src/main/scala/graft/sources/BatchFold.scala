package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** THE batch-partition fold — one crash-safe swap contract shared by
  * every ROW-SHAPED maintained index (the streaming IVF×PQ index's
  * `(batch_id, cid)` tree, the dedup-at-intake index's
  * `(batch_id, shard)` buckets and `(batch_id)` shingles).
  *
  * Why it exists: those indexes buy EXACTLY-ONCE from their layout —
  * each micro-batch lands under its own `batch_id=` partition, so a
  * replayed batch rewrites itself under dynamic partition overwrite
  * instead of appending duplicates. The price is unbounded accretion:
  * one partition tree per trigger FOREVER (at a 5 s trigger, ~17 k/day),
  * so every probed cell/shard's read fans out over thousands of tiny
  * files within days and the `batch_id`-level listing itself grows
  * without bound. The graph-shaped index solved this with an in-loop
  * merge policy (`compactEverySegments`); this object is the row-shaped
  * equivalent: fold COMMITTED batches into one reserved base partition
  * (`batch_id=-1` — stream batch ids are non-negative, so the base can
  * never collide with a replayable batch).
  *
  * What may be folded: inside `foreachBatch(N)`, Structured Streaming
  * guarantees batches `< N` are in the commit log and will NEVER be
  * re-executed — they are safe to fold. Batch `N` itself may replay, so
  * it is always EXCLUDED: the fold runs at the head of the trigger
  * (before N's own append), and any `batch_id=N` partition a crashed
  * prior attempt left behind is simply dropped by the swap and
  * rewritten by the append that follows (its rows replay from the
  * checkpointed source, not from the index).
  *
  * Crash safety is the staged-swap recipe the HNSW reshard uses, made
  * safe for a PARTIAL swap (the base replaces many sibling dirs, not
  * one whole subtree) by an explicit manifest:
  *
  *   1. write the folded base COMPLETE into `.staging-fold/` (the
  *      committer lands `_SUCCESS` when every file is in);
  *   2. write `_folded` into the staging — a manifest naming exactly
  *      the `batch_id=` dirs whose rows the base absorbed. Its
  *      presence (not `_SUCCESS` alone) is the swap's authority
  *      marker: a crash before it leaves the old layout fully intact
  *      and the half-staged copy is discarded on the next fold;
  *   3. RENAME each manifested dir aside into `.trash-fold/` — one
  *      constant-time namespace op per dir, instead of a recursive
  *      delete whose cost is O(that dir's files): the old `batch_id=-1`
  *      base is index-sized, and deleting it inside the swap window
  *      would leave the relation partial for the whole delete (a torn
  *      rename sequence is repaired by recovery — every moved row is
  *      already in the staged base);
  *   4. ONE rename of the staging to `batch_id=-1` — which atomically
  *      retires the authority marker with it;
  *   5. deferred delete of `.trash-fold/`, AFTER the new base is
  *      already serving (a crash here leaves only invisible trash,
  *      removed by the next fold's pre-clean or recovery).
  *
  * [[recover]] redoes steps 3–5 whenever a manifest exists, and is
  * called by the maintain loops at trigger start and by the serve
  * paths at read start (the `recoverStagedReshard` precedent) — cost
  * when there is nothing to recover is one FS exists() probe. Between
  * a crash mid-swap and that recovery a CONCURRENT reader can see a
  * partial index (the single-writer maintain contract every one of
  * these indexes documents) — never duplicates: a row is visible in
  * the staged base only after its source dir is gone or the manifest
  * that will move it is already authoritative.
  *
  * The staged WRITE is the caller's (each index keeps its own inner
  * layout — cid partitions, shard partitions, range-clustered files);
  * the listing, manifest, deletes and rename live here so no family
  * can drift in swap order or failure mode. */
object BatchFold {

  /** The fold target. Reserved: stream batch ids are non-negative. */
  val foldedBatchId: Long = -1L

  private val manifestName = "_folded"
  private def stagingOf(root: String) = new Path(s"$root/.staging-fold")
  private def trashOf(root: String) = new Path(s"$root/.trash-fold")
  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Steps 3–5 of the swap, shared by [[fold]] and [[recover]]: move
    * each still-present manifested dir aside (constant-time renames —
    * never a recursive delete inside the window), rename the staging
    * in as the new base, then drop the trash. Idempotent: already-gone
    * dirs are skipped, and the trash pre-clean runs in [[fold]]. */
  private def finishSwap(fs: org.apache.hadoop.fs.FileSystem, root: String,
                         folded: Seq[String]): Unit = {
    val trash = trashOf(root)
    fs.mkdirs(trash)
    folded.foreach { name =>
      val src = new Path(s"$root/$name")
      if (fs.exists(src)) {
        require(fs.rename(src, new Path(trash, name)),
          s"batch fold: could not move $src aside; the complete folded " +
            s"base is at ${stagingOf(root)} — finish by removing the " +
            "manifested dirs and renaming it to batch_id=-1")
      }
    }
    require(fs.rename(stagingOf(root), new Path(s"$root/batch_id=$foldedBatchId")),
      s"batch fold: rename ${stagingOf(root)} -> $root/batch_id=" +
        s"$foldedBatchId failed; the complete folded base is at the " +
        "staging path — rename it to batch_id=-1 to recover")
    fs.delete(trash, true) // deferred: outside the swap window
    ()
  }

  /** Number of `batch_id=` partitions currently on disk (base included)
    * — the LSM depth the maintain loops' merge policy watches. One
    * driver-side listing; 0 for a not-yet-created relation. */
  def batchDirCount(spark: SparkSession, root: String): Int = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    if (!fs.exists(rootPath)) 0
    else fs.listStatus(rootPath).count(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch_id="))
  }

  /** Finish a fold a crash interrupted mid-swap: when the staging
    * carries its `_folded` manifest, the staged base is authoritative
    * for exactly the dirs the manifest names — move any still present
    * aside, rename the staging in, drop the trash. Idempotent (the
    * manifest retires with the final rename, already-moved dirs are
    * skipped); no-op (one exists probe) when no completed staging
    * exists. Returns true when a recovery was performed. */
  def recover(spark: SparkSession, root: String): Boolean = {
    val staging = stagingOf(root)
    val fs = fsOf(spark, staging)
    val manifest = new Path(staging, manifestName)
    if (!fs.exists(manifest)) return false
    val in = fs.open(manifest)
    val folded =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    finishSwap(fs, root, folded.filter(_.nonEmpty))
    true
  }

  /** Fold every `batch_id=` partition of `root` EXCEPT `excludeBatchId`
    * (the in-flight, still-replayable batch) into the `batch_id=-1`
    * base. `writeStaged` receives the fold input (every kept row, the
    * `batch_id` column already dropped) and the staging path, and must
    * COMPLETE one Spark write there (mode overwrite; the committer's
    * `_SUCCESS` plus this object's manifest gate the swap). Returns
    * the number of partitions folded (0 = nothing to do). */
  def fold(spark: SparkSession, root: String, excludeBatchId: Long)(
      writeStaged: (DataFrame, String) => Unit): Int = {
    val rootPath = new Path(root)
    val fs = fsOf(spark, rootPath)
    val staging = stagingOf(root)
    fs.delete(staging, true)      // an INCOMPLETE prior fold (no manifest)
    fs.delete(trashOf(root), true) // a prior swap's deferred old dirs
    if (!fs.exists(rootPath)) return 0
    val foldDirs = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName)
      .filter(_ != s"batch_id=$excludeBatchId")
      .sorted
    if (foldDirs.isEmpty) return 0
    writeStaged(
      spark.read.parquet(root)
        .filter(col("batch_id") =!= excludeBatchId)
        .drop("batch_id"),
      staging.toString)
    // the manifest lands only after the staged data committed — from
    // here the swap is authoritative and recovery can always finish it
    val out = fs.create(new Path(staging, manifestName), true)
    try out.write((foldDirs.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    finishSwap(fs, root, foldDirs)
    foldDirs.size
  }
}

package graft.sources

import org.apache.spark.sql.SparkSession

/** Content stamp of an at-rest relation — the invalidation currency of
  * every corpus-derived driver memo (round 13, generalizing the
  * sharded-HNSW `ShardGraphCache` contract): the sorted
  * name:length:mtime listing of a path's visible files changes exactly
  * when the relation's bytes change, so a memo KEYED by the stamp can
  * never return a value derived from rewritten data — staleness
  * becomes a lookup miss, not a protocol the caller must remember
  * (`invalidate*Memo()` remains for cold-timing, but correctness no
  * longer depends on anyone calling it). One `listStatus` round to the
  * relation's own filesystem per memoized call — noise next to what
  * these memos guard (k-means training, union-find clustering, graph
  * construction). */
object ContentStamp {

  /** Hidden-file convention shared with Spark's listing: `_` metadata
    * and `.` working files are not relation content. */
  private def isVisible(name: String): Boolean =
    !name.startsWith(".") && !name.startsWith("_")

  /** Sorted name:length:mtime of `path`'s visible files (a single-file
    * relation stamps as itself — listStatus on a file returns it);
    * empty when absent, so the caller's own read produces its loud,
    * named refusal rather than this helper guessing. */
  def of(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) ""
    else fs.listStatus(p).toSeq
      .filter(f => f.isFile && isVisible(f.getPath.getName))
      .sortBy(_.getPath.getName)
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .mkString(";")
  }
}

package graft.sources

import org.apache.spark.sql.SparkSession

/** Content stamp of an at-rest relation — the invalidation currency of
  * every corpus-derived driver memo (round 13, generalizing the
  * sharded-HNSW `ShardGraphCache` contract): the sorted
  * path:length:mtime listing of a relation's visible files changes
  * exactly when the relation's bytes change, so a memo KEYED by the
  * stamp can never return a value derived from rewritten data —
  * staleness becomes a lookup miss, not a protocol the caller must
  * remember (`invalidate*Memo()` remains for cold-timing, but
  * correctness no longer depends on anyone calling it). One listing
  * round per directory level to the relation's own filesystem per
  * memoized call — noise next to what these memos guard (k-means
  * training, union-find clustering, graph construction). */
object ContentStamp {

  /** Hidden-file convention shared with Spark's listing: `_` metadata
    * and `.` working files are not relation content. */
  def isVisible(name: String): Boolean =
    !name.startsWith(".") && !name.startsWith("_")

  /** Sorted relative-path:length:mtime of `path`'s visible files,
    * RECURSING into visible subdirectories (a partitioned relation's
    * data lives under `key=value/` dirs — stamping only the top level
    * would freeze the stamp at "" and silently never re-key, the exact
    * failure this helper exists to prevent). A single-file relation
    * stamps as itself — listStatus on a file returns it. Empty when
    * absent, so the caller's own read produces its loud, named refusal
    * rather than this helper guessing. */
  def of(spark: SparkSession, path: String): String = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return ""
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: org.apache.hadoop.fs.Path, prefix: String): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (isVisible(name)) {
          if (st.isDirectory) walk(st.getPath, s"$prefix$name/")
          else out += s"$prefix$name:${st.getLen}:${st.getModificationTime}"
        }
      }
    walk(root, "")
    out.sorted.mkString(";")
  }

  /** The corpus-relation stamp every embedding-derived memo keys on
    * (one definition — Hnsw and Similarity share it, so the formats
    * cannot drift apart). */
  def ofCorpus(spark: SparkSession, dir: String): String =
    of(spark, s"$dir/embeddings.parquet")
}

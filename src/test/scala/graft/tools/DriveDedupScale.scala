package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-index scale ladder (the DriveAnnScale pattern for the LSH
  * dedup index): pushes `Dedup.writeDedupIndex` / `dedupServeBatch`
  * orders of magnitude past the testdata so the "no stage scans the
  * corpus" serve claim carries measured points — build wall, on-disk
  * bytes/doc (buckets vs shingles split), and a bounded 100-doc probe
  * latency vs corpus size (SCALE.md §"Dedup index ladder" is authored
  * from this output). Also sweeps the `shards` dial at one rung: 64 is
  * the default; per the r9 layout lesson (partition levels must earn
  * their pruning) the sweet spot must be earned with data, not
  * asserted.
  *
  * Corpus: synthetic ~40-token docs over a 50k-token hashed vocab.
  * Every 50th doc is a near-dup of its predecessor (shares the 38
  * template tokens, differs in its 2 per-doc tokens — J ≈ 0.9), the
  * rest are unique: a few-percent dup rate like a real crawl, so
  * probes find real candidates without degenerate 50-doc dup
  * cliques. The probe batch is 100 NEW docs: half near-dups of
  * indexed docs (expect hits), half fresh (expect misses).
  *
  * `Test/runMain graft.tools.DriveDedupScale [nDocs ...] [sweep:n]`
  * (default ladder 1e5 1e6 1e7; `sweep:1000000` also builds
  * shards=16/256 variants at that rung) */
object DriveDedupScale {
  // the corpus generator lives in main scope (graft.sources
  // .SyntheticDocs) so Bench's amortized intake line shares it
  def docText(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.sources.SyntheticDocs.docText(idCol)

  def syntheticDocs(spark: org.apache.spark.sql.SparkSession, n: Long): DataFrame =
    graft.sources.SyntheticDocs.corpus(spark, n)

  def main(args: Array[String]): Unit = {
    val ladder: Seq[Long] =
      args.filterNot(_.startsWith("sweep:")).map(_.toDouble.toLong).toSeq match {
        case Seq() => Seq(100000L, 1000000L, 10000000L)
        case xs => xs
      }
    val sweepAt: Option[Long] = args.collectFirst {
      case a if a.startsWith("sweep:") => a.stripPrefix("sweep:").toDouble.toLong
    }
    val spark = GraftSession.local("graft-dedup-scale")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def writeCorpus(n: Long, dir: String): Unit =
      syntheticDocs(spark, n)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // `size` NEW docs (ids beyond the corpus): evens are near-dups of
    // indexed docs (template token block of doc q*97 % n), odds fresh.
    // Batch size is the pruning variable: 100 docs × 16 bands ≈ 1600
    // buckets saturate every shard (the candidate join reads the whole
    // buckets relation); a 2-doc batch probes ≤ 32 buckets → ≤ 32
    // shards' partitions, where the static filter actually prunes.
    def probeBatch(n: Long, size: Int = 100): DataFrame =
      spark.range(n, n + size).select(
        col("id").as("doc_id"),
        when(pmod(col("id"), lit(2L)) === 0,
          docText(pmod(col("id") * 97, lit(n))))
          .otherwise(docText(col("id") + lit(1000000000L))).as("text"))

    def duBytes(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(path))
    }
    def rmrf(path: String): Unit = {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(path))
    }
    def minOf2(f: => Unit): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

    for (n <- ladder) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-dedupscale-$n").toString
      try {
        writeCorpus(n, dir)
        val inputB = duBytes(s"$dir/documents.parquet")
        val shardList: Seq[Int] =
          if (sweepAt.contains(n)) Seq(16, 64, 256) else Seq(64)
        for (shards <- shardList) {
          val idx = s"$dir/index-$shards"
          val tb = System.nanoTime()
          Dedup.writeDedupIndex(spark, dir, idx, shards = shards)
          val buildS = (System.nanoTime() - tb) / 1e9
          val bucketsB = duBytes(s"$idx/buckets")
          val shinglesB = duBytes(s"$idx/shingles")
          def serveOf(size: Int): Double = {
            val batch = probeBatch(n, size)
            def serve(): Unit = {
              Dedup.dedupServeBatch(spark, idx, batch).count()
              spark.catalog.clearCache()
            }
            serve() // warm (plan + filesystem metadata)
            minOf2(serve())
          }
          val serveS = serveOf(100)
          val serve2S = serveOf(2)
          val hits = Dedup.dedupServeBatch(spark, idx, probeBatch(n)).count()
          spark.catalog.clearCache()
          println(f"DEDUPSCALE n=$n%-9d shards=$shards%-4d build=$buildS%7.1fs " +
            f"input=${inputB / 1e6}%8.1fMB buckets=${bucketsB / 1e6}%8.1fMB " +
            f"shingles=${shinglesB / 1e6}%8.1fMB " +
            f"bytesPerDoc=${(bucketsB + shinglesB).toDouble / n}%6.1f " +
            f"serve100=$serveS%6.2fs serve2=$serve2S%6.2fs hits=$hits%3d")
          if (shards != 64) rmrf(idx) // keep disk bounded during sweeps
        }
      } finally rmrf(dir)
    }
    spark.stop()
  }
}

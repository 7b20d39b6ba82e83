package graft.sources

/** THE index-metadata convention — one file name, one read/write/require
  * contract — shared by every at-rest index in the library (the ANN
  * index's model dials, the LSH dedup index's banding dials).
  *
  * Why one helper: an index's dials are part of its identity — a serve
  * or append path re-deriving them differently is SILENT recall loss
  * (a mismatched `shards` modulus drops true candidates; a different
  * `nClusters` trains a coarse quantizer whose probes route to cells
  * the index never wrote). Each index family therefore persists its
  * dials AT the index and REQUIRES them at read; this object pins the
  * mechanics so no family can drift in file name or failure mode.
  *
  * The name is `_meta.json`: underscore-prefixed files are ignored by
  * Spark's partition discovery and file-index listing, so the metadata
  * can sit at the dataset root itself (the ANN index root IS a parquet
  * dataset) as well as above partitioned subdirectories (the dedup
  * index root holds `buckets/` + `shingles/`).
  *
  * Deliberately primitive — a flat string/int object, hand-serialized
  * and regex-parsed: the contract is a handful of dials, and a JSON
  * library dependency (or a lenient parser) is more surface than the
  * problem. */
object IndexMeta {
  val fileName = "_meta.json"

  private def path(indexPath: String) =
    java.nio.file.Paths.get(s"$indexPath/$fileName")

  def exists(indexPath: String): Boolean =
    java.nio.file.Files.exists(path(indexPath))

  /** Write `fields` as a flat JSON object in the given order (the
    * write is deterministic — byte-identical for identical dials).
    * String values are quoted; everything else is serialized bare. */
  def write(indexPath: String, fields: Seq[(String, Any)]): Unit = {
    new java.io.File(indexPath).mkdirs()
    val body = fields.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(path(indexPath), body.getBytes("UTF-8"))
  }

  /** The raw metadata JSON; LOUD on a meta-less directory, naming the
    * builder whose index this should have been. */
  def readRaw(indexPath: String, builder: String): String = {
    require(exists(indexPath),
      s"$indexPath/$fileName not found — not a $builder index " +
        s"(or a pre-meta layout; rebuild with $builder)")
    new String(java.nio.file.Files.readAllBytes(path(indexPath)), "UTF-8")
  }

  def intField(json: String, k: String): Int = {
    val m = ("\"" + k + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(json)
    require(m.isDefined, s"$fileName missing $k: $json")
    m.get.group(1).toInt
  }

  def strField(json: String, k: String): String = {
    val m = ("\"" + k + "\"\\s*:\\s*\"(\\w+)\"").r.findFirstMatchIn(json)
    require(m.isDefined, s"$fileName missing $k: $json")
    m.get.group(1)
  }
}

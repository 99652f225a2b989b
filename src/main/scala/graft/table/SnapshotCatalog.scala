package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import com.fasterxml.jackson.databind.{ObjectMapper, JsonNode}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** Global corpus statistics pinned at snapshot time so resumed builds and
  * both query engines score with identical avgdl. */
case class CorpusStats(numDocs: Long, totalTokens: Long) {
  def avgdl: Double = if (numDocs == 0) 1.0 else totalTokens.toDouble / numDocs
}

/** One committed index snapshot. Monotonically numbered like the
  * reference's versioned `comparisons_NNN` tables
  * (reference: sqlite.py:152-159); `parentId` gives the lineage chain.
  * A killed build resumes from the `CURRENT` snapshot: shards in
  * `completedShards` are never rebuilt. */
case class Snapshot(id: Long,
                    parentId: Long, // -1 = none
                    numShards: Int,
                    completedShards: Seq[Int],
                    segmentDirs: Seq[String],
                    docmapDirs: Seq[String],
                    lineageDirs: Seq[String],
                    termstatsDir: String, // empty until final commit
                    stagingDone: Boolean,
                    stats: CorpusStats,
                    timestampMs: Long,
                    /** parquet dirs of (shard, ord, doc_id) delete tombstones;
                      * queries mask them, compaction purges them (Lucene's
                      * live-docs discipline). Empty on pre-delete manifests. */
                    tombstoneDirs: Seq[String] = Nil,
                    /** segments carry per-posting position payloads (phrase
                      * queries). Sticky: set at stage time, followed by every
                      * append/compact generation. */
                    positions: Boolean = false) {
  def isComplete: Boolean = completedShards.size == numShards && termstatsDir.nonEmpty
}

/** Self-built snapshot/manifest layer over parquet: Iceberg *semantics*
  * (atomic commit via rename, monotone snapshot ids, resume-from-snapshot,
  * lineage) without the Iceberg jar (absent from this environment —
  * SURVEY.md §1.4). Metadata lives in `<dir>/snapshots/vNNNNN.json`; the
  * `CURRENT` pointer is committed by atomic rename, the same durability
  * move the reference makes with per-table versioning, minus the
  * per-row-commit anti-pattern (reference: sqlite.py:188-190).
  */
object SnapshotCatalog {

  private val mapper = new ObjectMapper()

  def snapshotsDir(dir: String) = s"$dir/snapshots"
  def currentPath(dir: String) = s"$dir/snapshots/CURRENT"

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def toJson(s: Snapshot): String = {
    val o = mapper.createObjectNode()
    o.put("id", s.id); o.put("parentId", s.parentId)
    o.put("numShards", s.numShards)
    val cs = o.putArray("completedShards"); s.completedShards.foreach(cs.add)
    val sd = o.putArray("segmentDirs"); s.segmentDirs.foreach(sd.add)
    val dd = o.putArray("docmapDirs"); s.docmapDirs.foreach(dd.add)
    val ld = o.putArray("lineageDirs"); s.lineageDirs.foreach(ld.add)
    val td = o.putArray("tombstoneDirs"); s.tombstoneDirs.foreach(td.add)
    o.put("termstatsDir", s.termstatsDir)
    o.put("stagingDone", s.stagingDone)
    o.put("positions", s.positions)
    val st = o.putObject("stats")
    st.put("numDocs", s.stats.numDocs); st.put("totalTokens", s.stats.totalTokens)
    o.put("timestampMs", s.timestampMs)
    o.toPrettyString
  }

  private def fromJson(j: String): Snapshot = {
    val n: JsonNode = mapper.readTree(j)
    // absent-field tolerant: manifests written before a field existed
    // (e.g. tombstoneDirs) must keep loading
    def arr(f: String): Seq[String] = Option(n.get(f))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    Snapshot(
      id = n.get("id").asLong(),
      parentId = n.get("parentId").asLong(),
      numShards = n.get("numShards").asInt(),
      completedShards = n.get("completedShards").elements().asScala.map(_.asInt()).toSeq,
      segmentDirs = arr("segmentDirs"),
      docmapDirs = arr("docmapDirs"),
      lineageDirs = arr("lineageDirs"),
      termstatsDir = n.get("termstatsDir").asText(),
      stagingDone = n.get("stagingDone").asBoolean(),
      stats = CorpusStats(n.get("stats").get("numDocs").asLong(),
                          n.get("stats").get("totalTokens").asLong()),
      timestampMs = n.get("timestampMs").asLong(),
      tombstoneDirs = arr("tombstoneDirs"),
      positions = Option(n.get("positions")).exists(_.asBoolean()))
  }

  /** Read the CURRENT snapshot. If the CURRENT pointer is absent but
    * committed vNNNNN.json manifests exist (a crash inside an old
    * non-atomic flip, or a deleted pointer), recover from the highest
    * committed id — manifests are immutable once written, so the max id IS
    * the last durable commit and a resumed build loses nothing. */
  def load(spark: SparkSession, dir: String): Option[Snapshot] = {
    val f = fs(spark, dir)
    val cur = new Path(currentPath(dir))
    if (f.exists(cur)) {
      val id = readString(f, cur).trim.toLong
      Some(loadId(spark, dir, id))
    } else {
      val sd = new Path(snapshotsDir(dir))
      if (!f.exists(sd)) None
      else {
        val ids = f.listStatus(sd).map(_.getPath.getName)
          .collect { case VersionFile(id) => id.toLong }
        if (ids.isEmpty) None else Some(loadId(spark, dir, ids.max))
      }
    }
  }

  private val VersionFile = "v(\\d{5,})\\.json".r

  def loadId(spark: SparkSession, dir: String, id: Long): Snapshot = {
    val f = fs(spark, dir)
    fromJson(readString(f, new Path(f"${snapshotsDir(dir)}/v$id%05d.json")))
  }

  /** Atomically commit a snapshot: write the (immutable) vNNNNN.json, then
    * flip CURRENT via write-temp + OVERWRITING atomic rename (FileContext)
    * — no delete-then-rename window in which a crash leaves no pointer.
    * If the filesystem has no FileContext implementation, fall back to
    * delete+rename; `load` recovers from max(vNNNNN.json) in that window. */
  def commit(spark: SparkSession, dir: String, snap: Snapshot): Unit = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(snapshotsDir(dir)))
    writeString(f, new Path(f"${snapshotsDir(dir)}/v${snap.id}%05d.json"), toJson(snap))
    val tmp = new Path(s"${currentPath(dir)}.tmp-${snap.id}")
    writeString(f, tmp, snap.id.toString)
    val cur = new Path(currentPath(dir))
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        cur.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, cur, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (f.exists(cur)) f.delete(cur, false)
        if (!f.rename(tmp, cur))
          throw new java.io.IOException(s"atomic CURRENT flip failed for snapshot ${snap.id}")
    }
  }

  private def readString(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def writeString(f: FileSystem, p: Path, s: String): Unit = {
    val out = f.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

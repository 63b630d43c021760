package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Iceberg-style table manifest: each index stage commits its Parquet data
  * first, then atomically publishes a JSON manifest (temp file + ATOMIC_MOVE
  * rename) recording snapshot id, row count, per-file lineage metrics and
  * the stage config. A stage is "committed" iff its manifest exists — the
  * resume contract (reference analog: plan.json + chunk metadata + resume
  * skip, colbert/indexing/collection_indexer.py:87-95,360-363 and
  * index_saver.py:30-51).
  *
  * No Iceberg runtime jar ships in /opt/spark/jars offline, so this module
  * implements the same commit contract (atomic metadata swap over immutable
  * data files) directly. JSON is written/parsed with a ~40-line flat codec —
  * manifests are driver-side metadata, never row data.
  */
final case class FileLineage(path: String, rows: Long, bytes: Long)

final case class TableManifest(
    stage: String,
    snapshotId: Long,
    parentSnapshotId: Long,
    rows: Long,
    files: Seq[FileLineage],
    config: Map[String, String]) {

  def totalBytes: Long = files.map(_.bytes).sum

  def toJson: String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val fs = files.map(f => s"""{"path":${q(f.path)},"rows":${f.rows},"bytes":${f.bytes}}""")
      .mkString("[", ",", "]")
    val cfg = config.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    s"""{"stage":${q(stage)},"snapshot_id":$snapshotId,"parent_snapshot_id":$parentSnapshotId,"rows":$rows,"files":$fs,"config":$cfg}"""
  }
}

object TableManifest {

  /** Deterministic snapshot id: FNV-1a over the manifest's identifying
    * content (stage, parent, config, file lineage). Content-addressed ids
    * make resume verification trivial: same inputs → same id. */
  def snapshotId(stage: String, parent: Long, rows: Long,
                 files: Seq[FileLineage], config: Map[String, String]): Long = {
    var h = 0xcbf29ce484222325L
    def mix(s: String): Unit = s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      h ^= (b & 0xffL); h *= 0x100000001b3L
    }
    mix(stage); mix(parent.toString); mix(rows.toString)
    files.sortBy(_.path).foreach(f => mix(s"${f.path}:${f.rows}:${f.bytes}"))
    config.toSeq.sorted.foreach { case (k, v) => mix(s"$k=$v") }
    h
  }

  def apply(stage: String, parent: Long, rows: Long, files: Seq[FileLineage],
            config: Map[String, String]): TableManifest =
    new TableManifest(stage, snapshotId(stage, parent, rows, files, config),
      parent, rows, files, config)

  def manifestPath(tableDir: String): Path =
    Paths.get(tableDir).resolve("_graft_manifest.json")

  def exists(tableDir: String): Boolean = Files.exists(manifestPath(tableDir))

  /** Commit: temp write + atomic rename. Readers either see the complete
    * manifest or none — the Iceberg snapshot-swap contract. */
  def commit(tableDir: String, m: TableManifest): Unit = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve("_graft_manifest.json.tmp")
    Files.writeString(tmp, m.toJson)
    Files.move(tmp, manifestPath(tableDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Single-pass JSON string unescape (inverse of toJson's q()). A naive
    * two-step replace mis-parses sequences like original `\` + `"`. */
  private def unescape(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { out.append(s.charAt(i + 1)); i += 2 }
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Minimal JSON reader for manifests this module wrote (flat structure,
    * no nesting beyond the files array). */
  def read(tableDir: String): TableManifest = {
    val s = Files.readString(manifestPath(tableDir))
    def str(key: String, from: String): String = {
      val m = ("\"" + key + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
      m.findFirstMatchIn(from).map(x => unescape(x.group(1))).getOrElse("")
    }
    def num(key: String, from: String): Long = {
      val m = ("\"" + key + "\":(-?\\d+)").r
      m.findFirstMatchIn(from).map(_.group(1).toLong).getOrElse(0L)
    }
    val filesBlock = "\"files\":\\[(.*?)\\]".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val files = "\\{[^}]*\\}".r.findAllIn(filesBlock).map { f =>
      FileLineage(str("path", f), num("rows", f), num("bytes", f))
    }.toSeq
    val cfgBlock = "\"config\":\\{(.*?)\\}\\s*$".r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val cfg = "\"((?:[^\"\\\\]|\\\\.)*)\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(cfgBlock)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2)))
      .toMap
    new TableManifest(str("stage", s), num("snapshot_id", s),
      num("parent_snapshot_id", s), num("rows", s), files, cfg)
  }

  /** Per-file lineage from the committed Parquet footers: row counts come
    * from file metadata (no data scan). Recursive, so hive-partitioned
    * layouts (e.g. the bucketed blocks stage's bucket=N dirs) report every
    * data file; paths are recorded relative to the table root (identical
    * to the bare file name on flat layouts, so existing snapshot ids are
    * unchanged). */
  def lineageOf(spark: org.apache.spark.sql.SparkSession, tableDir: String): Seq[FileLineage] = {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) return Seq.empty
    val root = fs.makeQualified(p).toString.stripSuffix("/") + "/"
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer[FileLineage]()
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val rows = org.apache.parquet.hadoop.ParquetFileReader
          .readFooter(hconf, st.getPath).getBlocks.asScala.map(_.getRowCount).sum
        val rel = fs.makeQualified(st.getPath).toString.stripPrefix(root)
        out += FileLineage(rel, rows, st.getLen)
      }
    }
    out.sortBy(_.path).toSeq
  }
}

package graft.lake

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Minimal Iceberg-style snapshot layer over Parquet.
  *
  * No Iceberg runtime ships in /opt/spark/jars and coursier is offline
  * (SURVEY.md §7.1.2), so the engine provides the three properties the
  * north rule actually depends on, from scratch:
  *
  *  1. **Atomic visibility** — data files land under `data/`, then a
  *     `metadata/v{N}.json` manifest is written, then `version-hint.text`
  *     is atomically renamed into place. Readers resolve the hint; a
  *     crashed writer leaves garbage data files but never a partial table
  *     (the reference's tmp-write + backup-rename discipline,
  *     src/services/RAG/progress_store.py:10-31,
  *     convert_to_embeddings.py:586-599).
  *  2. **Per-partition lineage + metrics committed with the snapshot** —
  *     the manifest embeds the lineage rows (the reference's progress
  *     ledger, progress_store.py:33-61) and metrics rows (billing ledger,
  *     billing.py:14-72); they become visible in the same rename.
  *  3. **Checkpoint resume** — `committedKeys` is the set of work-unit keys
  *     (e.g. url-hash buckets) already in committed snapshots; planning
  *     anti-joins against it (progress_store.py:54-61 semantics).
  *
  * Paths are local-FS in this sandbox; rename-commit is atomic on POSIX.
  * On an object store this layer would swap the rename for a
  * putIfAbsent/conditional-put without changing callers.
  *
  * **Checkpointed planning state** (the reference's progress-file-rewrite
  * problem, solved the Iceberg way): every `checkpointInterval` commits the
  * table writes a consolidated `metadata/ckpt-vN.json` holding (key →
  * version) and (file → version) for everything committed so far, plus an
  * atomically-renamed `checkpoint-hint.text`. Readers resolve `state` from
  * the latest checkpoint + the ≤interval manifests after it — O(interval)
  * reads instead of O(versions) — so a 10^4-commit table plans as fast as a
  * 10-commit one. The checkpoint is a pure cache: deleting it (or crashing
  * between manifest and checkpoint writes) only slows readers down.
  */
final class LakeTable(val root: String, val checkpointInterval: Int = 16) {

  private def metaDir: Path = Paths.get(root, "metadata")
  private def hintFile: Path = Paths.get(root, "version-hint.text")
  private def ckptHintFile: Path = Paths.get(root, "checkpoint-hint.text")

  def currentVersion: Int =
    if (Files.exists(hintFile)) new String(Files.readAllBytes(hintFile), UTF_8).trim.toInt else 0

  /** Version of the newest consolidated checkpoint (0 = none). */
  def checkpointVersion: Int =
    if (Files.exists(ckptHintFile)) new String(Files.readAllBytes(ckptHintFile), UTF_8).trim.toInt else 0

  private def manifestPath(v: Int): Path = metaDir.resolve(s"v$v.json")
  private def ckptPath(v: Int): Path = metaDir.resolve(s"ckpt-v$v.json")

  /** Consolidated table state: every committed key and data file, each
    * tagged with the version that committed it (later commits of the same
    * key win). Resolved from the newest checkpoint + the manifests after
    * it. */
  final case class State(keyVersions: Seq[(String, Int)], fileVersions: Seq[(String, Int)])

  def state: State = stateAt(currentVersion)

  /** State as of snapshot `upTo` (time travel): newest checkpoint at or
    * before `upTo`, plus the manifests after it. Versions are immutable
    * once committed, so any historical snapshot replans exactly. */
  def stateAt(upTo: Int): State = {
    val cur = math.min(upTo, currentVersion)
    val cv = latestCheckpointAtOrBefore(cur)
    val base = if (cv > 0) readCheckpoint(cv) else State(Nil, Nil)
    val kv = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    base.keyVersions.foreach { case (k, v) => kv.update(k, v) }
    val fv = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    fv ++= base.fileVersions
    var v = cv + 1
    while (v <= cur) {
      val m = readManifest(v)
      m.keys.foreach(k => kv.update(k, v))
      fv ++= m.files.map(_ -> v)
      v += 1
    }
    State(kv.toSeq, fv.toSeq)
  }

  /** Newest checkpoint version ≤ `v`: the hint if it qualifies, else a
    * directory scan for older ckpt files (time travel before the newest
    * checkpoint is rare; O(versions) listing is acceptable there). */
  private def latestCheckpointAtOrBefore(v: Int): Int = {
    val hinted = checkpointVersion
    if (hinted >= 1 && hinted <= v) hinted
    else if (!Files.isDirectory(metaDir)) 0
    else {
      val ckptRe = "ckpt-v(\\d+)\\.json".r
      val stream = Files.list(metaDir)
      try {
        val it = stream.iterator()
        var best = 0
        while (it.hasNext) {
          it.next().getFileName.toString match {
            case ckptRe(n) if n.toInt <= v => best = math.max(best, n.toInt)
            case _ =>
          }
        }
        best
      } finally stream.close()
    }
  }

  /** All data files across committed snapshots (append-table semantics). */
  def dataFiles: Seq[String] = state.fileVersions.map(_._1)

  def committedKeys: Set[String] = state.keyVersions.map(_._1).toSet

  final case class Manifest(version: Int, parent: Int, files: Seq[String],
                            keys: Seq[String], lineage: Seq[Map[String, String]],
                            metrics: Map[String, Double])

  /** Commit one snapshot: the parquet files under `dataSubdir` (already
    * written by the caller via df.write), the work-unit keys they cover,
    * lineage rows, and metrics. Atomic via temp-write + ATOMIC_MOVE. */
  def commit(files: Seq[String], keys: Seq[String],
             lineage: Seq[Map[String, String]], metrics: Map[String, Double]): Int = {
    Files.createDirectories(metaDir)
    val v = currentVersion + 1
    val json = manifestJson(Manifest(v, v - 1, files, keys, lineage, metrics))
    // CREATE_NEW: optimistic concurrency — a racing committer loses with an
    // explicit FileAlreadyExistsException instead of silently clobbering
    // (single-writer is the design, as in the reference's driver loop; this
    // guard turns a violated assumption into a loud failure)
    Files.write(manifestPath(v), json.getBytes(UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW, java.nio.file.StandardOpenOption.WRITE)
    val tmp = metaDir.resolve(s".hint.$v.tmp")
    Files.write(tmp, v.toString.getBytes(UTF_8))
    Files.move(tmp, hintFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // best-effort: the checkpoint is a pure cache (deleting it only slows
    // readers down), and the commit above is already durably published —
    // a stale ckpt file or transient IO error must not surface as a commit
    // failure. Readers fall back to walking manifests.
    try maybeCheckpoint(v) catch { case _: java.io.IOException => () }
    v
  }

  /** Write a consolidated checkpoint when `checkpointInterval` commits have
    * accumulated since the last one. Computing the state here reads at most
    * `interval` manifests (previous checkpoint + tail), keeping commit cost
    * amortized O(1) per version. */
  private def maybeCheckpoint(v: Int): Unit = {
    if (checkpointInterval > 0 && v - checkpointVersion >= checkpointInterval) {
      val st = state
      val kv = st.keyVersions.map { case (k, kvv) => s""""${esc(s"$kvv|$k")}"""" }.mkString("[", ",", "]")
      val fvs = st.fileVersions.map { case (f, fvv) => s""""${esc(s"$fvv|$f")}"""" }.mkString("[", ",", "]")
      Files.write(ckptPath(v),
        s"""{"version":$v,"key_versions":$kv,"file_versions":$fvs}""".getBytes(UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW, java.nio.file.StandardOpenOption.WRITE)
      val tmp = metaDir.resolve(s".ckpt-hint.$v.tmp")
      Files.write(tmp, v.toString.getBytes(UTF_8))
      Files.move(tmp, ckptHintFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def readCheckpoint(v: Int): State = {
    val json = new String(Files.readAllBytes(ckptPath(v)), UTF_8)
    def versioned(field: String): Seq[(String, Int)] =
      strArrayIn(json, field).map { s =>
        val cut = s.indexOf('|')
        (s.substring(cut + 1), s.substring(0, cut).toInt)
      }
    State(versioned("key_versions"), versioned("file_versions"))
  }

  def read(spark: SparkSession): DataFrame = {
    val files = dataFiles
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Time-travel read: the table exactly as of snapshot `version`. */
  def readAt(spark: SparkSession, version: Int): DataFrame = {
    val files = stateAt(version).fileVersions.map(_._1)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  // ------------------------------------------------------------ JSON codec
  // Hand-rolled (no JSON lib beyond Spark's internals is guaranteed):
  // flat structure, strings escaped.

  private def esc(s: String): String = LakeTable.esc(s)

  private def manifestJson(m: Manifest): String = {
    val files = m.files.map(f => s""""${esc(f)}"""").mkString("[", ",", "]")
    val keys = m.keys.map(k => s""""${esc(k)}"""").mkString("[", ",", "]")
    val lineage = m.lineage.map { row =>
      row.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val metrics = m.metrics.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    s"""{"version":${m.version},"parent":${m.parent},"files":$files,"keys":$keys,"lineage":$lineage,"metrics":$metrics}"""
  }

  /** Quoted-string array field parser shared by manifest and checkpoint
    * files (the lazy `]` terminator is safe: esc() escapes brackets inside
    * string content). */
  private def strArrayIn(json: String, field: String): Seq[String] = {
    val r = ("\"" + field + "\":\\[(.*?)\\]").r
    r.findFirstMatchIn(json).map(_.group(1)) match {
      case Some("") | None => Nil
      case Some(body) =>
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(body).map(m => unesc(m.group(1))).toSeq
    }
  }

  def readManifest(v: Int): Manifest = {
    val json = new String(Files.readAllBytes(manifestPath(v)), UTF_8)
    def strArray(field: String): Seq[String] = strArrayIn(json, field)
    val lineage: Seq[Map[String, String]] = {
      val r = "\"lineage\":\\[(.*?)\\](?=,\"metrics\")".r
      r.findFirstMatchIn(json).map(_.group(1)) match {
        case Some(body) if body.nonEmpty =>
          "\\{(.*?)\\}".r.findAllMatchIn(body).map { m =>
            "\"((?:[^\"\\\\]|\\\\.)*)\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
              .findAllMatchIn(m.group(1))
              .map(kv => unesc(kv.group(1)) -> unesc(kv.group(2))).toMap
          }.toSeq
        case _ => Nil
      }
    }
    val metrics: Map[String, Double] = {
      val r = "\"metrics\":\\{(.*?)\\}".r
      r.findFirstMatchIn(json).map(_.group(1)) match {
        case Some(body) if body.nonEmpty =>
          "\"((?:[^\"\\\\]|\\\\.)*)\":([-0-9.eE]+)".r.findAllMatchIn(body)
            .map(m => unesc(m.group(1)) -> m.group(2).toDouble).toMap
        case _ => Map.empty
      }
    }
    val ver = "\"version\":(\\d+)".r.findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(v)
    val par = "\"parent\":(\\d+)".r.findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(v - 1)
    Manifest(ver, par, strArray("files"), strArray("keys"), lineage, metrics)
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** List parquet part-files under a directory (helper for callers that
    * just wrote with df.write.parquet). */
  def listParquet(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Nil
    else {
      val stream = Files.walk(p)
      // absolute+normalized at record time: manifest entries must join
      // exactly against scan-side provenance regardless of how the caller
      // spelled the table root (a relative root reaches here via the CLI)
      try stream.iterator().asScala
        .filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f))
        .map(_.toAbsolutePath.normalize.toString).toSeq.sorted
      finally stream.close()
    }
  }
}

/** Engine-wide JSON string escaper — ONE codec for every hand-built JSON
  * surface (manifests, checkpoints, the CLI's one-line results), so a doc
  * id or path containing quotes/backslashes/control chars can never emit
  * corrupt JSON anywhere. Brackets/braces also escape (as `[` etc.,
  * still-valid JSON) because the manifest reader's lazy field terminators
  * require an injective codec. */
object LakeTable {
  private[graft] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c @ ('[' | ']' | '{' | '}') => f"\\u${c.toInt}%04x"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}

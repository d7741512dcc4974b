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
  */
final class LakeTable(val root: String) {

  private def metaDir: Path = Paths.get(root, "metadata")
  private def hintFile: Path = Paths.get(root, "version-hint.text")

  def currentVersion: Int =
    if (Files.exists(hintFile)) new String(Files.readAllBytes(hintFile), UTF_8).trim.toInt else 0

  private def manifestPath(v: Int): Path = metaDir.resolve(s"v$v.json")

  /** All data files across committed snapshots (append-table semantics). */
  def dataFiles: Seq[String] = {
    (1 to currentVersion).flatMap { v =>
      val m = readManifest(v)
      m.files
    }
  }

  def committedKeys: Set[String] =
    (1 to currentVersion).flatMap(v => readManifest(v).keys).toSet

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
    v
  }

  def read(spark: SparkSession): DataFrame = {
    val files = dataFiles
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  // ------------------------------------------------------------ JSON codec
  // Hand-rolled (no JSON lib beyond Spark's internals is guaranteed):
  // flat structure, strings escaped.

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    // Brackets/braces are the readManifest field terminators (the lazy
    // regexes stop at the first ']' / '}'): escaping them in string content
    // makes the codec injective — a path or lineage value containing ']' can
    // no longer truncate the files/keys array or garble a lineage row.
    case c @ ('[' | ']' | '{' | '}') => f"\\u${c.toInt}%04x"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def manifestJson(m: Manifest): String = {
    val files = m.files.map(f => s""""${esc(f)}"""").mkString("[", ",", "]")
    val keys = m.keys.map(k => s""""${esc(k)}"""").mkString("[", ",", "]")
    val lineage = m.lineage.map { row =>
      row.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val metrics = m.metrics.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    s"""{"version":${m.version},"parent":${m.parent},"files":$files,"keys":$keys,"lineage":$lineage,"metrics":$metrics}"""
  }

  def readManifest(v: Int): Manifest = {
    val json = new String(Files.readAllBytes(manifestPath(v)), UTF_8)
    // minimal parser for our own flat format
    def strArray(field: String): Seq[String] = {
      val r = ("\"" + field + "\":\\[(.*?)\\]").r
      r.findFirstMatchIn(json).map(_.group(1)) match {
        case Some("") | None => Nil
        case Some(body) =>
          "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(body).map(m => unesc(m.group(1))).toSeq
      }
    }
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
    else Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f))
      .map(_.toString).toSeq.sorted
  }
}

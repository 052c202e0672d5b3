package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** One completed doc_id range: lineage + extraction metrics
  * (north rule: "Iceberg-snapshot checkpoints that record per-partition
  * lineage and extraction metrics so any failed run resumes exactly where it
  * stopped"). No Iceberg runtime jar ships in this environment (offline
  * coursier), so this thin manifest layer reproduces the snapshot semantics
  * over plain parquet range-partitions; a real iceberg-spark-runtime could
  * replace DocTable without touching the pipeline.
  */
final case class RangeEntry(
    rangeId: Int,
    lower: String,    // inclusive doc_id lower bound ("" = open)
    upper: String,    // exclusive doc_id upper bound ("" = open)
    path: String,     // partition directory relative to table root
    rows: Long,
    spans: Long,
    wallSecs: Double,
    // Media spans whose payload was missing or corrupt. BEST-EFFORT: sourced
    // from a LongAccumulator incremented inside mapPartitions, which Spark
    // re-counts under task retries / speculative execution, so this can
    // over-count under failures. Treat as an operational signal; an exact
    // count would require flagging dropped pieces in the written output.
    corruptPayloads: Long,
    inputDocs: String // lineage: input table path + predicate
)

/** Snapshot manifest: boundaries + completed ranges. Written atomically as
  * snapshots/v{n}.json (temp file + move); the latest version wins on read.
  */
final case class Snapshot(version: Int, boundaries: Seq[String], completed: Seq[RangeEntry]) {
  def completedIds: Set[Int] = completed.map(_.rangeId).toSet
}

object Manifest {

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def snapshotDir(root: String): Path = Paths.get(root, "snapshots")

  def latest(root: String): Option[Snapshot] = {
    val dir = snapshotDir(root)
    if (!Files.isDirectory(dir)) return None
    val versions = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt
      }
      .toSeq
    if (versions.isEmpty) None
    else Some(read(dir.resolve(s"v${versions.max}.json")))
  }

  def write(root: String, s: Snapshot): Unit = {
    val dir = snapshotDir(root)
    Files.createDirectories(dir)
    val body = render(s)
    val tmp = dir.resolve(s".v${s.version}.json.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"v${s.version}.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def render(s: Snapshot): String = {
    val bs = s.boundaries.map(q).mkString("[", ",", "]")
    val es = s.completed.map { e =>
      s"""{"rangeId":${e.rangeId},"lower":${q(e.lower)},"upper":${q(e.upper)},"path":${q(e.path)},""" +
        s""""rows":${e.rows},"spans":${e.spans},"wallSecs":${e.wallSecs},"corruptPayloads":${e.corruptPayloads},"inputDocs":${q(e.inputDocs)}}"""
    }.mkString("[", ",", "]")
    s"""{"version":${s.version},"boundaries":$bs,"completed":$es}"""
  }

  /** Minimal JSON reader for the shape this object writes (no JSON lib in
    * the offline dependency set; the format is fully under our control).
    */
  def read(p: Path): Snapshot = {
    val body = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    val version = """"version":(\d+)""".r.findFirstMatchIn(body).get.group(1).toInt
    val boundaries = {
      // Escape-aware scan: boundaries are doc_ids sampled from input data and
      // may contain ']' — a non-greedy `\[(.*?)\]` regex would stop at the
      // first ']' and silently truncate the list, corrupting resume ranges.
      // Consume quoted strings (the only array element type we write) until
      // the ']' that closes the array OUTSIDE any string.
      val start = body.indexOf("\"boundaries\":[")
      require(start >= 0, s"no boundaries array in $p")
      var i = start + "\"boundaries\":[".length
      val out = Seq.newBuilder[String]
      var closed = false
      while (!closed) {
        body.charAt(i) match {
          case ']' => closed = true
          case '"' =>
            val sb = new StringBuilder
            i += 1
            while (body.charAt(i) != '"') {
              if (body.charAt(i) == '\\') { sb += body.charAt(i); i += 1 }
              sb += body.charAt(i); i += 1
            }
            out += unescape(sb.toString)
            i += 1
          case _ => i += 1 // comma / whitespace
        }
      }
      out.result()
    }
    val entryRe =
      ("""\{"rangeId":(\d+),"lower":"((?:[^"\\]|\\.)*)","upper":"((?:[^"\\]|\\.)*)","path":"((?:[^"\\]|\\.)*)",""" +
        """"rows":(\d+),"spans":(\d+),"wallSecs":([0-9.Ee+-]+),"corruptPayloads":(\d+),"inputDocs":"((?:[^"\\]|\\.)*)"\}""").r
    val completed = entryRe.findAllMatchIn(body).map { m =>
      RangeEntry(m.group(1).toInt, unescape(m.group(2)), unescape(m.group(3)), unescape(m.group(4)),
        m.group(5).toLong, m.group(6).toLong, m.group(7).toDouble, m.group(8).toLong, unescape(m.group(9)))
    }.toSeq
    Snapshot(version, boundaries, completed)
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Range id for a doc_id given sorted boundaries (rangeId i covers
    * [boundaries(i-1), boundaries(i)), lexicographic).
    */
  def rangeOf(boundaries: Seq[String], docId: String): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (docId >= boundaries(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }
}

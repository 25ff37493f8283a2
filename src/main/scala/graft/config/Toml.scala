package graft.config

import java.time.{LocalDate, LocalDateTime}
import scala.collection.mutable

/** Minimal TOML-subset parser for site metadata files.
  *
  * Covers the grammar the reference's configs actually use
  * (test_data/example_fs1.toml, valid_data_ranges.toml): `[section]` /
  * `[a.b]` headers, `key = value` (incl. dotted keys), strings ('x'/"x"),
  * ints, floats, booleans, dates (2021-04-30), datetimes
  * (2021-05-02T22:00:00), and (nested) single-line arrays. Values land in
  * a flat dotted-path map; dates/datetimes become `java.sql.Timestamp`
  * (UTC convention, matching the reference's tz='UTC').
  *
  * Driver-side only: configs parameterize the *plan*, they are not data.
  */
object Toml {

  def parseFile(path: String): Map[String, Any] =
    parse(scala.io.Source.fromFile(path, "UTF-8").mkString)

  def parse(text: String): Map[String, Any] = {
    val out = mutable.LinkedHashMap[String, Any]()
    var prefix = ""
    for (raw <- text.linesIterator) {
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[") && line.endsWith("]")) {
          prefix = line.substring(1, line.length - 1).trim + "."
        } else {
          val eq = line.indexOf('=')
          require(eq > 0, s"unparseable TOML line: $raw")
          val key = line.substring(0, eq).trim
          val value = parseValue(line.substring(eq + 1).trim)
          out(prefix + key) = value
        }
      }
    }
    // ListMap: .toMap on the LinkedHashMap would lose file order,
    // and source ORDER is semantic — the reference concatenates
    // datasets in metafile order, which decides keep-first dedup
    // winners
    scala.collection.immutable.ListMap(out.toSeq: _*)
  }

  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    val i = line.indexWhere { c =>
      c match {
        case '\'' if !inD => inS = !inS; false
        case '"' if !inS  => inD = !inD; false
        case '#'          => !inS && !inD
        case _            => false
      }
    }
    if (i >= 0) line.substring(0, i) else line
  }

  private val DateRe = """\d{4}-\d{2}-\d{2}""".r
  private val DateTimeRe = """\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2})?""".r

  def parseValue(s: String): Any = s match {
    case _ if s.startsWith("[") => parseArray(s)
    case _ if (s.startsWith("'") && s.endsWith("'") && s.length >= 2) ||
              (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2) =>
      s.substring(1, s.length - 1)
    case "true" => true
    case "false" => false
    case _ if DateTimeRe.matches(s) =>
      java.sql.Timestamp.valueOf(
        LocalDateTime.parse(s.replace(' ', 'T')))
    case _ if DateRe.matches(s) =>
      java.sql.Timestamp.valueOf(LocalDate.parse(s).atStartOfDay())
    case _ if s.matches("[+-]?\\d+") => s.toLong
    case _ => s.toDouble
  }

  /** Split a single-line (possibly nested) array literal. */
  def parseArray(s: String): List[Any] = {
    require(s.startsWith("[") && s.endsWith("]"), s"bad array: $s")
    val inner = s.substring(1, s.length - 1).trim
    if (inner.isEmpty) Nil
    else {
      val parts = mutable.ListBuffer[String]()
      var depth = 0; var inQ = false; var start = 0
      for (i <- inner.indices) inner(i) match {
        case '\'' | '"' => inQ = !inQ
        case '[' if !inQ => depth += 1
        case ']' if !inQ => depth -= 1
        case ',' if !inQ && depth == 0 =>
          parts += inner.substring(start, i); start = i + 1
        case _ =>
      }
      parts += inner.substring(start)
      parts.map(p => parseValue(p.trim)).toList
    }
  }

  // typed accessors ---------------------------------------------------

  def str(m: Map[String, Any], k: String): String = m(k).asInstanceOf[String]
  def strOpt(m: Map[String, Any], k: String): Option[String] =
    m.get(k).map(_.asInstanceOf[String])
  def dbl(m: Map[String, Any], k: String): Double = dblValue(m(k))
  def dblValue(v: Any): Double = v match {
    case d: Double => d; case l: Long => l.toDouble
  }
  /** Keys under `prefix.`, in FILE order (parse preserves it) — a
    * lexicographic sort would order ds10 before ds2 and silently
    * reorder the reference's dataset concatenation. */
  def keysUnder(m: Map[String, Any], prefix: String): Seq[String] =
    m.keys.filter(_.startsWith(prefix + ".")).toSeq
}

package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Parse the reference's notebook job format — an `.ipynb` whose code cells
  * are the job (`example/notebook/scd2-job.ipynb`, SURVEY.md §3 entry point
  * A): magic cells (`%conf`, `%env`, `%sql`, `%printschema`) plus raw
  * JSON/HOCON stage configs, in document order. A user of the reference can
  * hand their notebook file to [[Runner]] (`configUri` ending in `.ipynb`)
  * unchanged.
  *
  * Cell dialects handled exactly as the reference writes them:
  *  - `%conf` / `%env`: body lines are `key=value` (`scd2-job.ipynb:20-22,
  *    131-132`); `%env` values may be SQL fragments substituted as raw text.
  *  - `%sql`: header attrs on the magic line (`outputView="v" name="..."
  *    environments=dev,test sqlParams=k=v,k2=${X}`, `scd2-job.ipynb:141`),
  *    SQL body after it.
  *  - `%printschema`: body lines are view names (`scd2-job.ipynb:66-67`).
  *  - `{...}` stage cells are Arc's HOCON-leaning JSON: `"s3a://"${VAR}"/p"`
  *    string splices and missing commas between fields both appear in the
  *    reference file — normalized to strict JSON before parsing.
  */
object NotebookJob {
  private val mapper = new ObjectMapper()

  def fromFile(path: String): (JobSpec, Map[String, String]) =
    fromIpynb(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def fromIpynb(ipynbJson: String): (JobSpec, Map[String, String]) = {
    val root = mapper.readTree(ipynbJson)
    require(root.has("cells"), "not an ipynb document: no 'cells'")
    var conf = JobConf()
    val env = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val stages = scala.collection.mutable.ArrayBuffer.empty[Stage]
    root.get("cells").elements().asScala
      .filter(c => c.get("cell_type").asText() == "code")
      .foreach { c =>
        // nbformat allows 'source' as one string OR a list of lines
        val srcNode = c.get("source")
        val src =
          if (srcNode.isTextual) srcNode.asText()
          else srcNode.elements().asScala.map(_.asText()).mkString
        val cell = src.trim
        if (cell.nonEmpty) {
          if (cell.startsWith("%conf")) {
            kvLines(cell).foreach {
              case ("numRows", v) => conf = conf.copy(numRows = v.toInt)
              case ("showLog", v) => conf = conf.copy(showLog = v.toBoolean)
              case _ => () // unknown conf keys are tolerated, as in the reference
            }
          } else if (cell.startsWith("%env")) {
            env ++= kvLines(cell)
          } else if (cell.startsWith("%printschema")) {
            // view names may sit on the magic line itself or on body lines
            val views = cell.linesIterator.zipWithIndex.flatMap { case (l, i) =>
              val t = if (i == 0) l.trim.stripPrefix("%printschema") else l
              t.trim.split("\\s+").filter(_.nonEmpty)
            }
            views.foreach(v => stages += PrintSchema(s"printschema $v", v))
          } else if (cell.startsWith("%sql")) {
            val nl = cell.indexOf('\n')
            require(nl > 0, s"%sql cell has no body: $cell")
            val attrs = headerAttrs(cell.substring(4, nl))
            val body = cell.substring(nl + 1).trim
            val params = attrs.get("sqlParams")
              .map(EnvResolver.parseSqlParams).getOrElse(Map.empty)
            val envsOf = attrs.get("environments")
              .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
            attrs.get("outputView") match {
              case Some(ov) => stages += SQLTransform(
                name = attrs.getOrElse("name", ov),
                sql = body, outputView = ov, sqlParams = params,
                environments = envsOf)
              case None =>
                // no outputView = a side-effecting cell (maintenance verbs
                // — OPTIMIZE / VACUUM / COPY INTO — or catalog DDL): the
                // reference's SQL-stage idiom, routed through the same
                // TableSql-first dispatcher SQLExecute uses
                stages += SQLExecute(
                  name = attrs.getOrElse("name", "sql"),
                  sql = body, sqlParams = params, environments = envsOf)
            }
          } else if (cell.startsWith("{")) {
            // the reference notebook is a tutorial: one stage cell is a
            // fill-in-the-blank placeholder (a backtick-prose line plus
            // ????????? filler, scd2-job.ipynb cell "2.1 build your
            // transformation here"). A cell is only SKIPPED when it both
            // looks like that placeholder AND fails strict parsing — a real
            // stage whose embedded SQL starts a line with a backticked
            // identifier parses fine and is kept, and anything else
            // unparseable raises naming the cell (a vanishing stage is far
            // harder to notice than a parse error).
            val flagged = cell.linesIterator.exists { l =>
              val t = l.trim
              t.startsWith("`") || t.startsWith("???")
            }
            val parsed =
              try Some(mapper.readTree(normalizeHocon(cell)))
              catch { case _: Exception if flagged => None }
            parsed match {
              case Some(node) => stages += JobSpec.parseStage(node)
              case None if cell.contains("???") => () // the tutorial placeholder
              case None => throw new IllegalArgumentException(
                s"stage cell is not valid JSON/HOCON and is not the known tutorial " +
                  s"placeholder: ${cell.takeWhile(_ != '\n')}")
            }
          } else {
            throw new IllegalArgumentException(
              s"unrecognized cell dialect: ${cell.takeWhile(_ != '\n')}")
          }
        }
      }
    (JobSpec(stages.toSeq, conf), env.toMap)
  }

  /** `key=value` entries of a magic cell — body lines (whole-line values, so
    * SQL fragments with spaces work) plus `k=v` / `k="quoted value"` tokens
    * trailing on the magic line itself (`%conf numRows=5`, `%env G="a b"`),
    * tokenized with the same quoted-attr grammar as %sql headers. */
  private def kvLines(cell: String): Seq[(String, String)] = {
    val first = cell.linesIterator.next()
    val magicLineAttrs = headerAttrs(first.trim.split("\\s+", 2) match {
      case Array(_, rest) => rest
      case _ => ""
    }).toSeq
    val bodyEntries = cell.linesIterator.drop(1).map(_.trim).filter(_.nonEmpty).map { l =>
      val i = l.indexOf('=')
      require(i > 0, s"bad key=value entry '$l'")
      l.substring(0, i).trim -> l.substring(i + 1).trim
    }
    magicLineAttrs ++ bodyEntries
  }

  /** `k="quoted" k2=bare,list k3=a=b,c=${X}` magic-header attributes: values
    * run to the next whitespace unless double-quoted. */
  private val Attr = """(\w+)=("([^"]*)"|\S+)""".r
  private def headerAttrs(header: String): Map[String, String] =
    Attr.findAllMatchIn(header).map { m =>
      m.group(1) -> Option(m.group(3)).getOrElse(m.group(2))
    }.toMap

  /** Normalize Arc's HOCON-leaning stage JSON to strict JSON (every quirk
    * below appears verbatim in the reference file):
    *  - `"prefix"${VAR}"suffix"` string splices become one string with the
    *    `${VAR}` token inside (EnvResolver substitutes it later);
    *  - a bare `"key": ${VAR}` substitution value is quoted;
    *  - `//` comment lines are stripped;
    *  - a missing comma between a line-ending value and a next-line `"key":`
    *    is inserted. */
  private[etl] def normalizeHocon(cell: String): String = {
    // glue fires only for text-adjacent splices ("s3a://"${X}"/p",
    // ...Region="${X}";...), never for a var that IS the whole value; the
    // quote rule fires only in value position (after a colon), never inside
    // an already-glued string
    val glued = cell
      .replaceAll("""(?<=[^\s:,\[{])"\$\{([A-Za-z0-9_.\-]+)\}"(?=[^\s,}\]])""", "\\${$1}")
      .replaceAll("""(?<=:[ \t]{0,10})\$\{([A-Za-z0-9_.\-]+)\}""", "\"\\${$1}\"")
      .linesIterator.filterNot(_.trim.startsWith("//")).mkString("\n")
    glued.linesIterator.toSeq.foldRight(List.empty[String]) { (line, rest) =>
      val fixed = rest.headOption match {
        case Some(next)
          if next.trim.matches("\"[^\"]+\"\\s*:.*") &&
            line.trim.matches(""".*(["\d\]}]|true|false|null)\s*$""") &&
            !line.trim.endsWith(",") && !line.trim.endsWith("{") &&
            !line.trim.endsWith("[") => line + ","
        case _ => line
      }
      fixed :: rest
    }.mkString("\n")
  }
}

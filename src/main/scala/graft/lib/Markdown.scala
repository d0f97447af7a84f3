package graft.lib

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset
import graft.model.ReceiptItem
import Py._

/** Markdown artifact renderer [EQ]
  * (reference: app/core/markdown_formatter.py:15-353). The reference
  * stamps wall-clock `datetime.now()`; we inject the turn's `ts`
  * (SURVEY.md §7.4 non-determinism excision) — the golden generator
  * freezes the reference's clock to the same value.
  */
object Markdown {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** Python `f"{x:.2f}"`. */
  private def f2(x: Double): String = {
    val bd = new java.math.BigDecimal(x).setScale(2, java.math.RoundingMode.HALF_EVEN)
    bd.toPlainString
  }

  /** format_ocr_results for the transcript pipeline's result shape.
    * `structured` carries insertion-ordered fields (the reference's
    * dicts are insertion-ordered). */
  def render(
      filename: String,
      ts: Timestamp,
      status: String,
      formattedText: String,
      confidence: Double,
      detectedLanguage: String,
      payloadKind: String,
      summaryRaw: String, // pre-clean_response_text, as the reference renders it
      insightsRaw: Seq[String],
      documentStructure: String,
      structured: Option[InfoExtract.OrderedInfo]): String = {

    val md = scala.collection.mutable.ArrayBuffer.empty[String]
    val now = fmt.format(ts.toInstant)

    md += "---"
    md += s"title: OCR Results for $filename"
    md += s"date: $now"
    md += s"status: $status"
    md += s"language: $detectedLanguage"
    md += s"confidence: ${f2(confidence)}"
    md += s"image_type: $payloadKind"
    md += "engine: transcript"
    md += "---"
    md += ""
    md += s"# OCR Results: $filename"
    md += s"*Processed on: $now*"
    md += ""
    md += "## Processing Information"
    md += ""
    md += "| Property | Value |"
    md += "| -------- | ----- |"
    md += s"| Status | `$status` |"
    md += s"| Processing Time | ${f2(0.0)} ms |"
    md += s"| Detected Language | $detectedLanguage |"
    md += s"| Image Type | $payloadKind |"
    md += "| OCR Engine | transcript |"
    md += s"| Confidence | ${f2(confidence)}% |"
    md += ""

    if (summaryRaw != null && summaryRaw.nonEmpty) {
      md += "## Summary"
      md += ""
      md += "> " + summaryRaw.replace("\n", "\n> ")
      md += ""
    }
    if (insightsRaw != null && insightsRaw.nonEmpty) {
      md += "## Key Insights"
      md += ""
      insightsRaw.foreach(i => md += s"* $i")
      md += ""
    }
    if (documentStructure != null) {
      md += "## Document Structure"
      md += ""
      md += s"Detected structure: **$documentStructure**"
      md += ""
    }

    if (formattedText != null && formattedText.nonEmpty) {
      md += "## Extracted Text"
      md += ""
      val ds = if (documentStructure == null) "" else lower(documentStructure)
      val it = lower(payloadKind)
      if (it == "signage") {
        md += "```"
        md += formattedText
        md += "```"
      } else if (ds.contains("table") || ds.contains("form") ||
                 it.contains("table") || it.contains("form")) {
        formatTableText(formattedText, md)
      } else if (ds.contains("code") || ds.contains("scientific")) {
        md += "```"
        md += formattedText
        md += "```"
      } else if (ds.contains("bullet")) {
        formatBulletText(formattedText, md)
      } else {
        formatRegularText(formattedText, md)
      }
      md += ""
    }

    // Structured section — truthiness mirrors Python: a dict with no
    // keys (generic/empty) renders nothing.
    structured.foreach { s =>
      val nonEmpty = s.kind match {
        case "receipt" => true // receipt dict always has 'items'
        case "table" => true // always has headers+rows keys
        case _ => s.fields.nonEmpty
      }
      if (nonEmpty) {
        md += "## Structured Information"
        md += ""
        if (s.kind == "receipt") formatReceiptInfo(s, md)
        else formatKeyValueInfo(s, md)
        md += ""
      }
    }
    md.mkString("\n")
  }

  /** _format_regular_text (markdown_formatter.py:179-189). */
  def formatRegularText(text: String, md: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    for (paragraph <- text.split("\n\n", -1)) {
      if (strip(paragraph).nonEmpty) {
        md += escapeMarkdown(strip(paragraph))
        md += ""
      }
    }
  }

  private val pNumDot = Py.compile("^\\d+\\.")
  private val pNumParen = Py.compile("^\\d+\\)")
  private val pNumAny = Py.compile("^\\d+[\\.\\)]")
  private val pParenToDot = Py.compile("(\\d+)\\)")

  /** _format_bullet_text (:191-217). */
  def formatBulletText(text: String, md: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    for (raw <- Py.splitLines(text)) {
      var line = strip(raw)
      if (line.isEmpty) md += ""
      else {
        val bulletish = line.startsWith("•") || line.startsWith("-") ||
          line.startsWith("*") || line.startsWith("+") || rmatch(pNumAny, line).isDefined
        if (bulletish) {
          if (line.startsWith("•")) line = "* " + strip(line.substring(1))
          else if (rmatch(pNumDot, line).isDefined) { /* keep */ }
          else if (rmatch(pNumParen, line).isDefined) line = sub(pParenToDot, "$1.", line)
          md += line
        } else md += line
      }
    }
  }

  private val pBigGap = Py.compile("\\S+\\s{3,}\\S+")
  private val pColTok = Py.compile("\\S+(?:\\s{2,}|\\s*$)")

  /** _format_table_text (:219-271). */
  def formatTableText(text: String, md: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    val lines = Py.splitLines(text)
    val hasTable = lines.exists(l => l.contains('|') || search(pBigGap, l).isDefined)
    if (hasTable) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var headerDone = false
      for (raw <- lines) {
        val line = strip(raw)
        if (line.nonEmpty) {
          if (line.contains('|')) {
            out += line
            if (!headerDone) {
              val cols = Py.split(line, '|').length
              out += "|" + List.fill(cols - 1)("---").mkString("|") + "|"
              headerDone = true
            }
          } else {
            val cols = findall(pColTok, line)
            if (cols.length > 1) {
              out += "| " + cols.map(strip).mkString(" | ") + " |"
              if (!headerDone) {
                out += "|" + List.fill(cols.length)("---").mkString("|") + "|"
                headerDone = true
              }
            } else out += line
          }
        }
      }
      md ++= out
    } else formatRegularText(text, md)
  }

  /** _format_receipt_info (:273-317). */
  def formatReceiptInfo(s: InfoExtract.OrderedInfo, md: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    val f = s.fields.toMap
    f.get("merchant").foreach(v => md += s"**Merchant**: $v")
    f.get("date").foreach(v => md += s"**Date**: $v")
    f.get("time").foreach(v => md += s"**Time**: $v")
    md += ""
    if (s.items.nonEmpty) {
      md += "### Items"
      md += ""
      md += "| Item | Quantity | Price |"
      md += "| ---- | -------- | ----- |"
      for (ReceiptItem(name, qty, price) <- s.items)
        md += s"| $name | $qty | $price |"
      md += ""
    }
    md += "### Totals"
    md += ""
    f.get("subtotal").foreach(v => md += s"**Subtotal**: $v")
    f.get("tax").foreach(v => md += s"**Tax**: $v")
    f.get("total").foreach(v => md += s"**Total**: $v")
    f.get("payment_method").foreach(v => md += s"**Payment Method**: $v")
  }

  /** _format_key_value_info (:319-345). Iterates insertion order. */
  def formatKeyValueInfo(s: InfoExtract.OrderedInfo, md: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    md += "| Field | Value |"
    md += "| ----- | ----- |"
    val entries: Vector[(String, Either[String, AnyRef])] =
      if (s.kind == "table")
        Vector(
          "headers" -> Right(s.headers),
          "rows" -> Right(s.rows))
      else s.fields.map { case (k, v) => k -> Left(v) }
    for ((key, value) <- entries) {
      val displayKey = Py.title(key.replace('_', ' '))
      value match {
        case Left(v) => md += s"| $displayKey | $v |"
        case Right(headers: Vector[_]) if s.kind == "table" && key == "headers" =>
          if (headers.isEmpty)
            // Python: all(isinstance(item, dict) for item in []) is
            // vacuously True, so an EMPTY header list renders through
            // the list-of-dicts branch (markdown_formatter.py:335-338)
            md += s"| $displayKey | View 0 items\n\n```json\n[]\n```\n\n |"
          else
            md += s"| $displayKey | ${headers.mkString(", ")} |"
        case Right(rows) =>
          val rs = rows.asInstanceOf[Vector[Vector[(String, String)]]]
          val json = PyJson.dumpsListOfDicts(rs, 2)
          md += s"| $displayKey | View ${rs.length} items\n\n```json\n$json\n```\n\n |"
      }
    }
  }

  /** _escape_markdown (:347-353) — exact replacement order. */
  def escapeMarkdown(text: String): String = {
    var t = text
    for (c <- Seq("\\", "`", "*", "_", "{", "}", "[", "]", "(", ")", "#", "+", "-", ".", "!"))
      t = t.replace(c, "\\" + c)
    t
  }
}

/** Python `json.dumps(..., indent=2)` replica for the shapes the
  * renderer emits (list of string-valued dicts), ensure_ascii=True. */
object PyJson {
  def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def dumpsListOfDicts(rows: Vector[Vector[(String, String)]], indent: Int): String = {
    if (rows.isEmpty) return "[]"
    val pad1 = " " * indent
    val pad2 = " " * (indent * 2)
    rows.map { row =>
      if (row.isEmpty) pad1 + "{}"
      else row.map { case (k, v) => s"""$pad2"${escape(k)}": "${escape(v)}"""" }
        .mkString(pad1 + "{\n", ",\n", "\n" + pad1 + "}")
    }.mkString("[\n", ",\n", "\n]")
  }
}

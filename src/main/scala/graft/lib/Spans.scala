package graft.lib

import java.util.regex.Pattern
import graft.model.Span

/** TextRegion analog: line-level span segmentation with char offsets
  * (reference lib/model.py:79-87 TextRegion(x, y, w, h, text, confidence,
  * type) → our (start, end, kind) per SURVEY.md §1.1). The pixel bbox
  * becomes [start, end) code-unit offsets into the (BMP-filtered, so
  * code-unit == code-point) text; the region `type` becomes a line-kind
  * classification reusing the structure-detection predicates
  * (lib/text_processing.py:1218-1231 line-class regexes).
  *
  * The same rules exist in three forms that a spec cross-checks:
  * this Scala function (feeds ExtractionResult.spans), the relational
  * posexplode+window form (SparkEntry x10), and its DuckDB oracle.
  */
object Spans {

  private val pNumbered = Pattern.compile("^\\d+[.)]")
  private val pHeader = Pattern.compile("^[A-Z][A-Z\\s]+$")
  private val pFormField = Pattern.compile("^[\\w\\s]+:")

  /** Kind precedence: bullet > table_row > header > form_field > text —
    * mirrored exactly by the x10 CASE chain. */
  def lineKind(line: String): String = {
    if (line.nonEmpty &&
      ("•-*+".indexOf(line.charAt(0)) >= 0 || pNumbered.matcher(line).find()))
      "bullet"
    else if (line.indexOf('|') >= 0) "table_row"
    else if (pHeader.matcher(line).find()) "header"
    else if (pFormField.matcher(line).find()) "form_field"
    else "text"
  }

  /** One span per non-blank line; offsets count the newline separators.
    * `\n`-split with -1 limit matches the relational split(text,'\n',-1). */
  def lineSpans(text: String): Seq[Span] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Span]
    var start = 0
    for (line <- text.split("\n", -1)) {
      if (line.trim.nonEmpty) out += Span(start, start + line.length, lineKind(line))
      start += line.length + 1
    }
    out.result()
  }
}

package graft.lib

import java.util.regex.Pattern
import graft.model.Span

/** TextRegion analog: line-level span segmentation with char offsets
  * (reference lib/model.py:79-87 TextRegion(x, y, w, h, text, confidence,
  * type) → our (start, end, kind) per SURVEY.md §1.1). The pixel bbox
  * becomes [start, end) CODE-POINT offsets into the text — the engine
  * convention (Py.len, n_chars, Spark length()), NOT UTF-16 code units:
  * astral chars can reach formatted_text (payloads <=10 code points skip
  * the BMP filter), and code-unit offsets there would drift from the
  * relational x10 query and from every other offset in the engine — the
  * exact bug class fixed in the space-delimited table extractor
  * (ADVICE r02, blast find). The region `type` becomes a line-kind
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

  /** One span per non-blank line; offsets are CODE POINTS and count the
    * newline separators. `\n`-split with -1 limit matches the relational
    * split(text,'\n',-1); "blank" = all-spaces, matching Spark/DuckDB
    * trim(line)='' (space-only trim) — Java's String.trim also strips
    * tabs/CR and would disagree with x10/x12 on a tab-only line
    * (ADVICE r02). */
  def lineSpans(text: String): Seq[Span] = {
    if (text == null || text.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Span]
    var start = 0
    for (line <- text.split("\n", -1)) {
      val cps = line.codePointCount(0, line.length)
      if (line.exists(_ != ' ')) out += Span(start, start + cps, lineKind(line))
      start += cps + 1
    }
    out.result()
  }
}

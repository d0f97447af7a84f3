package graft

import graft.lib._
import graft.model._

/** Per-turn extraction — the reference's live request path re-expressed
  * as one pure function (reference order: lib/smartglass_ocr.py:586-653
  * [_process_image steps 9-12], :1212-1246 [process_file enrichment],
  * app/api/routes.py:976-981 [final projection]).
  *
  * The OCR half of the reference is non-deterministic native code; in
  * the transcript pipeline the payload IS the text, decoded with
  * confidence 100 by the "transcript" engine, so the status ladder
  * (confidence<30 → poor_quality, <60 → partial_success,
  * smartglass_ocr.py:621-625) reduces to the length gate.
  */
object Extractor extends Serializable {

  val SummaryLength = 200 // app/config.py:24 DEFAULT_SUMMARY_LENGTH
  val SummaryStyle = "concise" // app/config.py:25 DEFAULT_SUMMARY_STYLE
  val Confidence = 100.0
  val Engine = "transcript"

  def extract(turn: Turn): ExtractionResult = {
    val raw = if (turn.text == null) "" else turn.text
    val kind = PayloadKind.fromTool(turn.tool)

    // Step 9 (smartglass_ocr.py:586-600): correction gate len>10.
    // detect_language is called here in the reference but its result is
    // only compared against 'ind' (never returned) — dead branch.
    val corrected =
      if (Py.len(raw) > 10) TextCorrections.postProcessText(raw, kind)
      else raw

    // Step 10 (:602-604): format (no positional layout info for text payloads).
    val (formatted, structureOfInput) = Formatters.formatTextWithStructure(corrected)

    // Step 11 (:606-614)
    val lang = Language.detectLanguage(formatted)
    val structured: Option[InfoExtract.OrderedInfo] =
      if (formatted.nonEmpty) InfoExtract.extractOrdered(formatted, kind) else None

    // Status (:620-625)
    val status =
      if (Confidence < 30 || Py.len(Py.strip(formatted)) < 5) "poor_quality"
      else if (Confidence < 60) "partial_success"
      else "success"

    // Enrichment (smartglass_ocr.py:1212-1230)
    var summary = ""
    var structure: String = null
    var insights: Seq[String] = null
    if ((status == "success" || status == "partial_success") && formatted.nonEmpty) {
      summary = Summarizer.generateSummary(formatted, SummaryLength, SummaryStyle)
      // The reference re-detects on the FORMATTED text (smartglass_ocr.py
      // :1223); when formatting was the identity (common for plain short
      // payloads) the detection from inside formatText is the same value —
      // reuse it and skip the second full regex scan of the turn.
      structure =
        if (formatted == corrected) structureOfInput
        else Formatters.detectDocumentStructure(formatted)
      if (Py.len(formatted) > 200)
        insights = Summarizer.extractKeyInsights(formatted)
    }

    // Final projection (routes.py:976-981): clean text/summary/insights.
    val textClean = TextCorrections.cleanResponseText(formatted)
    val summaryClean = TextCorrections.cleanResponseText(summary)
    val insightsClean =
      if (insights == null) null else insights.map(TextCorrections.cleanResponseText)

    // Python-whitespace split for consistency with the engine's string
    // semantics everywhere else (str.split() == pySplitWs; "" → 0 tokens).
    val tokens = Py.pySplitWs(textClean).length

    // Markdown artifact (markdown_formatter.py:15-177) — rendered from the
    // PRE-clean values, as the reference writes the .md file before the
    // API response projection (smartglass_ocr.py:1248 vs routes.py:976).
    val markdown = graft.lib.Markdown.render(
      filename = s"${turn.conv_id}_${turn.turn_idx}",
      ts = turn.ts,
      status = status,
      formattedText = formatted,
      confidence = Confidence,
      detectedLanguage = lang,
      payloadKind = kind,
      summaryRaw = summary,
      insightsRaw = insights,
      documentStructure = structure,
      structured = structured)

    ExtractionResult(
      conv_id = turn.conv_id,
      turn_idx = turn.turn_idx,
      role = turn.role,
      tool = turn.tool,
      ts = turn.ts,
      payload_kind = kind,
      // tool drives dispatch; the feature-scored classification is carried
      // for metrics (SURVEY §2.3 image-type argmax, the transcript analog
      // of classifying the image before processing)
      payload_kind_scored = graft.lib.Classify.classifyPayloadKind(raw)._1,
      processing_strategy = graft.lib.Classify.processingStrategy(kind),
      status = status,
      text = textClean,
      formatted_text = formatted,
      confidence = Confidence,
      detected_language = lang,
      document_structure = structure,
      summary = summaryClean,
      key_insights = insightsClean,
      structured_kind = structured.map(_.kind).orNull,
      structured_fields = structured.map(_.fields.toMap).orNull,
      structured_items = structured.map(_.items).orNull,
      structured_headers = structured.map(_.headers).orNull,
      structured_rows = structured.map(_.rows.map(_.toMap)).orNull,
      confidence_level = confidenceLevel(Confidence),
      markdown = markdown,
      spans = graft.lib.Spans.lineSpans(formatted),
      n_chars = Py.len(textClean),
      n_tokens = tokens)
  }

  /** Poison-turn guard for the job path: at 10^12 turns one pathological
    * payload must not fail the task (and, after retries, the job). The
    * reference catches per-request exceptions and returns
    * {"status": "error", "message": ...} (app/api/routes.py:311-329,
    * lib/smartglass_ocr.py:655-661) — this is the per-turn analog: the
    * error row carries the diagnostic in structured_fields and flows to
    * the same sink/metrics, so failures are visible, counted, and
    * re-processable via the resume anti-join after a fix. */
  def extractSafe(turn: Turn): ExtractionResult = extractSafeWith(extract)(turn)

  private[graft] def extractSafeWith(f: Turn => ExtractionResult)(turn: Turn): ExtractionResult =
    try f(turn)
    catch {
      case scala.util.control.NonFatal(e) =>
        val kind = PayloadKind.fromTool(turn.tool)
        ExtractionResult(
          conv_id = turn.conv_id, turn_idx = turn.turn_idx, role = turn.role,
          tool = turn.tool, ts = turn.ts,
          payload_kind = kind,
          payload_kind_scored = PayloadKind.Mixed,
          processing_strategy = graft.lib.Classify.processingStrategy(kind),
          status = "error", // smartglass_ocr.py:658 error-result status
          text = "", formatted_text = "", confidence = 0.0,
          detected_language = "unknown", document_structure = null,
          summary = "", key_insights = null,
          structured_kind = null,
          structured_fields = Map(
            "error" -> s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}"),
          structured_items = null, structured_headers = null, structured_rows = null,
          confidence_level = confidenceLevel(0.0),
          markdown = "", spans = Seq.empty, n_chars = 0, n_tokens = 0)
    }

  /** information_extraction.py:621-642. */
  def confidenceLevel(confidence: Double): String =
    if (confidence >= 90) "Very High"
    else if (confidence >= 75) "High"
    else if (confidence >= 60) "Good"
    else if (confidence >= 40) "Moderate"
    else if (confidence >= 20) "Low"
    else "Very Low"

  /** Flat golden-comparable view: structured info flattened to
    * map<string,string> with items/headers/rows in a deterministic
    * encoding shared with the golden generator (FIXTURES.md §3). */
  def flattenStructured(o: InfoExtract.OrderedInfo): Map[String, String] = {
    if (o == null) return null
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for ((k, v) <- o.fields) m(k) = v
    if (o.kind == "receipt")
      m("items") = o.items.map(i => s"${i.name}\u0001${i.quantity}\u0001${i.price}").mkString("\u0002")
    if (o.kind == "table") {
      m("headers") = o.headers.mkString("\u0001")
      m("rows") = o.rows.map(r => r.map { case (k, v) => s"$k\u0003$v" }.mkString("\u0001")).mkString("\u0002")
    }
    m.toMap
  }
}

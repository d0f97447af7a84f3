package graft

import scala.io.Source
import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.lib._
import graft.model.PayloadKind

/** Function-level parity against reference functions executed directly
  * (tools/gen_goldens.py build_unit_goldens) — covers codepaths the
  * live pipeline can't reach: pipe/tab table extraction, per-type
  * fixers on raw noisy text, all summary styles, the Indonesian fixer.
  */
class UnitGoldenSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val lines: Vector[JsonNode] = {
    val in = getClass.getResourceAsStream("/unit_goldens.jsonl")
    require(in != null, "missing unit_goldens.jsonl")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(mapper.readTree).toVector
    finally src.close()
  }
  private val inputs: Map[String, String] = {
    val n = lines.head.get("inputs")
    val it = n.properties().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      if (!e.getValue.isNull) b += (e.getKey -> e.getValue.asText())
    }
    b.result()
  }
  private val cases = lines.tail

  private def strOut(c: JsonNode): String =
    if (c.get("out").isNull) null else c.get("out").asText()

  private def mapOut(c: JsonNode): Map[String, String] = {
    val o = c.get("out")
    if (o == null || o.isNull) null
    else {
      val it = o.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText()) }
      b.result()
    }
  }

  private def listOut(c: JsonNode): Seq[String] = {
    val o = c.get("out")
    if (o == null || o.isNull) null
    else (0 until o.size()).map(o.get(_).asText())
  }

  private def runString(fn: String, text: String, arg: String): String = fn match {
    case "post_process_text" => TextCorrections.postProcessText(text, PayloadKind.fromTool(arg))
    case "format_text" => Formatters.formatText(text)
    case "detect_document_structure" => Formatters.detectDocumentStructure(text)
    case "detect_language" => Language.detectLanguage(text)
    case "clean_response_text" => TextCorrections.cleanResponseText(text)
    case "fix_receipt" => TextCorrections.fixReceiptText(text)
    case "fix_id_card" => TextCorrections.fixIdCardText(text)
    case "fix_form" => TextCorrections.fixFormText(text)
    case "fix_table" => TextCorrections.fixTableText(text)
    case "fix_indonesian" => TextCorrections.fixIndonesianText(text)
    case "generate_summary" =>
      val Array(style, ml) = arg.split(":")
      Summarizer.generateSummary(text, ml.toInt, style)
    case "organize_doc" => Organizers.organizeDocumentText(text)
    case "organize_form" => Organizers.organizeFormText(text)
    case "organize_receipt" => Organizers.organizeReceiptText(text)
    case "organize_idcard" => Organizers.organizeIdCardText(text)
    case "organize_table" | "organize_table2" => Organizers.organizeTableText(text)
    case "organize_default" => Organizers.defaultTextOrganization(text)
    case "clean_text_util" => ExtraCorrections.cleanText(text)
    case "general_corrections" => ExtraCorrections.applyGeneralTextCorrections(text)
    case "merge_variants" =>
      val Array(v1, v2) = text.split("@@@")
      Classify.mergeTextVariants(Seq(v1, v2))
    case other => sys.error(s"unknown string fn $other")
  }

  test("unit goldens: every reference function matches byte-for-byte") {
    var n = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (c <- cases) {
      val fn = c.get("fn").asText()
      val key = c.get("input_key").asText()
      val arg = if (c.get("arg").isNull) null else c.get("arg").asText()
      val text = inputs(key)
      fn match {
        case "analyze_signage" =>
          val (ct, desc) = Classify.analyzeSignageContent(text)
          val want = listOut(c)
          if (Seq(ct, desc) != want)
            failures += s"$fn($key): got ($ct, $desc) want $want"
        case "extract_key_insights" =>
          val got = Summarizer.extractKeyInsights(text)
          val want = listOut(c)
          if (got != want) failures += s"$fn($key): got $got want $want"
        case "extract_table_info" | "extract_receipt_info" | "extract_id_card_info" | "extract_form_info" =>
          val kind = fn match {
            case "extract_table_info" => "table"
            case "extract_receipt_info" => "receipt"
            case "extract_id_card_info" => "id_card"
            case _ => "form"
          }
          val got = InfoExtract.extractOrdered(text, kind).map(Extractor.flattenStructured).orNull
          val want = mapOut(c)
          if (got != want) failures += s"$fn($key):\n  got  $got\n  want $want"
        case _ =>
          val got = runString(fn, text, arg)
          val want = strOut(c)
          if (got != want)
            failures += s"$fn($key, $arg):\n  got  ${render(got)}\n  want ${render(want)}"
      }
      n += 1
    }
    info(s"checked $n unit cases, ${failures.length} failures")
    if (failures.nonEmpty)
      fail(s"${failures.length} failures of $n:\n" + failures.take(10).mkString("\n---\n"))
  }

  private def render(s: String): String =
    if (s == null) "<null>"
    else "\"" + s.flatMap {
      case '\n' => "\\n"; case '\t' => "\\t"
      case c if c < ' ' => f"\\x${c.toInt}%02x"
      case c => c.toString
    } + "\""
}

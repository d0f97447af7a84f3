package graft.tools
import java.sql.Timestamp
import graft._
import graft.lib._
import graft.model._
object StageProf {
  def main(args: Array[String]): Unit = {
    val texts = (0 until 2000).map { i =>
      (0 until 40).map(j => s"word${(i * 7 + j) % 50} data value").mkString(" ") +
        "\nsecond line here\n\nnew paragraph with more text block."
    }.toArray
    def bench(name: String)(f: String => Any): Unit = {
      // warmup
      texts.take(500).foreach(f)
      val t0 = System.nanoTime()
      var k = 0
      while (k < 3) { texts.foreach(f); k += 1 }
      val us = (System.nanoTime() - t0) / 1000.0 / (3 * texts.length)
      println(f"$name%-22s ${us}%8.1f us/turn")
    }
    bench("postProcess")(t => TextCorrections.postProcessText(t, "document"))
    val pp = texts.map(t => TextCorrections.postProcessText(t, "document"))
    bench("formatText")(t => Formatters.formatText(t))
    val fm = pp.map(Formatters.formatText)
    bench("detectLanguage")(t => Language.detectLanguage(t))
    bench("structured")(t => InfoExtract.extractOrdered(t, "document"))
    bench("summary")(t => graft.lib.Summarizer.generateSummary(t, 200, "concise"))
    bench("insights")(t => graft.lib.Summarizer.extractKeyInsights(t))
    bench("structureDetect")(t => Formatters.detectDocumentStructure(t))
    bench("cleanResponse")(t => TextCorrections.cleanResponseText(t))
    bench("spans")(t => Spans.lineSpans(t))
    bench("classifyKind")(t => Classify.classifyPayloadKind(t))
    bench("markdown")(t => Markdown.render(
      filename = "c_0", ts = new Timestamp(0), status = "success",
      formattedText = t, confidence = 100.0, detectedLanguage = "en",
      payloadKind = "document", summaryRaw = "s", insightsRaw = null,
      documentStructure = "mixed", structured = None))
    val turn0 = Turn("c", 0, "u", texts(0), "document", new Timestamp(0))
    bench("FULL extract")(t => Extractor.extract(turn0.copy(text = t)))
  }
}

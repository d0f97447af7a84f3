package graft.tools

import java.sql.Timestamp
import scala.io.Source
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.Extractor
import graft.model.Turn

/** One-off large-corpus parity checker: compare Extractor.extract
  * against reference-generated goldens from JSONL files given as args
  * (the committed GoldenParitySpec covers the fixed corpus; this tool
  * lets a run sweep arbitrarily larger adversarial corpora). */
object ParityBlast {
  def main(args: Array[String]): Unit = {
    val Array(corpusPath, goldensPath) = args.take(2)
    val mapper = new ObjectMapper()
    def load(p: String): Vector[JsonNode] = {
      val src = Source.fromFile(p, "UTF-8")
      try src.getLines().map(mapper.readTree).toVector finally src.close()
    }
    def opt(n: JsonNode, f: String): String = {
      val v = n.get(f); if (v == null || v.isNull) null else v.asText()
    }
    val goldens = load(goldensPath)
      .map(n => ((n.get("conv_id").asText(), n.get("turn_idx").asInt()), n)).toMap
    var checked = 0
    var failed = 0
    for (n <- load(corpusPath)) {
      val turn = Turn(n.get("conv_id").asText(), n.get("turn_idx").asInt(),
        n.get("role").asText(), opt(n, "text"), n.get("tool").asText(),
        new Timestamp(n.get("ts").asLong()))
      val g = goldens((turn.conv_id, turn.turn_idx))
      val r = Extractor.extract(turn)
      val ok = r.text == opt(g, "text") && r.formatted_text == opt(g, "formatted") &&
        r.detected_language == opt(g, "lang") && r.document_structure == opt(g, "structure") &&
        r.summary == opt(g, "summary") && r.status == opt(g, "status") &&
        r.markdown == opt(g, "markdown")
      if (!ok) {
        failed += 1
        if (failed <= 4) {
          println(s"FAIL ${turn.conv_id}/${turn.turn_idx} [${turn.tool}]")
          def firstDiff(a: String, b: String, label: String): Unit = {
            if (a == null || b == null) { println(s"  $label null-mismatch"); return }
            if (a == b) return
            var i = 0
            while (i < math.min(a.length, b.length) && a.charAt(i) == b.charAt(i)) i += 1
            def rep(s: String) = s.slice(math.max(0, i - 30), i + 30)
              .flatMap(c => if (c < ' ') f"\\x${c.toInt}%02x" else c.toString)
            println(s"  $label diff@${i}: got[${rep(a)}] exp[${rep(b)}]")
          }
          firstDiff(r.formatted_text, opt(g, "formatted"), "formatted")
          firstDiff(r.markdown, opt(g, "markdown"), "markdown")
          firstDiff(r.summary, opt(g, "summary"), "summary")
        }
      }
      checked += 1
    }
    println(s"PARITY BLAST: checked=$checked failed=$failed")
    if (failed > 0) sys.exit(1)
  }
}

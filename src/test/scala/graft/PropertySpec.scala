package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.lib.{Formatters, Py, TextCorrections}
import graft.model.Turn

/** Property tests (SURVEY.md §5.2.3): totality of the pipeline on
  * arbitrary input, idempotence where the reference is idempotent, and
  * the post-format charset invariant. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling from a Gen (seeded, no scalatestplus bridge). */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => gen.apply(params, Seed(42L + i)))
  }

  private val tools = Gen.oneOf("plain", "document", "receipt", "id_card",
    "form", "table", "signage", "scientific", "multi_column", "html", "book_page")

  // Mixed generator: ASCII-ish lines + separators + nasty unicode
  private val nastyChars = Gen.oneOf(
    '\u0000', '\t', '\n', '\r', '\u00a0', '\u2028', '\u2029', '•', '‣', '▪',
    '|', ':', '$', '\\', '`', '"', '\'', '☑', '€', 'é', 'Ω', '中')
  private val astral = Gen.oneOf("😀", "🎉", "𝔸", "🚀")
  private val token = Gen.frequency(
    (8, Gen.alphaNumStr.map(_.take(12))),
    (2, Gen.listOfN(3, nastyChars).map(_.mkString)),
    (1, astral),
    (1, Gen.oneOf("TOTAL", "NIK", "12.50", "1/2/95", "First Name", "[x]", "E = mc^2")))
  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency((6, token), (2, Gen.const(" ")), (2, Gen.const("\n"))))
      .map(_.mkString).map(_.take(2000))

  test("extract is total on arbitrary unicode input (never throws)") {
    val toolList = samples(tools, 300)
    for ((text, tool) <- samples(textGen, 300).zip(toolList)) {
      val r = Extractor.extract(Turn("c", 0, "user", text, tool, new Timestamp(0L)))
      assert(r.text != null && r.status != null && r.markdown != null)
    }
  }

  test("extract is total on null/empty/whitespace") {
    for (t <- Seq(null, "", " ", "\n\n", " ", "\t\r\n"); tool <- Seq("plain", "table", null)) {
      val r = Extractor.extract(Turn("c", 0, "user", t, tool, new Timestamp(0L)))
      assert(r.status == "poor_quality")
    }
  }

  test("clean_response_text converges after two applications") {
    // NOT idempotent in one pass (matching the reference): removing
    // backslashes can merge whitespace runs ("x\ \ y" → "x  y") —
    // routes.py re-cleans in the task_status path relying on this.
    // After one pass no backslashes remain, so pass 2 is a fixed point.
    for (text <- samples(textGen, 200)) {
      val twice = TextCorrections.cleanResponseText(TextCorrections.cleanResponseText(text))
      assert(TextCorrections.cleanResponseText(twice) == twice)
    }
  }

  test("format_text output matches the charset whitelist (text_processing.py:1208)") {
    val allowed = Py.compile("[\\w\\s.!?,;:()\"'•\\-\\n]")
    for (text <- samples(textGen, 200)) {
      val out = Formatters.formatText(text)
      val bad = out.codePoints().toArray.filterNot { cp =>
        allowed.matcher(new String(Character.toChars(cp))).matches()
      }
      assert(bad.isEmpty, s"disallowed chars ${bad.map(Integer.toHexString).mkString(",")} in ${out.take(80)}")
    }
  }

  test("replaceWordLiteral ≡ the generic \\bWORD\\b regex on fuzz input") {
    val words = Seq("TOTAI", "NO.", "THANI< YOU", "CASI-I", "tbe", "KAB\\.", "NIK")
    for (text <- samples(textGen, 200); w <- words) {
      val fast = Py.replaceWordLiteral(text, w, "XX", ignoreCase = false)
      val p = Py.compile("\\b" + java.util.regex.Pattern.quote(w) + "\\b")
      val slow = Py.subLit(p, "XX", text)
      assert(fast == slow, s"scanner != regex for word '$w' on ${text.take(60)}")
      val fastI = Py.replaceWordLiteral(text, w, "XX", ignoreCase = true)
      val pI = Py.compile("\\b" + java.util.regex.Pattern.quote(w) + "\\b", Py.I)
      assert(fastI == Py.subLit(pI, "XX", text), s"icase scanner != regex for '$w'")
    }
  }

  test("extraction result is invariant under input order (pure per-row)") {
    for (texts <- samples(Gen.listOfN(10, textGen), 20)) {
      val turns = texts.zipWithIndex.map { case (t, i) =>
        Turn("c", i, "user", t, "document", new Timestamp(0L))
      }
      val a = turns.map(Extractor.extract)
      val b = turns.reverse.map(Extractor.extract).reverse
      assert(a.map(_.text) == b.map(_.text))
    }
  }

  test("regexCiFold == Java regex CI|UNICODE_CASE literal matching, exhaustively") {
    // Soundness pin for the insight-pattern gates (Summarizer): a gate
    // may skip the CI regex only if NO input codepoint can match the
    // ASCII stem letters. Java's case-insensitive literal nodes test
    // toLowerCase(toUpperCase(c)) equality — assert our fold agrees
    // with the real matcher over the whole BMP and the case-mapped
    // astral blocks, both directions, for every ASCII letter.
    import java.util.regex.Pattern
    val pats = ('a' to 'z').map(c =>
      c -> Pattern.compile(c.toString,
        Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)).toArray
    val ranges = Seq((0x0, 0xD7FF), (0xE000, 0xFFFF), (0x10000, 0x110FF),
      (0x16E40, 0x16E7F), (0x1E900, 0x1E9FF))
    var checked = 0L
    for ((lo, hi) <- ranges; cp <- lo to hi) {
      val s = new String(Character.toChars(cp))
      val fold = Py.regexCiFold(cp)
      var k = 0
      while (k < pats.length) {
        val (p, pat) = pats(k)
        val m = pat.matcher(s).matches()
        val foldEq = fold == p.toInt
        assert(m == foldEq,
          f"cp=U+$cp%04X vs '$p': regex=$m foldEq=$foldEq")
        k += 1
        checked += 1
      }
    }
    assert(checked > 1700000L)
  }
}

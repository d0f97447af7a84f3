package graft.lib

import Py._

/** Payload classification probes + multi-variant merge [STR]
  * (SURVEY.md §2.3, §2.6, §2.7).
  *
  * The reference classifies images with pixel features + quick-OCR
  * keyword probes; for text payloads the pixel half collapses and the
  * keyword probes apply verbatim:
  *  - ID-card probe: ≥2 of 8 Indonesian ID keywords
  *    (lib/smartglass_ocr.py:895-901)
  *  - receipt probe: ≥2 of 21 receipt keywords (app/api/routes.py:466-474)
  *  - signage content classifier: keyword buckets → (type, description)
  *    (app/core/ocr_processor.py:273-343)
  *  - multi-variant merge: order-preserving dedup → stable length-desc
  *    sort → substring-containment merge (lib/ocr_engines.py:800-846)
  */
object Classify {

  // public: the DuckDB oracle SQL for the probe/classifier queries is
  // generated from these same literals (SparkEntry), so the two sides
  // cannot drift.
  val idKeywords = Vector(
    "nik", "ktp", "provinsi", "kabupaten", "kecamatan",
    "agama", "status perkawinan", "kewarganegaraan")

  /** keyword-count >= n with early exit (same value as count(..) >= n,
    * which the generated oracle SQL mirrors as a full CASE sum). */
  private def hasAtLeast(tl: String, words: Vector[String], n: Int): Boolean = {
    var c = 0
    var i = 0
    while (i < words.length && c < n) {
      if (tl.contains(words(i))) c += 1
      i += 1
    }
    c >= n
  }

  /** smartglass_ocr.py:895-901 — the text half of _check_if_id_card. */
  def idCardProbe(text: String): Boolean =
    text != null && hasAtLeast(lower(text), idKeywords, 2)

  val receiptKeywords = Vector(
    "total", "subtotal", "cash", "change", "tax", "amount",
    "item", "qty", "price", "payment", "receipt", "invoice",
    "jumlah", "tunai", "kembalian", "pajak", "harga", "kasir",
    "pembayaran", "diskon", "tanggal", "waktu")

  /** routes.py:466-474 — the text half of the receipt probe. */
  def receiptProbe(text: String): Boolean =
    text != null && hasAtLeast(lower(text), receiptKeywords, 2)

  val promoWords = Vector("beli", "diskon", "gratis", "promo", "sale",
    "discount", "free", "special", "offer", "limited", "new", "buy")
  val foodWords = Vector("menu", "restoran", "restaurant", "makanan",
    "food", "makan", "cafe", "kafe", "kebab", "pizza", "burger")
  val retailWords = Vector("toko", "store", "shop", "mall", "retail",
    "belanja", "shopping")
  val propertyWords = Vector("jual", "sewa", "dijual", "disewakan",
    "rent", "sale", "property", "rumah", "apartemen", "tanah", "house",
    "apartment", "land", "estate")
  val govWords = Vector("kantor", "pemerintah", "dinas", "kementerian",
    "departemen", "ministry", "office", "government", "official", "agency", "badan")
  val religiousWords = Vector("masjid", "mosque", "gereja", "church",
    "temple", "kuil", "agama", "religion", "allah", "tuhan", "god",
    "muhammad", "jesus")
  val celebrationWords = Vector("selamat", "congratulations",
    "peringatan", "commemoration", "acara", "event", "festival",
    "celebration", "memperingati")
  val directionalWords = Vector("arah", "direction", "jalan", "road",
    "belok", "turn", "km", "meter", "parkir", "parking", "masuk", "enter",
    "keluar", "exit")
  val warningWords = Vector("awas", "warning", "bahaya", "danger",
    "hati-hati", "caution", "peringatan", "larangan", "dilarang",
    "prohibited", "stop")

  /** _analyze_signage_content (ocr_processor.py:273-343). */
  def analyzeSignageContent(text: String): (String, String) = {
    if (text == null || text.isEmpty)
      return ("unknown", "Could not determine the content of this sign.")
    val tl = lower(text)
    def any(ws: Vector[String]) = ws.exists(tl.contains)
    if (any(promoWords)) {
      if (any(foodWords))
        return ("restaurant_promotion",
          "This is a promotional sign for a restaurant or food establishment offering special deals.")
      if (any(retailWords))
        return ("retail_promotion",
          "This is a retail promotion sign advertising sales or special offers.")
      return ("promotion",
        "This appears to be a promotional sign or banner advertising a special offer or deal.")
    }
    if (any(propertyWords))
      return ("property", "This is a property sign that appears to be advertising rental or sale information.")
    if (any(govWords))
      return ("government", "This is an official sign from a government office or agency.")
    if (any(religiousWords))
      return ("religious", "This appears to be a religious sign or announcement.")
    if (any(celebrationWords))
      return ("celebration", "This is a celebration or commemorative banner for a special event or occasion.")
    if (any(directionalWords))
      return ("directional", "This is a directional or navigation sign.")
    if (any(warningWords))
      return ("warning", "This is a warning or safety sign alerting of potential hazards or prohibitions.")
    val lines = splitLines(text)
    if (lines.length >= 2) {
      val mainText = lines(0)
      ("general", s"""This sign contains the main text "$mainText" followed by additional information.""")
    } else ("general", "This appears to be a general informational sign or banner.")
  }

  /** _merge_ocr_results (ocr_engines.py:800-846): merge text variants —
    * order-preserving dedup on lower(line).replace(" ",""), stable sort
    * by length desc, then substring-containment merge keeping the longer
    * line. The theta-join analog (SURVEY.md §2.7). */
  def mergeTextVariants(variants: Seq[String]): String = {
    if (variants == null || variants.isEmpty) return ""
    val allLines = variants.iterator.filter(v => v != null && v.nonEmpty)
      .flatMap(v => splitLines(v).iterator.map(strip).filter(_.nonEmpty))
      .toVector
    if (allLines.isEmpty) return ""
    val seen = scala.collection.mutable.HashSet.empty[String]
    val unique = scala.collection.mutable.ArrayBuffer.empty[String]
    for (line <- allLines) {
      val normalized = lower(line).replace(" ", "")
      if (!seen.contains(normalized)) { seen += normalized; unique += line }
    }
    // Python list.sort is stable; ties keep first-seen order.
    val sorted = unique.sortBy(l => -len(l))
    val merged = scala.collection.mutable.ArrayBuffer.empty[String]
    for (line <- sorted) {
      var isSubstring = false
      var i = 0
      while (i < merged.length && !isSubstring) {
        val m = merged(i)
        if (lower(m).contains(lower(line)) || lower(line).contains(lower(m))) {
          if (len(line) > len(m)) merged(i) = line
          isSubstring = true
        }
        i += 1
      }
      if (!isSubstring) merged += line
    }
    merged.mkString("\n")
  }

  /** ImageType → ProcessingStrategy dispatch (SURVEY §2.3; reference
    * lib/image_processing.py:1705-1752, enum lib/model.py:48-63). In
    * the transcript engine the strategy steers the decode stage's
    * effort level; kept as a broadcastable pure map. */
  def processingStrategy(kind: String): String = kind match {
    case "document" => "document"
    case "natural" => "natural"
    case "receipt" => "receipt"
    case "id_card" => "id_card"
    case "handwritten" => "handwritten"
    case "book_page" => "book"
    case "table" => "table"
    case "scientific" => "scientific"
    case "form" => "form"
    case "newspaper" => "multi_column"
    case "signage" => "signage"
    case "low_quality" => "aggressive"
    case "high_contrast" => "minimal"
    case _ => "standard"
  }

  /** Text-payload feature stats — the transcript analog of ImageStats
    * (reference lib/model.py:30-45; feature extraction
    * lib/image_processing.py:30-101 mapped to char-class densities and
    * line statistics per SURVEY.md §2.3). Weights for the likelihood
    * scores mirror the reference's .3/.4/.3 blends
    * (image_processing.py:626-778). */
  final case class PayloadStats(
      n_lines: Int,
      n_chars: Int,
      avg_line_len: Double,
      digit_density: Double,
      upper_density: Double,
      punct_density: Double,
      table_likelihood: Double,
      form_likelihood: Double,
      n_short_lines: Int,
      n_formula_hits: Int)

  def payloadStats(text: String): PayloadStats = {
    if (text == null || text.isEmpty)
      return PayloadStats(0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0, 0)
    val lines = splitLines(text).map(strip).filter(_.nonEmpty)
    val n = len(text)
    var digits = 0; var uppers = 0; var puncts = 0
    text.foreach { c =>
      if (Character.isDigit(c)) digits += 1
      else if (Character.isUpperCase(c)) uppers += 1
      else if (!Character.isLetterOrDigit(c) && !isSpaceCp(c.toInt)) puncts += 1
    }
    val nl = math.max(lines.length, 1)
    val avgLen = if (lines.isEmpty) 0.0 else lines.map(_.length).sum.toDouble / lines.length
    // table likelihood: delimiter rows (.3) + aligned-gap rows (.4) + row balance (.3)
    val delimRows = lines.count(l => l.contains('|') || l.contains('\t'))
    val gapRows = lines.count(l => search(pGap2, l).isDefined)
    val lenVar =
      if (lines.length < 2) 1.0
      else {
        val mean = avgLen
        val sd = math.sqrt(lines.map(l => (l.length - mean) * (l.length - mean)).sum / lines.length)
        if (mean == 0) 1.0 else math.min(sd / mean, 1.0)
      }
    val tableL = 0.3 * (delimRows.toDouble / nl) + 0.4 * (gapRows.toDouble / nl) +
      0.3 * (1.0 - lenVar)
    // form likelihood: colon-line density (.4) + label-ish starts (.3) + short lines (.3)
    val colonRows = lines.count(l => search(pColonLine, l).isDefined)
    val shortRows = lines.count(l => l.length < 40)
    val labelRows = lines.count(l => rmatch(pLabelStart, l).isDefined)
    val formL = 0.4 * (colonRows.toDouble / nl) + 0.3 * (labelRows.toDouble / nl) +
      0.3 * (shortRows.toDouble / nl)
    PayloadStats(lines.length, n, avgLen,
      digits.toDouble / n, uppers.toDouble / n, puncts.toDouble / n,
      math.min(tableL, 1.0), math.min(formL, 1.0),
      shortRows, Formatters.countFormulaHits(text))
  }

  private val pGap2 = compile("\\S\\s{2,}\\S")
  private val pColonLine = compile("^[\\w\\s]+:")
  private val pLabelStart = compile("^[A-Z][A-Za-z\\s]{1,24}[:\\s]")

  /** Payload-kind types the scored classifier can emit, in the same
    * insertion order the reference builds its score dict
    * (lib/image_processing.py:788-937) restricted to the types that have
    * a text analog; "document" is the only non-specific type, matching
    * the reference's specific_types tie-break list (:950-955). */
  val ScoredKinds: Vector[String] = Vector(
    "signage", "id_card", "receipt", "document", "form",
    "scientific", "newspaper", "table")

  /** Image-type argmax classifier, text-payload analog [STR]
    * (reference lib/image_processing.py:780-969: per-type score dict →
    * overrides signage>60 / table>70 → stable-desc argmax → close-score
    * tie-break preferring specific types → <50 ⇒ MIXED). Pixel features
    * (blur, brightness, aspect) have no text analog; each score keeps
    * the reference's structure (base score + conditional bonuses) over
    * the PayloadStats text features. Returns (kind, winning score).
    *
    * All arithmetic is mirrored 1:1 by the generated DuckDB oracle SQL
    * (SparkEntry x09) — keep formula order identical on both sides. */
  def classifyPayloadKind(text: String): (String, Double) = {
    val st = payloadStats(text)
    val tl = if (text == null) "" else lower(text) // one lowercase pass for both probes
    val idp = hasAtLeast(tl, idKeywords, 2)
    val rcp = hasAtLeast(tl, receiptKeywords, 2)
    val tableScore = st.table_likelihood * 100.0 // ref :937 scores[TABLE]=table_likelihood
    val formScore = st.form_likelihood * 100.0 // ref :888 scores[FORM]=form_likelihood
    // signage (:796-827): accumulated feature bonuses
    var signageScore = 0.0
    if (st.n_lines >= 1 && st.n_lines <= 10) signageScore += 20 // few text regions
    if (st.upper_density > 0.3) signageScore += 30 // high contrast analog
    if (st.punct_density > 0.05) signageScore += 20 // color variance analog
    if (st.avg_line_len < 30 && st.n_lines <= 10) signageScore += 30 // banner aspect analog
    if (st.digit_density < 0.05) signageScore += 10 // brightness analog
    // id card (:831-838): probe + form-layout bonus
    val idScore =
      if (idp) 80.0 + (if (formScore > 50) 20.0 else 0.0) else 0.0
    // receipt (:841-846): probe + aligned-field bonus
    val receiptScore =
      if (rcp) 70.0 + (if (formScore > 30) 30.0 else 0.0) else 0.0
    // document (:849-857): long multi-line prose
    val documentScore =
      if (st.n_lines > 10 && st.avg_line_len > 40)
        60.0 + (if (st.n_lines > 20) 20.0 else 0.0)
      else 0.0
    // scientific (:901-909): formula hits + table bonus
    val scientificScore =
      if (st.n_formula_hits > 3) 60.0 + (if (tableScore > 40) 40.0 else 0.0) else 0.0
    // newspaper (:923-934): many short lines = multi-column analog
    val newspaperScore =
      if (st.n_lines > 10 && st.n_short_lines > st.n_lines * 0.6)
        50.0 + (if (st.n_lines > 30) 30.0 else 0.0)
      else 0.0
    val scores = Vector(
      "signage" -> signageScore, "id_card" -> idScore, "receipt" -> receiptScore,
      "document" -> documentScore, "form" -> formScore,
      "scientific" -> scientificScore, "newspaper" -> newspaperScore,
      "table" -> tableScore)
    // overrides (:939-944)
    if (signageScore > 60) return ("signage", signageScore)
    if (tableScore > 70) return ("table", tableScore)
    // stable desc sort = Python sorted(..., reverse=True) tie behavior
    val sorted = scores.sortBy(s => -s._2)
    var best = sorted(0)
    // close scores prefer the specific type (:947-961); "document" is the
    // only non-specific kind in ScoredKinds
    if (sorted(0)._2 - sorted(1)._2 < 10 && sorted(0)._1 == "document")
      best = sorted(1)
    if (best._2 < 50) ("mixed", best._2) else best
  }
}

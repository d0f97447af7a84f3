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

  private val idKeywords = Vector(
    "nik", "ktp", "provinsi", "kabupaten", "kecamatan",
    "agama", "status perkawinan", "kewarganegaraan")

  /** smartglass_ocr.py:895-901 — the text half of _check_if_id_card. */
  def idCardProbe(text: String): Boolean = {
    if (text == null) return false
    val tl = lower(text)
    idKeywords.count(tl.contains) >= 2
  }

  private val receiptKeywords = Vector(
    "total", "subtotal", "cash", "change", "tax", "amount",
    "item", "qty", "price", "payment", "receipt", "invoice",
    "jumlah", "tunai", "kembalian", "pajak", "harga", "kasir",
    "pembayaran", "diskon", "tanggal", "waktu")

  /** routes.py:466-474 — the text half of the receipt probe. */
  def receiptProbe(text: String): Boolean = {
    if (text == null) return false
    val tl = lower(text)
    receiptKeywords.count(tl.contains) >= 2
  }

  private val promoWords = Vector("beli", "diskon", "gratis", "promo", "sale",
    "discount", "free", "special", "offer", "limited", "new", "buy")
  private val foodWords = Vector("menu", "restoran", "restaurant", "makanan",
    "food", "makan", "cafe", "kafe", "kebab", "pizza", "burger")
  private val retailWords = Vector("toko", "store", "shop", "mall", "retail",
    "belanja", "shopping")
  private val propertyWords = Vector("jual", "sewa", "dijual", "disewakan",
    "rent", "sale", "property", "rumah", "apartemen", "tanah", "house",
    "apartment", "land", "estate")
  private val govWords = Vector("kantor", "pemerintah", "dinas", "kementerian",
    "departemen", "ministry", "office", "government", "official", "agency", "badan")
  private val religiousWords = Vector("masjid", "mosque", "gereja", "church",
    "temple", "kuil", "agama", "religion", "allah", "tuhan", "god",
    "muhammad", "jesus")
  private val celebrationWords = Vector("selamat", "congratulations",
    "peringatan", "commemoration", "acara", "event", "festival",
    "celebration", "memperingati")
  private val directionalWords = Vector("arah", "direction", "jalan", "road",
    "belok", "turn", "km", "meter", "parkir", "parking", "masuk", "enter",
    "keluar", "exit")
  private val warningWords = Vector("awas", "warning", "bahaya", "danger",
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
      form_likelihood: Double)

  def payloadStats(text: String): PayloadStats = {
    if (text == null || text.isEmpty)
      return PayloadStats(0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
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
      math.min(tableL, 1.0), math.min(formL, 1.0))
  }

  private val pGap2 = compile("\\S\\s{2,}\\S")
  private val pColonLine = compile("^[\\w\\s]+:")
  private val pLabelStart = compile("^[A-Z][A-Za-z\\s]{1,24}[:\\s]")
}

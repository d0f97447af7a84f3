package graft.lib

import Py._

/** Rule-based language detection [EQ]
  * (reference: lib/text_processing.py:1782-1857). */
object Language {

  val idKeywords: Vector[String] = Vector(
    "yang", "dengan", "dan", "untuk", "dari", "pada", "adalah", "ini", "itu",
    "dalam", "tidak", "akan", "saya", "kamu", "kami", "mereka", "bisa", "oleh",
    "jika", "telah", "sudah", "harus", "dapat", "karena", "kepada", "maka",
    "tentang", "setiap", "seperti", "juga", "ada", "sebuah", "tersebut",
    "anda", "sangat", "kemudian", "saat", "selama", "masih", "lebih",
    "belum", "ketika", "kita", "baru", "perlu")

  val enKeywords: Vector[String] = Vector(
    "the", "is", "are", "and", "for", "that", "have", "with", "this", "from",
    "they", "will", "would", "there", "their", "what", "about", "which",
    "when", "one", "all", "been", "but", "not", "you", "your", "who",
    "more", "has", "was", "were", "can", "said", "out", "use", "into",
    "some", "than", "other", "time", "now", "only", "like", "just")

  private val idPatterns =
    Vector("\\bakan\\s+\\w+\\b", "\\bsedang\\s+\\w+\\b", "\\btelah\\s+\\w+\\b").map(compile(_))
  private val enPatterns =
    Vector("\\bwill\\s+\\w+\\b", "\\bhave\\s+\\w+\\b", "\\bhas\\s+\\w+\\b").map(compile(_))

  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty || Py.len(text) < 20) return "unknown"
    val textLower = " " + lower(text) + " "
    val idCount = idKeywords.count(w => textLower.contains(s" $w "))
    val enCount = enKeywords.count(w => textLower.contains(s" $w "))
    var idScore = idCount.toDouble / idKeywords.length
    var enScore = enCount.toDouble / enKeywords.length
    idScore += idPatterns.count(p => search(p, textLower).isDefined) * 0.1
    enScore += enPatterns.count(p => search(p, textLower).isDefined) * 0.1
    if (idScore > 0.15 && idScore > enScore) "id"
    else if (enScore > 0.15) "en"
    else {
      var latinChars = 0
      var totalChars = 0
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        if (isAlphaCp(cp)) {
          totalChars += 1
          if (cp < 128) latinChars += 1
        }
        i += Character.charCount(cp)
      }
      if (totalChars > 0) {
        val ratio = latinChars.toDouble / totalChars
        if (ratio > 0.9) "latin"
        else if (ratio < 0.3) "non-latin"
        else "unknown"
      } else "unknown"
    }
  }
}

package graft.operators

/**
 * Snowball Dutch stemmer — a faithful implementation of the published
 * algorithm (snowballstem.org/algorithms/dutch/stemmer.html; Porter's
 * Snowball language, dutch.sbl). The reference selects this stemmer for
 * `language: nl` (modules/nlp/app/tuktu/nlp/processors/Snowball.scala:36
 * `case "nl" | "nl_nl" => new dutchStemmer`); everything else falls back
 * to Porter ([[Nlp.porterStem]]), mirroring its `case _ => porterStemmer`.
 *
 * Algorithm notes (each step cites the .sbl routine it transcribes):
 *  - prelude: strip umlaut/acute accents; initial `y` → `Y`; after a
 *    vowel, `i` before a vowel → `I` and `y` → `Y` (markers are treated
 *    as consonants until the postlude lowers them back).
 *  - R1 = after the first non-vowel following a vowel, but never before
 *    position 3; R2 = the same re-applied from (unadjusted) R1.
 *  - among(...) commits to the longest matching suffix: if its side
 *    conditions fail, SHORTER suffixes are NOT retried.
 */
object SnowballDutch {
  private val vowels = "aeiouyè".toSet
  @inline private def isV(c: Char): Boolean = vowels.contains(c)

  def stem(word: String): String = {
    if (word == null) return null
    // ---- prelude: accents, then i/y markers ----
    var w = word.toLowerCase.map {
      case 'ä' | 'á' => 'a'
      case 'ë' | 'é' => 'e'
      case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'
      case 'ü' | 'ú' => 'u'
      case c => c
    }
    if (w.isEmpty) return w
    val cs = w.toCharArray
    if (cs(0) == 'y') cs(0) = 'Y'
    var i = 1
    while (i < cs.length) {
      if (cs(i) == 'y' && isV(cs(i - 1))) cs(i) = 'Y'
      else if (cs(i) == 'i' && isV(cs(i - 1)) &&
               i + 1 < cs.length && isV(cs(i + 1))) cs(i) = 'I'
      i += 1
    }
    w = new String(cs)

    // ---- mark_regions: cursor past first vowel, then past first non-vowel
    def mark(from: Int): Int = {
      var j = from
      while (j < w.length && !isV(w(j))) j += 1
      if (j >= w.length) return w.length
      j += 1 // past the vowel
      while (j < w.length && isV(w(j))) j += 1
      if (j >= w.length) w.length else j + 1 // past the non-vowel
    }
    val p1raw = mark(0)
    val p1 = math.max(3, p1raw)
    val p2 = mark(p1raw)
    def inR1(pos: Int) = pos >= p1
    def inR2(pos: Int) = pos >= p2

    var eFound = false
    // undouble: word ending kk/dd/tt loses the last letter
    def undouble(): Unit = {
      val t = w.takeRight(2)
      if (t == "kk" || t == "dd" || t == "tt") w = w.dropRight(1)
    }
    // en_ending at suffix start `pos` (suffix already matched): R1,
    // preceded by a non-vowel, and the stem must not end in "gem"
    def enEnding(pos: Int, sufLen: Int): Unit =
      if (inR1(pos) && pos >= 1 && !isV(w(pos - 1)) &&
          !w.substring(0, pos).endsWith("gem")) {
        w = w.dropRight(sufLen); undouble()
      }
    // e_ending: final e in R1 after a non-vowel is dropped (sets e_found)
    def eEnding(): Unit = {
      eFound = false
      val n = w.length
      if (n >= 2 && w.last == 'e' && inR1(n - 1) && !isV(w(n - 2))) {
        w = w.dropRight(1); eFound = true; undouble()
      }
    }

    // ---- step 1: 'heden' → 'heid'; en/ene; s/se (longest match commits)
    if (w.endsWith("heden")) {
      if (inR1(w.length - 5)) w = w.dropRight(5) + "heid"
    } else if (w.endsWith("ene")) enEnding(w.length - 3, 3)
    else if (w.endsWith("en")) enEnding(w.length - 2, 2)
    else if (w.endsWith("se")) {
      val pos = w.length - 2
      if (inR1(pos) && pos >= 1 && !isV(w(pos - 1)) && w(pos - 1) != 'j')
        w = w.dropRight(2)
    } else if (w.endsWith("s")) {
      val pos = w.length - 1
      if (inR1(pos) && pos >= 1 && !isV(w(pos - 1)) && w(pos - 1) != 'j')
        w = w.dropRight(1)
    }

    // ---- step 2: drop final e (records e_found for step 3b's 'bar')
    eEnding()

    // ---- step 3a: 'heid' (R2, not after c), then a following 'en'
    if (w.endsWith("heid") && inR2(w.length - 4) &&
        !(w.length >= 5 && w(w.length - 5) == 'c')) {
      w = w.dropRight(4)
      if (w.endsWith("en")) enEnding(w.length - 2, 2)
    }

    // ---- step 3b: d-suffixes (longest match commits)
    if (w.endsWith("baar")) {
      if (inR2(w.length - 4)) w = w.dropRight(4)
    } else if (w.endsWith("lijk")) {
      if (inR2(w.length - 4)) { w = w.dropRight(4); eEnding() }
    } else if (w.endsWith("end") || w.endsWith("ing")) {
      if (inR2(w.length - 3)) {
        w = w.dropRight(3)
        val pos = w.length - 2
        if (w.endsWith("ig") && inR2(pos) && !(pos >= 1 && w(pos - 1) == 'e'))
          w = w.dropRight(2)
        else undouble()
      }
    } else if (w.endsWith("bar")) {
      if (inR2(w.length - 3) && eFound) w = w.dropRight(3)
    } else if (w.endsWith("ig")) {
      val pos = w.length - 2
      if (inR2(pos) && !(pos >= 1 && w(pos - 1) == 'e')) w = w.dropRight(2)
    }

    // ---- step 4: undouble vowel in C-VV-C (final consonant not I)
    if (w.length >= 4) {
      val last = w.last
      val pair = w.substring(w.length - 3, w.length - 1)
      if (!isV(last) && last != 'I' &&
          (pair == "aa" || pair == "ee" || pair == "oo" || pair == "uu") &&
          !isV(w(w.length - 4)))
        w = w.substring(0, w.length - 2) + last
    }

    // ---- postlude: lower the markers back
    w.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }
}

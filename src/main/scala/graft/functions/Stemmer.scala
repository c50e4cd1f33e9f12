package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Porter stemmer (Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980 — public algorithm). Replaces the Spark-NLP
  * `Stemmer` annotator from the reference's grounding pipeline
  * (literature/Grounding.scala:41-104) with a dependency-free UDF, per
  * SURVEY.md §7.3.
  */
object Stemmer {

  private def isVowel(w: String, i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m of a stem: number of VC sequences. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean = w.indices.exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w(w.length - 1) == w(w.length - 2) && !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w(n - 1))
  }

  private def replaceSuffix(w: String, suffix: String, repl: String, minMeasure: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (measure(stem) > minMeasure - 1) Some(stem + repl) else Some(w)
    } else None

  def stem(word: String): String = {
    if (word.length < 3) return word.toLowerCase
    var w = word.toLowerCase

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    var doStep1bExtra = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
      w = w.dropRight(2); doStep1bExtra = true
    } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
      w = w.dropRight(3); doStep1bExtra = true
    }
    if (doStep1bExtra) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
      else if (endsDoubleConsonant(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w = w + "e"
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"
    )
    step2.collectFirst { case (s, r) if w.endsWith(s) => (s, r) }.foreach { case (s, r) =>
      val stemPart = w.dropRight(s.length)
      if (measure(stemPart) > 0) w = stemPart + r
    }

    // Step 3
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""
    )
    step3.collectFirst { case (s, r) if w.endsWith(s) => (s, r) }.foreach { case (s, r) =>
      val stemPart = w.dropRight(s.length)
      if (measure(stemPart) > 0) w = stemPart + r
    }

    // Step 4: a single longest-match dispatch over the full suffix set
    // (including "ion" with its s/t guard) — Porter applies AT MOST ONE
    // rule per step, and only the longest matching suffix's condition
    // is consulted (no fallback to shorter suffixes, no second strip:
    // "provisional" -> "provision", never "provis").
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize"
    )
    step4.filter(w.endsWith).sortBy(-_.length).headOption.foreach { s =>
      val stemPart = w.dropRight(s.length)
      val ionGuard = s != "ion" || (stemPart.nonEmpty && "st".contains(stemPart.last))
      if (measure(stemPart) > 1 && ionGuard) w = stemPart
    }

    // Step 5a
    if (w.endsWith("e")) {
      val stemPart = w.dropRight(1)
      val m = measure(stemPart)
      if (m > 1 || (m == 1 && !endsCvc(stemPart))) w = stemPart
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l")) w = w.dropRight(1)

    w
  }

  /** Column form. */
  val stemCol: Column => Column = {
    val f = udf((s: String) => if (s == null) null else stem(s))
    c => f(c)
  }
}

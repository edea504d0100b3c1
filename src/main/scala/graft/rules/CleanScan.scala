package graft.rules

/** Regex-free char scanners for every pass of the clean chain.
  *
  * Why: the chain runs per turn inside the codegen'd clean_text expression
  * — the pipeline's hottest path — and this host's measured
  * java.util.regex behavior collapses across threads in one JVM
  * (BENCH_SCALING.md), capping intra-JVM scaling. Each function below
  * replicates ONE regex pass of the CPython reference chain exactly
  * (same order, same consumption semantics); Rules.cleanStringRegex keeps
  * the original Pattern chain as the differential twin, and
  * CleanScanSpec pins scanner == regex on the fixture corpus and
  * adversarial edge cases.
  */
object CleanScan {

  @inline private def isWs(c: Char): Boolean = // regex \s: [ \t\n\x0B\f\r]
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isWordChar(c: Char): Boolean = // regex \w: [a-zA-Z0-9_]
    isAsciiLetter(c) || isDigit(c) || c == '_'

  /** [\n\r\t] -> "" */
  def stripNewlines(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\n' && c != '\r' && c != '\t') sb.append(c)
      i += 1
    }
    sb.toString
  }

  // the admitted set of the reference's negated charset class (see
  // Rules.charsetPattern derivation): alnum handled in code, plus these
  private val admittedPunct: Set[Char] =
    "-_!@#%&=,'\";:~`č₽€£$^()+[].{}|?<>".toSet

  /** charsetPattern (negated class)+ -> "" : keep only admitted chars. */
  def charsetKeep(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isAsciiLetter(c) || isDigit(c) || isWs(c) || admittedPunct.contains(c))
        sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** <[^>]+> -> "" (html tags; at least one char between brackets). */
  def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != '>') j += 1
        if (j < s.length && j > i + 1) i = j + 1 // matched <...>, skip it
        else { sb.append(c); i += 1 } // no closing '>' or empty "<>"
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** \^[a-zA-Z]\s+ -> "" */
  def stripCaretSingles(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '^' &&
          i + 1 < s.length && isAsciiLetter(s.charAt(i + 1)) &&
          i + 2 < s.length && isWs(s.charAt(i + 2))) {
        var j = i + 3
        while (j < s.length && isWs(s.charAt(j))) j += 1
        i = j
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** \s+ -> " " */
  def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) {
        sb.append(' ')
        var j = i + 1
        while (j < s.length && isWs(s.charAt(j))) j += 1
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** ^b\s+ -> "" */
  def stripPrefixB(s: String): String =
    if (s.length >= 2 && s.charAt(0) == 'b' && isWs(s.charAt(1))) {
      var j = 2
      while (j < s.length && isWs(s.charAt(j))) j += 1
      s.substring(j)
    } else s

  /** ([a-zA-Z])(\d+) -> "$1 $2": space at every letter->digit boundary. */
  def splitLetterDigit(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (i > 0 && isDigit(c) && isAsciiLetter(s.charAt(i - 1))) sb.append(' ')
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** \b[a-zA-Z]\b -> "": drop letters with non-word chars on both sides. */
  def dropSingleLetters(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val single = isAsciiLetter(c) &&
        (i == 0 || !isWordChar(s.charAt(i - 1))) &&
        (i + 1 == s.length || !isWordChar(s.charAt(i + 1)))
      if (!single) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** (\d+)(k) -> "$1000": 'k' preceded by a digit becomes "000". */
  def expandKilo(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == 'k' && i > 0 && isDigit(s.charAt(i - 1))) sb.append("000")
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** (?<=\d),(?=\d{3}) -> "": thousands comma removal. */
  def dropThousandsCommas(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val thousands = c == ',' && i > 0 && isDigit(s.charAt(i - 1)) &&
        i + 3 < s.length && isDigit(s.charAt(i + 1)) &&
        isDigit(s.charAt(i + 2)) && isDigit(s.charAt(i + 3))
      if (!thousands) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** (\d+)[ ]?<sym> -> "<sym> $1" — one regex pass (spaced=true replicates
    * "(\d+) (sym)", spaced=false "(\d+)(sym)").
    */
  def reorderCurrency(s: String, sym: Char, spaced: Boolean): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isDigit(c)) {
        var j = i
        while (j < s.length && isDigit(s.charAt(j))) j += 1 // digit run [i, j)
        val symAt = if (spaced) j + 1 else j
        val ok = symAt < s.length && s.charAt(symAt) == sym &&
          (!spaced || s.charAt(j) == ' ')
        if (ok) {
          sb.append(sym).append(' ').append(s, i, j)
          i = symAt + 1
        } else {
          sb.append(s, i, j)
          i = j
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** (?<=\d{4})-(?=\d{4}) -> " to " */
  def rangeToWords(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isRange = c == '-' && i >= 4 && i + 4 < s.length &&
        isDigit(s.charAt(i - 1)) && isDigit(s.charAt(i - 2)) &&
        isDigit(s.charAt(i - 3)) && isDigit(s.charAt(i - 4)) &&
        isDigit(s.charAt(i + 1)) && isDigit(s.charAt(i + 2)) &&
        isDigit(s.charAt(i + 3)) && isDigit(s.charAt(i + 4))
      if (isRange) sb.append(" to ") else sb.append(c)
      i += 1
    }
    sb.toString
  }

  // string.punctuation minus [$-:.%,£_] (ExtractInfo.py:156)
  private val customPunct: Set[Char] = "!\"#;<=>?@[\\]^`{|}~".toSet

  /** custom punctuation class -> "" */
  def dropCustomPunct(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!customPunct.contains(c)) sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** <[^>]+> -> " " (the preprocess tag strip replaces with a SPACE,
    * unlike the clean chain's removal).
    */
  def stripTagsSpace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != '>') j += 1
        if (j < s.length && j > i + 1) { sb.append(' '); i = j + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  @inline private def isLineTerm(c: Char): Boolean = // chars regex '.' skips
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  /** [\[(].*?[\])] -> " " : from an opener ('[' or '('), the NEAREST closer
    * of EITHER type (']' or ')') ends the span — non-greedy, openers and
    * closers unmatched by type, and '.' cannot cross a line terminator (an
    * opener with no closer on its line stays literal).
    */
  def dropParensSpans(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '[' || c == '(') {
        var j = i + 1
        while (j < s.length && !isLineTerm(s.charAt(j)) &&
            s.charAt(j) != ']' && s.charAt(j) != ')') j += 1
        if (j < s.length && (s.charAt(j) == ']' || s.charAt(j) == ')')) {
          sb.append(' ')
          i = j + 1
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** python no-arg split() + lemma map + ' '.join — regex-free tokenizer. */
  def lemmatizeTokens(s: String, lemmas: Map[String, String]): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var first = true
    while (i < s.length) {
      while (i < s.length && isWs(s.charAt(i))) i += 1
      if (i < s.length) {
        var j = i
        while (j < s.length && !isWs(s.charAt(j))) j += 1
        val tok = s.substring(i, j)
        if (!first) sb.append(' ')
        sb.append(lemmas.getOrElse(tok, tok))
        first = false
        i = j
      }
    }
    sb.toString
  }
}

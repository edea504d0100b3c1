package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.rules.Rules
import graft.sources.TranscriptGen

/** Differential pin: the regex-free scanner chain must equal the original
  * Pattern chain on fixture corpus, adversarial edge cases, and seeded
  * fuzz over a trap-rich alphabet (currency symbols, digit runs, tags,
  * carets, thousands commas, 4-digit ranges, whitespace varieties).
  */
class CleanScanSpec extends AnyFunSuite {

  private def check(s: String): Unit =
    assert(Rules.cleanString(s) == Rules.cleanStringRegex(s),
      s"input: ${s.replace("\n", "\\n").replace("\t", "\\t")}")

  test("scanner == regex twin on adversarial edge cases") {
    Seq(
      "", " ", "b ", "b  x", "^a  tail", "^ab tail", "^5 tail", "x^a y",
      "<b>bold</b> and <i>it</i>", "a<>b", "<unclosed tag", "<<nested>>",
      "3k", "33kk", "3k5k", "k3k", "1,234", "1,23", "12,3456", ",123", "1,",
      "2984 €", "2984€", "12 $ and 34$", "55 £", "55£x", "1 2 €", "€ 99",
      "1000-2000", "123-4567", "12345-67890", "-1234", "1234-", "9999-9999",
      "a1b2c3", "x9", "9x", "a b c d", "ab cd", "_a_ b_", "a_b c-d",
      "euro 500", "eur 500", "usd 500", "dollar 500", "500 euro 600 eur ",
      "tab\there", "mix \u000B vt \f ff", "  lead", "trail  ",
      "masteratms atm atms", "&amp; co", "Grüß größe straße", "čžš čč",
      "45,000 € per year in 2024-2025 range", "^x ^y ^z chain").foreach(check)
  }

  test("scanner == regex twin on the generated fixture corpus") {
    (0L until 150L).foreach { i =>
      TranscriptGen.turnsFor(i, 42L, 0, 0).foreach(t => check(t.text))
    }
  }

  test("scanner == regex twin under seeded fuzz (trap-rich alphabet)") {
    val alphabet = "ab k09€$£<>,-^._! \t\n\u000B\f\r;\"?&=:#" + "é€£č"
    val rnd = new scala.util.Random(99)
    (0 until 3000).foreach { _ =>
      val n = rnd.nextInt(40)
      check((0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }
}

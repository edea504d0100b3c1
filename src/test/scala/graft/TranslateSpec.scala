package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Translate

/** F8 — the chunked-translation protocol (language gate, '||' join,
  * fixed-window API slicing, re-split) against hand-built cases.
  */
class TranslateSpec extends AnyFunSuite {

  private def recording(buf: scala.collection.mutable.ArrayBuffer[String])(
      w: String, l: String): String = { buf += w; Translate.stubTranslate(w, l) }

  test("'en' and 'False' languages pass chunks through untranslated") {
    val chunks = Seq("hello there", "general")
    assert(Translate.translateChunkedData(chunks, "en", Translate.stubTranslate) == chunks)
    assert(Translate.translateChunkedData(chunks, "False", Translate.stubTranslate) == chunks)
  }

  test("below the limit: one API call over the '||' join; empties preserved") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = Translate.translateChunkedData(Seq("a", "", "b"), "de", recording(calls))
    assert(out == Seq("A", "", "B"))
    assert(calls.toSeq == Seq("a||||b")) // one window, marker-joined
  }

  test("above the limit: ceil(len/limit) fixed slices, boundaries exact") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    // joined = "abcde||fgh" (10 chars), limit 7 -> windows [0,7) and [7,10)
    val out = Translate.translateChunkedData(Seq("abcde", "fgh"), "de",
      recording(calls), charLimit = 7)
    assert(calls.toSeq == Seq("abcde||", "fgh"))
    assert(out == Seq("ABCDE", "FGH"))
  }

  test("a window boundary can split the '||' marker (reference quirk kept)") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    // joined = "abcde||fgh", limit 6 -> "abcde|" + "|fgh": the marker is
    // cut across API calls; a char-local translator still round-trips
    val out = Translate.translateChunkedData(Seq("abcde", "fgh"), "de",
      recording(calls), charLimit = 6)
    assert(calls.toSeq == Seq("abcde|", "|fgh"))
    assert(out == Seq("ABCDE", "FGH"))
  }

  test("default limit is the reference's 5000-char API window") {
    assert(Translate.transCharLimit == 5000)
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val big = Seq.fill(3)("x" * 2600) // joined 7804 chars -> 2 windows
    Translate.translateChunkedData(big, "fr", recording(calls))
    assert(calls.length == 2 && calls.head.length == 5000)
  }
}

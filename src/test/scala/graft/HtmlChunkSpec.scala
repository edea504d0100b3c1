package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlChunk

/** F5/E1 — the stateful HTML→chunk parser against hand-built goldens
  * (reference state machine GenerateDataFromHtml.py:84-128) and the
  * global-id explode's ordering/sequence invariants.
  */
class HtmlChunkSpec extends SparkSpec {

  test("textNodes == CPython HTMLParser handle_data events (empirically verified)") {
    // every expected value below is the literal CPython 3.11 output of
    // HTMLParser().feed(s); close() with handle_data recording
    assert(HtmlChunk.textNodes("<p>hello</p><!-- c --><div>world &amp; co</div>")
      == Seq("hello", "world & co"))
    assert(HtmlChunk.textNodes("a < b and more") == Seq("a ", "<", " b and more"))
    assert(HtmlChunk.textNodes("3 < 4 > 2 eur") == Seq("3 ", "<", " 4 > 2 eur"))
    assert(HtmlChunk.textNodes("<unclosed tag") == Seq("<", "unclosed tag"))
    assert(HtmlChunk.textNodes("pay< 4 >2") == Seq("pay", "<", " 4 >2"))
    assert(HtmlChunk.textNodes("x&#65;y&#x42;z&unknown;w") == Seq("xAyBz&unknown;w"))
    assert(HtmlChunk.textNodes("<!-- unterminated") == Seq("<", "!-- unterminated"))
    assert(HtmlChunk.textNodes("a<>b") == Seq("a", "<", ">b"))
    assert(HtmlChunk.textNodes("tail<") == Seq("tail", "<"))
    assert(HtmlChunk.textNodes("") == Seq.empty)
  }

  test("chunkDoc: restricted skip, label join, 1-word drop, within-doc dedup") {
    // label ("Location:" is restricted, never recorded itself) joins its
    // immediately-following value node — even a 1-word value
    assert(HtmlChunk.chunkDoc("<td>Location:</td><td>Berlin</td>")
      == Seq("location: berlin"))
    // a whitespace text node between label and value RESETS the prev state
    // (reference quirk: prevNodeData updates on every handle_data)
    assert(HtmlChunk.chunkDoc("<td>Location:</td> <td>Berlin</td>").isEmpty)
    // 1-word non-label chunks drop; >1-word chunks keep; dedup within doc
    assert(HtmlChunk.chunkDoc("<p>Hello</p><p>hello world</p><p>hello world</p>")
      == Seq("hello world"))
    // restricted boilerplate alone records nothing
    assert(HtmlChunk.chunkDoc("<span>Save contact</span>").isEmpty)
    // jobs-europe mode: no label machinery, plain >1-word + dedup
    assert(HtmlChunk.chunkDoc("<td>Location:</td><td>Berlin now</td>", euroJobs = false)
      == Seq("berlin now"))
  }

  test("explodeChunks: global chunk_id is the 0..N-1 sequence in (doc, idx) order") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (f"doc-$i%03d", s"<p>alpha beta $i</p><p>gamma delta $i</p><td>Location:</td><td>Berlin</td>")
    }.toDF("data_point_id", "html").repartition(7)
    val out = HtmlChunk.explodeChunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.length == 40 * 3)
    assert(out.map(_._1).toSeq == (0L until 120L)) // dense global sequence
    // sequence order == (data_point_id, chunk_idx) order
    assert(out.map(t => (t._2, t._3)).toSeq == out.map(t => (t._2, t._3)).sortBy(identity).toSeq)
    // within-doc content preserved in order
    val d0 = out.filter(_._2 == "doc-000").map(_._4).toSeq
    assert(d0 == Seq("alpha beta 0", "gamma delta 0", "location: berlin"))
  }
}

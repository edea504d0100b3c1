package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.rules.Rules

/** F5 + E1 — the reference's stateful HTML→chunk parser and the
  * posting→chunks explode with a GLOBAL sequential chunk id
  * (GenerateDataFromHtml.py:84-128 parser, :300-356 per-posting loop,
  * :406-407 global chunk_id assignment).
  *
  * The parser is stateful only WITHIN one document (prevNodeData), so it
  * is a per-row pure function — a typed flatMap, no cross-row machinery
  * (SURVEY §2.2 F5). The global id is the scale-correct two-pass
  * assignment (range-partition + per-partition offsets via zipWithIndex),
  * never a single-partition window.
  */
object HtmlChunk {

  /** boilerplate strings skipped on the euro-jobs portal (:85-89). */
  val restrictedStrings: Set[String] = Set(
    "location:", "job category:", "eu work permit required:", "job reference:",
    "posted:", "expiry date:", "job description:", "company info", "phone:",
    "web site:", "job views:", "original source", "save contact",
    "company profile", "get job by email")

  /** labels whose FOLLOWING text node is recorded as "label value" (:90-91). */
  val prevNodeDataCheck: Set[String] = Set(
    "location:", "job category:", "eu work permit required:", "job reference:",
    "posted:", "expiry date:", "job description:", "company info", "phone:",
    "web site:", "job views:")

  /** Text nodes of an HTML string, in document order — the handle_data
    * event sequence of Python's HTMLParser (verified against CPython):
    * text between tags; comments/decls emit no data; a '<' that does NOT
    * open a complete construct is emitted as ITS OWN single-char data
    * event (so "a < b" → ["a ", "<", " b"], and an unclosed "<tag" at EOF
    * → ["<", "tag"]); common character references decoded in place
    * (convert_charrefs; named html5 subset + numeric, ';'-terminated).
    */
  def textNodes(html: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    val len = html.length
    var i = 0
    def flush(): Unit = { if (sb.length > 0) { out += sb.toString; sb.setLength(0) } }
    @inline def isTagStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '/' || c == '!' || c == '?'
    def bareLt(): Unit = { flush(); out += "<"; i += 1 } // standalone '<' data event
    while (i < len) {
      val c = html.charAt(i)
      if (c == '<') {
        if (i + 1 < len && isTagStart(html.charAt(i + 1))) {
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            if (e < 0) bareLt() // unterminated comment: '<' then "!--…" as data
            else { flush(); i = e + 3 } // complete comment: no data event
          } else {
            val e = html.indexOf('>', i + 1)
            if (e < 0) bareLt() // incomplete tag at EOF: '<' then rest as data
            else { flush(); i = e + 1 } // complete tag: no data event
          }
        } else bareLt()
      } else if (c == '&') {
        val (decoded, next) = charRef(html, i)
        sb.append(decoded)
        i = next
      } else { sb.append(c); i += 1 }
    }
    flush()
    out.toSeq
  }

  /** minimal character-reference decoding (the HTML5 named table's common
    * subset + numeric forms); unknown refs pass through verbatim.
    */
  private val namedRefs = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  private def charRef(s: String, at: Int): (String, Int) = {
    val semi = s.indexOf(';', at + 1)
    if (semi < 0 || semi - at > 10) return ("&", at + 1)
    val body = s.substring(at + 1, semi)
    if (body.startsWith("#x") || body.startsWith("#X")) {
      try { (Character.toString(Integer.parseInt(body.substring(2), 16)), semi + 1) }
      catch { case _: Exception => ("&", at + 1) }
    } else if (body.startsWith("#")) {
      try { (Character.toString(Integer.parseInt(body.substring(1))), semi + 1) }
      catch { case _: Exception => ("&", at + 1) }
    } else namedRefs.get(body).map((_, semi + 1)).getOrElse(("&", at + 1))
  }

  /** One document → cleaned chunks, reference state machine verbatim
    * (:98-128): clean each node; euro-jobs mode skips restricted strings,
    * joins a label node with its successor ("label value", recorded even
    * at 1 word), otherwise records >1-word chunks; within-doc dedup; the
    * prev-label state updates on EVERY node (so an interleaved
    * whitespace-only node resets it — quirk kept).
    */
  def chunkDoc(html: String, euroJobs: Boolean = true): Seq[String] = {
    val chunks = scala.collection.mutable.LinkedHashSet.empty[String]
    var prev = ""
    textNodes(html).foreach { origData =>
      val data = Rules.cleanString(origData)
      val nWords = Rules.wsTokens(data).length
      if (euroJobs) {
        if (!restrictedStrings.contains(data)) {
          if (nWords > 0 && prev.nonEmpty && prevNodeDataCheck.contains(prev))
            chunks += s"$prev $data"
          else if (nWords > 1) chunks += data
        }
      } else if (nWords > 1) chunks += data
      prev = data
    }
    chunks.toSeq
  }

  /** postings(data_point_id, html) → (chunk_id GLOBAL sequence,
    * data_point_id, chunk_idx, chunk). E1: the id is assigned with the
    * two-pass pattern — range-repartition by (doc, idx), sort within
    * partitions, then zipWithIndex (per-partition counts collected to the
    * driver = numPartitions longs, never the data).
    */
  def explodeChunks(postings: DataFrame, euroJobs: Boolean = true)(
      implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val chunks = postings.select(col("data_point_id"), col("html"))
      .as[(String, String)]
      .flatMap { case (id, html) =>
        chunkDoc(html, euroJobs).zipWithIndex.map { case (c, i) => (id, i, c) }
      }
      .toDF("data_point_id", "chunk_idx", "chunk")
    val sorted = chunks
      .repartitionByRange(col("data_point_id"), col("chunk_idx"))
      .sortWithinPartitions("data_point_id", "chunk_idx")
    val schema = StructType(StructField("chunk_id", LongType, nullable = false)
      +: sorted.schema.fields)
    val withId = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(i +: r.toSeq) }
    spark.createDataFrame(withId, schema)
  }
}

package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3 — Excel scan (the reference reads its jobs-europe training corpus
  * with pandas.read_excel, html-chunking-and-model-generation/
  * GenerateDataFromHtml.py:~214). A minimal OOXML (.xlsx) reader on the
  * JDK only (java.util.zip + StAX; ECMA-376: xl/sharedStrings.xml +
  * xl/worksheets/sheet1.xml): header row → column names, every cell read
  * as a string, gaps padded empty — pandas' str-dtype read.
  *
  * Scale note: Excel is a DRIVER-SIDE source by nature (a hand-maintained
  * training corpus / dimension file, zip-compressed single blob — not
  * splittable); rows parse on the driver and parallelize from there, like
  * any dim. Fact-scale data never arrives as xlsx.
  */
object ExcelScan {

  /** shared-strings table: the concatenated <t> runs of each <si>. */
  private def sharedStrings(in: InputStream): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    var cur: java.lang.StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new java.lang.StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString; cur = null
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** 0-based column index from a cell reference ("B3" → 1). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** sheet rows as sparse (colIdx → text) maps, in sheet order. Cell types:
    * t="s" shared string, t="inlineStr" (<is><t>), otherwise the raw <v>
    * text (numbers, t="str" formula strings, booleans).
    */
  private def sheetRows(in: InputStream, shared: IndexedSeq[String]): Seq[Map[Int, String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[Int, String]]
    val r = XMLInputFactory.newInstance().createXMLStreamReader(in)
    var row: scala.collection.mutable.Map[Int, String] = null
    var cellCol = -1
    var cellType = ""
    // cellBuf accumulates across ALL <v>/<t> runs of one cell: a rich-text
    // inline string <is><r><t>hello </t></r><r><t>world</t></r></is> is one
    // "hello world" cell (pandas.read_excel parity), not the last run
    var cellBuf: java.lang.StringBuilder = null
    var text: java.lang.StringBuilder = null
    var nextColIfNoRef = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.Map.empty
              nextColIfNoRef = 0
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(nextColIfNoRef)
              nextColIfNoRef = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellBuf = null
            case "v" | "t" => text = new java.lang.StringBuilder
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if text != null =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" =>
              if (text != null) {
                if (cellBuf == null) cellBuf = new java.lang.StringBuilder
                cellBuf.append(text)
              }
              text = null
            case "c" =>
              if (row != null && cellCol >= 0 && cellBuf != null) {
                val raw = cellBuf.toString
                row(cellCol) = if (cellType == "s") shared(raw.trim.toInt) else raw
              }
              cellCol = -1; cellType = ""; cellBuf = null
            case "row" => rows += row.toMap; row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }

  /** (header, data rows) of the first worksheet, every value a string,
    * gaps "".
    */
  def readSheet(path: String): (Seq[String], Seq[Seq[String]]) = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => sharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(s"no xl/worksheets/sheet1.xml in $path"))
      val rows = sheetRows(zip.getInputStream(sheetEntry), shared)
      if (rows.isEmpty) return (Seq.empty, Seq.empty)
      val width = rows.iterator.flatMap(_.keys).foldLeft(-1)(math.max) + 1
      def dense(m: Map[Int, String]): Seq[String] =
        (0 until width).map(i => m.getOrElse(i, ""))
      // empty/missing header cells get positional names (pandas calls them
      // "Unnamed: N"), and duplicate non-empty names deduplicate
      // pandas-style ("skills", "skills.1", …) — either class of collision
      // would make the DataFrame unaddressable by name
      val named = dense(rows.head).zipWithIndex.map {
        case ("", i) => s"unnamed_$i"
        case (h, _) => h
      }
      val seen = scala.collection.mutable.Map.empty[String, Int]
      val header = named.map { h =>
        val n = seen.getOrElse(h, 0)
        seen(h) = n + 1
        if (n == 0) h
        else {
          // bump until unique in case "h.N" itself appears as a header
          var k = n
          while (named.contains(s"$h.$k") || seen.contains(s"$h.$k")) k += 1
          seen(s"$h.$k") = 1
          s"$h.$k"
        }
      }
      (header, rows.tail.map(dense))
    } finally zip.close()
  }

  /** pandas.read_excel shape: header row → column names, string cells. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val (header, rows) = readSheet(path)
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(header.map(
      org.apache.spark.sql.types.StructField(_, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row.fromSeq(r)).asJava, schema)
  }

  private def xmlEscape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      // CR is a legal XML char but raw #xD is normalized to LF by every
      // conforming parser (XML 1.0 §2.11) — write it as a char reference
      // so write -> read round-trips exactly
      case '\r' => b.append("&#xD;")
      // chars below 0x20 other than tab/LF/CR are ILLEGAL in XML 1.0 even
      // as references: substitute U+FFFD (documented lossy case)
      case c if c < 0x20 && c != '\t' && c != '\n' => b.append('�')
      case c => b.append(c)
    }
    b.toString
  }

  /** Minimal xlsx sink (the write side of S3): one sheet, inline-string
    * cells, the same ECMA-376 parts the reader consumes — so
    * write → [[read]] round-trips exactly (ExcelScanSpec property) and the
    * q42 driver oracle can cross-check the whole surface against DuckDB.
    * Small bounded exports only (the reference's Excel files are
    * ground-truth sheets of a few thousand rows, not fact tables).
    * Round-trip caveat: control chars below 0x20 other than tab/LF/CR are
    * illegal in XML 1.0 even as references and are substituted with
    * U+FFFD; CR survives via a char reference.
    */
  def writeXlsx(path: String, header: Seq[String], rows: Seq[Seq[String]]): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val z = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      z.closeEntry()
    }
    try {
      // full OPC plumbing (ECMA-376 Part 2): content-type Defaults +
      // Overrides, package-root rels, workbook rels, r:id on the sheet —
      // so external consumers (Excel, openpyxl/pandas, LibreOffice) accept
      // the package, not just graft's own lenient reader
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      (header +: rows).zipWithIndex.foreach { case (r, i) =>
        sb.append(s"""<row r="${i + 1}">""")
        r.foreach { v =>
          sb.append("""<c t="inlineStr"><is><t>""")
            .append(xmlEscape(if (v == null) "" else v))
            .append("</t></is></c>")
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally z.close()
  }
}

package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.ExcelScan

/** S3 — the minimal xlsx reader against a fixture zip hand-written to the
  * PUBLIC ECMA-376 spec (sharedStrings + sheet1, shared/inline/number
  * cells, sparse cell references, multi-run strings).
  */
class ExcelScanSpec extends SparkSpec {

  /** writes a spec-shaped .xlsx: zip with the minimum OOXML parts. */
  private def writeFixture(path: String, sheetXml: String, sharedXml: Option[String]): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""")
    sharedXml.foreach(put("xl/sharedStrings.xml", _))
    put("xl/worksheets/sheet1.xml", sheetXml)
    z.close()
  }

  test("writeXlsx -> readSheet round-trips exactly (XML-special chars, unicode, fuzz)") {
    val rnd = new scala.util.Random(2026)
    val alphabet = Seq("a", "b&c", "<tag>", "\"q\"", "'s'", "ü中", "42", "3.14",
      " lead", "trail ", "x y z", "&amp;", "a\rb", "l1\nl2", "t\tab")
    (1 to 30).foreach { _ =>
      val nCols = 1 + rnd.nextInt(5)
      val header = (0 until nCols).map(i => s"col$i")
      val rows = (0 until rnd.nextInt(8)).map(_ =>
        (0 until nCols).map(_ => alphabet(rnd.nextInt(alphabet.size))))
      val path = java.io.File.createTempFile("graft-w", ".xlsx").getAbsolutePath
      ExcelScan.writeXlsx(path, header, rows)
      val (h2, r2) = ExcelScan.readSheet(path)
      assert(h2 == header, s"header mismatch for $rows")
      assert(r2 == rows, s"rows mismatch")
    }
    // illegal-in-XML control chars are the documented lossy case: U+FFFD
    val p2 = java.io.File.createTempFile("graft-w", ".xlsx").getAbsolutePath
    ExcelScan.writeXlsx(p2, Seq("c"), Seq(Seq("a\u0001b")))
    assert(ExcelScan.readSheet(p2)._2 == Seq(Seq("a�b")))
  }

  test("reads header + rows: shared strings, inline strings, numbers, gaps, multi-run si") {
    val shared =
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>id</t></si>
        |<si><t>title</t></si>
        |<si><t>data </t><t>engineer</t></si>
        |<si><t>big html &amp; stuff</t></si>
        |</sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>2</v></c></row>
        |<row r="3"><c r="A3"><v>8.5</v></c><c r="B3" t="inlineStr"><is><t>inline text</t></is></c></row>
        |<row r="4"><c r="B4" t="s"><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val path = java.io.File.createTempFile("graft", ".xlsx").getAbsolutePath
    writeFixture(path, sheet, Some(shared))

    val (header, rows) = ExcelScan.readSheet(path)
    assert(header == Seq("id", "title"))
    assert(rows == Seq(
      Seq("7", "data engineer"),
      Seq("8.5", "inline text"),
      Seq("", "big html & stuff"))) // A4 missing -> gap padded

    val df = ExcelScan.read(spark, path)
    assert(df.columns.toSeq == Seq("id", "title"))
    assert(df.count() == 3)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("cells without an r attribute advance sequentially; empty sheet is empty") {
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row><c><v>a1</v></c><c><v>b1</v></c></row>
        |<row><c><v>a2</v></c><c><v>b2</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val path = java.io.File.createTempFile("graft", ".xlsx").getAbsolutePath
    writeFixture(path, sheet, None)
    val (header, rows) = ExcelScan.readSheet(path)
    assert(header == Seq("a1", "b1") && rows == Seq(Seq("a2", "b2")))

    val empty = java.io.File.createTempFile("graft", ".xlsx").getAbsolutePath
    writeFixture(empty,
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData/></worksheet>""",
      None)
    val (h2, r2) = ExcelScan.readSheet(empty)
    assert(h2.isEmpty && r2.isEmpty)
  }

  test("rich-text inline strings concatenate runs; ragged header gets positional names") {
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><r><t>hello </t></r><r><t>world</t></r></is></c><c r="C2"><v>9</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val path = java.io.File.createTempFile("graft", ".xlsx").getAbsolutePath
    writeFixture(path, sheet, None)
    val (header, rows) = ExcelScan.readSheet(path)
    // header has 1 cell but a data row reaches column C -> positional names
    assert(header == Seq("id", "unnamed_1", "unnamed_2"))
    assert(rows == Seq(Seq("hello world", "", "9"))) // runs concatenated
    val df = ExcelScan.read(spark, path)
    assert(df.select("unnamed_2").count() == 1) // addressable by name
  }

  test("duplicate header names deduplicate pandas-style (skills, skills.1)") {
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>skills</t></is></c><c r="C1" t="inlineStr"><is><t>skills</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>java</t></is></c><c r="C2" t="inlineStr"><is><t>sql</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val path = java.io.File.createTempFile("graft", ".xlsx").getAbsolutePath
    writeFixture(path, sheet, None)
    val (header, rows) = ExcelScan.readSheet(path)
    assert(header == Seq("id", "skills", "skills.1"))
    assert(rows == Seq(Seq("1", "java", "sql")))
    // the previous behavior produced two 'skills' columns — unaddressable
    val df = ExcelScan.read(spark, path)
    assert(df.select("skills").head().getString(0) == "java")
    // pandas-style names contain a dot — Spark callers quote with backticks
    assert(df.select("`skills.1`").head().getString(0) == "sql")
  }

  test("column reference arithmetic (A=0, Z=25, AA=26)") {
    assert(graft.sources.ExcelScan.colIndex("A1") == 0)
    assert(graft.sources.ExcelScan.colIndex("Z9") == 25)
    assert(graft.sources.ExcelScan.colIndex("AA10") == 26)
    assert(graft.sources.ExcelScan.colIndex("AB3") == 27)
  }
}

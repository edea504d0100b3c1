package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.rules.{AhoCorasick, DictRules}
import graft.sources.Dims

class DictRulesSpec extends AnyFunSuite {

  test("occupation skill lists reference real skill labels") {
    val labels = Dims.skills.map(_.label).toSet
    Dims.occupations.foreach { o =>
      (o.essential ++ o.optional).foreach(s =>
        assert(labels.contains(s), s"${o.name}: unknown skill '$s'"))
    }
  }

  test("AhoCorasick finds all occurrences in end order") {
    val ac = new AhoCorasick(Seq("he", "she", "his", "hers"))
    val hits = ac.scan("ushers")
    assert(hits.map(_._2).toSet == Set("she", "he", "hers"))
    assert(hits.map(_._1) == hits.map(_._1).sorted) // end-position order
  }

  test("preprocess scanner == Pattern twin (tags, parens, line terms, fuzz)") {
    val edges = Seq("", "<b>x</b>", "a <unclosed", "plain (remove me) text",
      "[also gone] stays", "nested ((a) b)", "mixed (a] b)", "cross (a\nb) kept",
      "(noclose", "many   \t spaces", "del\u007fchar", "ls\u2028sep (x)",
      "<p>(a)</p>[b]<", "()", "[]", "( )", "deep [[[x]]]")
    edges.foreach(s =>
      assert(DictRules.preprocess(s) == DictRules.preprocessRegex(s), s"input: ${s.replace("\n", "\\n")}"))
    val alphabet = "ab ()[]<>\n\r\t\u2028\u007f.,"
    val rnd = new scala.util.Random(23)
    (0 until 4000).foreach { _ =>
      val s = (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(DictRules.preprocess(s) == DictRules.preprocessRegex(s),
        s"input: ${s.replace("\n", "\\n").replace("\r", "\\r")}")
    }
  }

  test("findWholeWord scanner == per-call Pattern twin (fuzz incl. case traps)") {
    val words = Seq("data", "Data", "DATA", "big data", "ä", "Ä", "a_b", "st.", "x")
    val hays = Seq("", "data", "Data science", "bigdata", "big data here", "DATA:",
      "xdata", "data7", "a_b c", "st. paul", "ästhetik", "Ähnlich ä", "d a t a",
      "the DATA is big Data", "ää Ää", "9data data9 _data data_")
    for (w <- words; h <- hays) {
      assert(DictRules.findWholeWord(w, h) == DictRules.findWholeWordRegex(w, h),
        s"w=$w h=$h")
    }
    // random fuzz over a trap alphabet (ASCII case pairs + non-ASCII letters)
    val alphabet = "aAbB zZ_9.äÄé"
    val rnd = new scala.util.Random(7)
    (0 until 4000).foreach { _ =>
      val w = (0 until 1 + rnd.nextInt(3)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val h = (0 until rnd.nextInt(20)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(DictRules.findWholeWord(w, h) == DictRules.findWholeWordRegex(w, h),
        s"w=$w h=$h")
    }
  }

  test("greedy non-overlap scan with whole-word verify") {
    val ac = new AhoCorasick(Seq("software engineer", "engineer"))
    val m = DictRules.greedyMatches(ac, "we need a software engineer now")
    assert(m.head == "software engineer")
  }

  test("title extraction picks the planted occupation") {
    val t = DictRules.extractTitle("we are hiring a software engineer at acme industries.")
    assert(t == "Software Engineer")
    // two related surfaces -> containment/pruning keeps a sensible one
    val t2 = DictRules.extractTitle("senior data scientist or machine learning engineer wanted")
    assert(Set("Data Scientist", "Machine Learning Engineer").contains(t2))
    assert(DictRules.extractTitle("nothing relevant here") == "")
  }

  test("skill extraction resolves alt surfaces to preferred labels") {
    val s = DictRules.extractSkills("required skills: python, deep learning and sql.")
    assert(s == Seq("python programming", "machine learning", "sql databases"))
  }

  test("filterSkillsByTitle keeps only occupation-linked skills") {
    val skills = Seq("python programming", "welding", "sql databases")
    val kept = DictRules.filterSkillsByTitle("software engineer", skills)
    assert(kept == Seq("python programming", "sql databases"))
    assert(DictRules.filterSkillsByTitle("", skills).isEmpty)
  }

  test("sector and ISCO walk recover the planted occupation") {
    Seq("251", "222", "833", "241").foreach { isco =>
      val occ = Dims.occupationByIsco(isco)
      val skills = occ.essential
      assert(DictRules.sector(skills) == Dims.naceName(occ.nace), s"sector for ${occ.name}")
      assert(DictRules.isco3(skills) == isco, s"isco for ${occ.name}")
    }
  }

  test("estimate salary = dim lookup x12, EUR-converted, int-truncated") {
    val occ = Dims.occupationByIsco("251")
    val est = DictRules.estimateSalary(occ.essential, Some("Poland")).get
    val want = (Dims.monthlySalary("PL", "251") * 12 * Dims.fxToEur("pln")).toInt
    assert(est == want)
    assert(DictRules.estimateSalary(occ.essential, None).isEmpty)
  }

  test("zero-skill scoring falls back to first node (reference argmax semantics)") {
    assert(DictRules.sector(Nil) == Dims.naceName(Dims.naceSections.head._1))
  }
}

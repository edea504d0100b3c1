package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.rules.Rules

/** Hand-computed expectations for the rule bank. The cleanString cases are
  * pinned against the CPython reference implementation of
  * /root/reference/extract-info/ExtractInfo.py:154-207 (lemmatizer replaced
  * by the fixture dictionary), run offline — including its quirks (reorder
  * gluing "45000-€ 55000per", newline removal joining words, etc).
  */
class RulesSpec extends AnyFunSuite {

  test("cleanString matches the CPython reference behavior") {
    val cases = Seq(
      "We Offer a Salary of 45,000 € per year!  Full Time <b>position</b> in Berlin, Germany." ->
        "we offer salary of € 45000 per year full time position in berlin, germany.",
      "Salary range: 45000-55000 euro per year." ->
        "salary range: 45000-€ 55000per year.",
      "We offer a monthly salary of 3000 euro gross." ->
        "we offer monthly salary of € 3000gross.",
      "The annual salary is 52000 dollars in total." ->
        "the annual salary is 52000 dollar in total.",
      "Working time is 40 hours per week." ->
        "working time is 40 hour per week.",
      "Office hours are 9am - 5pm on weekdays." ->
        "office hour are 9am - 5pm on weekdays.",
      "Candidates should hold a bachelor degree or a master degree." ->
        "candidate should hold bachelor degree or master degree.",
      "Caþ́ résumé — apply at https://example.com/jobs?id=3k! Pay: 3k" ->
        "ca resume apply at https:example.comjobsid3000 pay: 3000",
      "  b whitespace\t\ttest\nnewline  " ->
        "whitespacetestnewline",
      // CPython strips literal backslashes (the reference charset's `\\]`
      // is an escaped `]`, not an admitted backslash)
      "Backslash path C:\\temp\\files stays flat" ->
        "backslash path :tempfiles stays flat",
      "foo\\bar and plain text here" ->
        "foobar and plain text here")
    cases.foreach { case (in, want) =>
      assert(Rules.cleanString(in) == want, s"input: $in")
    }
  }

  test("salary extraction: currency association, year discard, minDistance") {
    // euro-symbol association
    val h1 = Rules.extractSalary("we offer salary of € 45000 per year").get
    assert(h1.values == Seq(45000.0) && h1.currencies == Seq("euro"))
    assert(h1.currencyAssociated == Seq(45000.0))
    // no gate -> no hit
    assert(Rules.extractSalary("nothing about money here").isEmpty)
    // numbers below 450 are discarded
    assert(Rules.extractSalary("salary of € 100 per day").isEmpty)
    // month within 2 words => year value discarded (ExtractInfo.py:458-465)
    assert(Rules.extractSalary("salary review in january 2024 happens").isEmpty)
    // currency words beat symbols inside one ±5-word window (getCurrency,
    // ExtractInfo.py:370-386): 'dollar' owns both numbers here
    val h2a = Rules.extractSalary("salary either 50000 dollar or 48000 € per year").get
    assert(h2a.currencies == Seq("usd"))
    // euro-priority when values sit in disjoint windows (ExtractInfo.py:395-401)
    val h2 = Rules.extractSalary(
      "they pay 50000 dollar for juniors while seniors receive 48000 euro per year here").get
    assert(h2.currencies == Seq("euro") && h2.values == Seq(48000.0))
    // > 2 values -> closest adjacent pair (minDistance)
    assert(Rules.minDistance(Seq(1000.0, 5000.0, 5500.0)) == Seq(5000.0, 5500.0))
  }

  test("employment grouping and priority") {
    val s = Rules.employmentSurfaces("this is full time role with internship option")
    assert(Rules.employmentGroupsOf(s) == Seq("full-time", "internship"))
    assert(Rules.priorityEmployment(Seq("internship", "part-time")).contains("part-time"))
    assert(Rules.priorityEmployment(Nil).isEmpty)
  }

  test("location gazetteer + mode with first-occurrence tie-break") {
    assert(Rules.extractLocations("located in berlin, germany.") == Seq("Germany"))
    assert(Rules.extractLocations("office in paris or warsaw") == Seq("France", "Poland"))
    assert(Rules.modeLocation(Seq("France", "Poland", "Poland")).contains("Poland"))
    assert(Rules.modeLocation(Seq("France", "Poland")).contains("France")) // tie -> first
  }

  test("education: subsequence match with stopword removal, top-5 by length, priority") {
    val e = Rules.extractEducation("candidate should hold bachelor degree or master degree")
    assert(e.toSet == Set("bachelor degree", "master degree"))
    assert(Rules.priorityDegree(Seq("master degree", "bachelor degree")).contains("bachelor"))
    assert(Rules.priorityDegree(Seq("phd")).contains("phd"))
    // stopwords between phrase tokens break contiguity after filtering:
    // "bachelor of degree" -> tokens [bachelor, degree] still contiguous
    assert(Rules.extractEducation("need bachelor of degree").toSet == Set("bachelor degree"))
  }

  test("education one-pass scan == containsSubseq twin (fuzz incl. boundary straddles)") {
    // r6: extractEducation's first-token-indexed scan must agree with the
    // sliding-window containsSubseq shape on adversarial compositions —
    // full phrases, prefixes that dangle, phrases split by non-stopwords,
    // phrases re-joined by stopword removal, repeats, and phrase tokens
    // at string edges.
    val frags = Seq(
      "bachelor degree", "bachelor", "degree", "master", "science",
      "master business administration", "business administration master",
      "phd", "doctorate", "high school diploma", "school", "high",
      "secondary school certificate", "secondary", "certificate",
      "bachelor of degree", "bachelor the science", "graduate", "degree graduate",
      "vocational diploma engineering", "primary education", "elementary",
      "xyzzy", "und", "the of a", "")
    val rnd = new scala.util.Random(20260822L)
    (1 to 400).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(8))(frags(rnd.nextInt(frags.length))).mkString(" ")
      assert(Rules.extractEducation(s) == Rules.extractEducationSubseq(s), s"input: '$s'")
    }
    // deterministic edge pins
    Seq("", "phd", "phd phd phd", "doctoral degree doctorate phd bachelor degree master degree graduate degree",
        "high school diploma secondary school certificate vocational diploma").foreach { s =>
      assert(Rules.extractEducation(s) == Rules.extractEducationSubseq(s), s"input: '$s'")
    }
  }

  test("work hours: spans, am/pm ranges, intervals, defaults, lexicographic quirk") {
    val doc = "working time is 40 hour per week."
    assert(Rules.extractWorkHourSpans(doc) == Seq("40 hour"))
    assert(Rules.maxWorkHours(Rules.cleanedWorkHours(Seq("40 hour"))) == 40)
    // am/pm: 9-17 = 8h, weekly x4 = 32 (ProcessAndMergeInfo.py:354-399)
    assert(Rules.cleanedWorkHours(Seq("9am - 5pm")) == Seq(32))
    // interval without 'week': plain max, no x4
    assert(Rules.cleanedWorkHours(Seq("20-30 hour")) == Seq(30))
    // the reference's string-max quirk: max('9','17') == '9'
    assert(Rules.cleanedWorkHours(Seq("9-17 hour")) == Seq(9))
    // default normal hours phrasing -> 40 hours
    val d2 = "you can expect regular working hour at our office."
    assert(Rules.extractWorkHourSpans(d2) == Seq("40 hours"))
  }

  test("timeSpans scanner == Pattern twin (edge cases + seeded fuzz)") {
    val edges = Seq(
      "40 hours", "35-40 hours", "7.5 to 8.5 hours", "9am-5pm", "9 am - 5 pm",
      "9-5pm", "9.30am - 17.30pm", "8:30-16:30pm", "forty hours", "six hrs",
      "sixty hours", "tenhrs", "onehours", "sixty hourss", "5 hoursx",
      "program in amsterdam", "3am-4", "12-34-5hours", "5.5.5 hours",
      "9am am - 5pm", "work 38 hrs weekly, shifts 10pm-6am", "0 hours",
      "twenty to thirty hours", "5 to- 6 hours", "5- 6hrs", "", "hrs", "am-pm",
      "66hrs6", "6hrs6", "9-5.30pms", "9-5.3am0", "five hrs and ten hours")
    edges.foreach { s =>
      assert(Rules.timeSpans(s) == Rules.timeSpansRegex(s), s"edge: '$s'")
    }
    // fuzz from a trap-rich vocabulary (digit runs, separators, am/pm,
    // hour words, decoys that contain the literal gate strings)
    val vocab = Seq("40", "9", "5.5", "8:30", "12", "hours", "hour", "hrs",
      "hourss", "to", "-", "am", "pm", "ams", "amp", "program", "six", "sixty",
      "ten", "forty", ".", ":", " ", "work", "x", "7", "", "tenhrs")
    val rnd = new scala.util.Random(424242)
    (1 to 4000).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(Seq("", " ", "  ")(rnd.nextInt(3)))
      assert(Rules.timeSpans(s) == Rules.timeSpansRegex(s), s"fuzz: '$s'")
    }
  }

  test("yearly salary normalization") {
    // monthly with estimate: x12 when closer to the estimate
    assert(Rules.yearlySalary(Seq(3000.0), Seq("euro"), Some("Germany"), Some(40000.0)) == Seq(36000.0))
    // yearly with estimate: stays
    assert(Rules.yearlySalary(Seq(45000.0), Seq("euro"), Some("Germany"), Some(40000.0)) == Seq(45000.0))
    // no estimate: x12 iff <= 10000
    assert(Rules.yearlySalary(Seq(3000.0), Seq("euro"), None, None) == Seq(36000.0))
    assert(Rules.yearlySalary(Seq(45000.0), Seq("euro"), None, None) == Seq(45000.0))
    // non-euro converts at the fixture rate before the monthly decision
    assert(Rules.yearlySalary(Seq(50000.0), Seq("usd"), Some("Germany"), Some(44000.0)) == Seq(45000.0))
    // > 1M is dropped
    assert(Rules.yearlySalary(Seq(2000000.0), Seq("euro"), None, None).isEmpty)
    // multiple -> closest to estimate
    assert(Rules.yearlySalary(Seq(45000.0, 55000.0), Seq("euro"), None, Some(54000.0)) == Seq(55000.0))
  }

  test("date extraction (X5): span forms, stoplist, first-occurrence dedup") {
    assert(Rules.extractDates("the position starts on 1 march 2026.") == Seq("1 march 2026"))
    assert(Rules.extractDates("please apply before 15.04.2026.") == Seq("15.04.2026"))
    assert(Rules.extractDates("open from january 2027 onwards") == Seq("january 2027"))
    // stoplist parity with checkDateConditions (ExtractInfo.py:620-624):
    // generic words alone are not dates
    assert(Rules.extractDates("any day or month or year now").isEmpty)
    // no bare month without year (pattern requires the year anchor)
    assert(Rules.extractDates("sometime in march maybe").isEmpty)
    // dedup keeps first occurrence
    assert(Rules.extractDates("before 1 may 2026 yes 1 may 2026") == Seq("1 may 2026"))
  }

  test("org mention extraction filters") {
    assert(Rules.extractOrgs("We are hiring at Acme Industries GmbH.") == Seq("Acme Industries GmbH"))
    assert(Rules.extractOrgs("Based in London, United Kingdom.").isEmpty) // country blocklist
    assert(Rules.extractOrgs("See Http Www for details.").isEmpty)
  }

  test("surroundingWords window") {
    val sw = Rules.surroundingWords("the salary is 45000 per year total", "45000", 2)
    assert(sw.contains("salary is 45000 per year"))
  }
}

package graft.sources

import scala.util.hashing.MurmurHash3

/** Broadcast-scale dimension fixtures.
  *
  * The reference engine loads these from downloaded CSVs / text files
  * (ESCO skills + occupations at /root/reference/extract-info/utilities.py:313-317,
  * keyword lists at ExtractInfo.py:41-104, degree CSVs at ExtractMain.py:15-22,
  * country + currency lists at ExtractInfo.py:107-118). Per FIXTURES.md §3 we
  * replace them with small deterministic in-code tables embedding known facts
  * so golden triples are derivable by construction. Everything here is
  * broadcast-sized (<< 8 MB) by design — at 100 TB fact scale these stay on
  * the broadcast path, never a shuffle side.
  */
object Dims {

  // ------------------------------------------------------------------
  // Employment type (ExtractInfo.py:41-48)
  // ------------------------------------------------------------------
  val fullTime: Seq[String] = Seq("full time", "fulltime", "permanent job", "permanent position",
    "fixed contract", "fixed job", "fixed term", "fixed position", "regular position", "regular job")
  val partTime: Seq[String] = Seq("part time", "parttime", "oddjob", "odd job", "casual job",
    "casual position", "seasonal job", "minijob", "mini job", "irregular job", "temporary position", "temporary job")
  val internship: Seq[String] = Seq("internship", "internee", "traineeship", "trainee",
    "apprentices", "apprentice", "apprenticeship")
  val freelancing: Seq[String] = Seq("freelance", "freelancer", "freelancing")
  val zeroHour: Seq[String] = Seq("zero hour")

  /** group label -> surface keywords; order = reference's membership-check
    * order (ExtractInfo.py:562-575).
    */
  val employmentGroups: Seq[(String, Seq[String])] = Seq(
    "full-time" -> fullTime, "part-time" -> partTime, "internship" -> internship,
    "freelancing" -> freelancing, "zero-hour" -> zeroHour)

  val employmentKeywords: Seq[String] = employmentGroups.flatMap(_._2)

  /** ProcessAndMergeInfo.py:27 — min index wins. */
  val employmentPriority: Seq[String] =
    Seq("full-time", "part-time", "internship", "freelancing", "zero-hour")

  // ------------------------------------------------------------------
  // Salary + currency (ExtractInfo.py:53-66)
  // ------------------------------------------------------------------
  val salaryCombinations: Seq[(String, String)] = for {
    period <- Seq("hour", "week", "month", "year", "annual")
    word <- Seq("income", "salary", "payment")
  } yield (period, word)

  val salaryCommonKeywords: Seq[String] = Seq("remuneration", "salary", "compensation", "earnings",
    "emolument", "gross", "incentive", "paycheck", "remunerated", "reward", "stipend", "salaries", "wages")

  val monthNames: Seq[String] = Seq("january", "february", "march", "april", "may", "june", "july",
    "august", "september", "october", "november", "december",
    "jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec")

  /** Currency word/symbol -> canonical name, mirroring getCurrency
    * (ExtractInfo.py:370-386): word list wins over bare symbols; output
    * normalized to euro/usd/gbp.
    */
  val currencyWords: Map[String, String] = Map(
    "euro" -> "euro", "euros" -> "euro", "eur" -> "euro",
    "usd" -> "usd", "dollar" -> "usd", "dollars" -> "usd",
    "gbp" -> "gbp", "pound" -> "gbp", "pounds" -> "gbp", "sterling" -> "gbp",
    "chf" -> "chf", "franc" -> "chf", "francs" -> "chf",
    "sek" -> "sek", "krona" -> "sek", "kronor" -> "sek",
    "pln" -> "pln", "zloty" -> "pln",
    "dkk" -> "dkk", "czk" -> "czk", "huf" -> "huf", "forint" -> "huf",
    "ron" -> "ron", "nok" -> "nok", "krone" -> "nok")
  val currencySymbols: Map[String, String] = Map("€" -> "euro", "$" -> "usd", "£" -> "gbp")

  /** FX to EUR for yearly normalization (reference uses
    * currency_converter's live table, ProcessAndMergeInfo.py:281-297;
    * fixture pins deterministic rates).
    */
  val fxToEur: Map[String, Double] = Map(
    "euro" -> 1.0, "usd" -> 0.9, "gbp" -> 1.15, "chf" -> 1.05, "sek" -> 0.09,
    "pln" -> 0.23, "dkk" -> 0.13, "czk" -> 0.04, "huf" -> 0.0025, "ron" -> 0.2, "nok" -> 0.09)

  // ------------------------------------------------------------------
  // Work hours (ExtractInfo.py:67-104)
  // ------------------------------------------------------------------
  val workHoursCombinations: Seq[(String, String)] = Seq(
    ("day", "hour"), ("days", "hour"), ("day", "hours"), ("days", "hours"),
    ("week", "hour"), ("weeks", "hour"), ("week", "hours"), ("weeks", "hours"),
    ("month", "hour"), ("months", "hour"), ("month", "hours"), ("months", "hours"),
    ("full time", "hours"), ("full time", "hour"))

  val workHoursCommonKeywords: Seq[String] = Seq(
    "business hours", "company time", "duty times", "employment period", "five day week",
    "hours of work", "hours work", "hours worked", "hours of employment", "labor hours",
    "length of time worked", "man hours", "office hours", "office hour", "overtime",
    "regular time", "regular timetable", "regular hours", "staff time", "working hours",
    "working hour", "working hour can be discussed", "working time", "work schedule",
    "work time", "workday", "working day", "working periods", "work days", "workdays",
    "flexible with working hour")

  val defaultNormalHoursStrings: Seq[String] = Seq(
    "regular working hour", "regular office hour", "regular operation hour", "regular business hour",
    "normal working hour", "normal office hour", "normal operation hour", "normal business hour",
    "standard working hour", "standard office hour", "standard operation hour", "standard business hour")

  // ------------------------------------------------------------------
  // Countries (gazetteer — replaces spaCy GPE + geograpy, ExtractInfo.py:536-555)
  // ------------------------------------------------------------------
  final case class Country(name: String, iso2: String, currency: String, cities: Seq[String])

  val countries: Seq[Country] = Seq(
    Country("Germany", "DE", "euro", Seq("berlin", "munich", "hamburg", "frankfurt")),
    Country("France", "FR", "euro", Seq("paris", "lyon", "marseille")),
    Country("Spain", "ES", "euro", Seq("madrid", "barcelona", "valencia")),
    Country("Italy", "IT", "euro", Seq("rome", "milan", "turin")),
    Country("Netherlands", "NL", "euro", Seq("amsterdam", "rotterdam", "utrecht")),
    Country("Belgium", "BE", "euro", Seq("brussels", "antwerp")),
    Country("Austria", "AT", "euro", Seq("vienna", "graz")),
    Country("Ireland", "IE", "euro", Seq("dublin", "cork")),
    Country("Portugal", "PT", "euro", Seq("lisbon", "porto")),
    Country("Finland", "FI", "euro", Seq("helsinki", "tampere")),
    Country("Greece", "GR", "euro", Seq("athens", "thessaloniki")),
    Country("Poland", "PL", "pln", Seq("warsaw", "krakow", "wroclaw")),
    Country("Sweden", "SE", "sek", Seq("stockholm", "gothenburg")),
    Country("Denmark", "DK", "dkk", Seq("copenhagen", "aarhus")),
    Country("Czechia", "CZ", "czk", Seq("prague", "brno")),
    Country("Hungary", "HU", "huf", Seq("budapest", "debrecen")),
    Country("Romania", "RO", "ron", Seq("bucharest", "cluj")),
    Country("Norway", "NO", "nok", Seq("oslo", "bergen")),
    Country("Switzerland", "CH", "chf", Seq("zurich", "geneva", "basel")),
    Country("United Kingdom", "GB", "gbp", Seq("london", "manchester", "edinburgh")))

  /** lowercase surface -> country display name (name, cities). */
  val gazetteer: Map[String, String] =
    countries.flatMap(c => (c.name.toLowerCase +: c.cities).map(_ -> c.name)).toMap

  val countryByName: Map[String, Country] = countries.map(c => c.name -> c).toMap

  // ------------------------------------------------------------------
  // Degrees (ExtractMain.py:15-22; phrases chosen clean-invariant and
  // stopword-free so the reference's exact-membership mapping quirk
  // (ProcessAndMergeInfo.py:494-501) still resolves — see SURVEY §7.4)
  // ------------------------------------------------------------------
  val degreePriority: Seq[String] = Seq("primary", "secondary", "diploma", "bachelor", "masters", "phd")

  val degreePhrases: Map[String, Seq[String]] = Map(
    "primary" -> Seq("primary education", "elementary education"),
    "secondary" -> Seq("secondary education", "high school diploma", "secondary school certificate"),
    "diploma" -> Seq("vocational diploma", "technical diploma", "engineering diploma"),
    "bachelor" -> Seq("bachelor degree", "bachelor science", "bachelor engineering", "undergraduate degree"),
    "masters" -> Seq("master degree", "master science", "master business administration", "graduate degree"),
    "phd" -> Seq("phd", "doctoral degree", "doctorate"))

  val allDegreePhrases: Seq[String] = degreePriority.flatMap(degreePhrases)

  /** phrase -> level (exact membership as the reference does). */
  val degreeLevelOf: Map[String, String] =
    degreePhrases.flatMap { case (lvl, ps) => ps.map(_ -> lvl) }

  // ------------------------------------------------------------------
  // Skills (ESCO-like; utilities.py:790-898)
  // ------------------------------------------------------------------
  final case class Skill(label: String, alts: Seq[String])

  val skills: Seq[Skill] = Seq(
    Skill("python programming", Seq("python")),
    Skill("java programming", Seq("java")),
    Skill("scala programming", Seq("scala")),
    Skill("sql databases", Seq("sql")),
    Skill("web development", Seq("javascript", "frontend development")),
    Skill("cloud computing", Seq("cloud infrastructure")),
    Skill("machine learning", Seq("deep learning")),
    Skill("data analysis", Seq("data analytics")),
    Skill("statistics", Seq("statistical modelling")),
    Skill("project management", Seq("agile methods")),
    Skill("communication skills", Seq("stakeholder communication")),
    Skill("customer service", Seq("client support")),
    Skill("sales negotiation", Seq("closing deals")),
    Skill("marketing strategy", Seq("brand management")),
    Skill("graphic design", Seq("adobe photoshop")),
    Skill("network administration", Seq("network configuration")),
    Skill("cybersecurity", Seq("information security")),
    Skill("nursing care", Seq("patient care")),
    Skill("medical documentation", Seq("clinical records")),
    Skill("truck driving", Seq("heavy vehicle operation")),
    Skill("route planning", Seq("logistics planning")),
    Skill("accounting", Seq("bookkeeping")),
    Skill("financial reporting", Seq("balance sheets")),
    Skill("tax preparation", Seq("tax filing")),
    Skill("teaching", Seq("lesson planning")),
    Skill("curriculum development", Seq("course design")),
    Skill("welding", Seq("arc welding")),
    Skill("metal fabrication", Seq("sheet metal work")),
    Skill("quality inspection", Seq("quality control")),
    Skill("warehouse operations", Seq("inventory management")),
    // linked to NO occupation (popularity 0): its "quality control" alt
    // collides with quality inspection's, exercising the A7 ambiguous-
    // surface resolution below without perturbing the generator (facts
    // only plant skills reachable from occupation relation lists)
    Skill("quality assurance", Seq("quality control", "qa audits")))

  /** A7 — skill popularity: (occupation, skill) relation-row count per
    * preferred label across essential+optional lists (utilities.py:363-380
    * accumulates skill_popularity once per relation row). Skills linked to
    * no occupation have no entry (resolved as 0).
    */
  lazy val skillPopularity: Map[String, Int] =
    occupations.flatMap(o => o.essential ++ o.optional)
      .groupBy(identity).view.mapValues(_.size).toMap

  /** surface -> candidate preferred labels, skills-list order (the
    * reference appends candidates in dict-build order, utilities.py:828-841).
    */
  val skillSurfaceCandidates: Map[String, Seq[String]] =
    skills.flatMap(s => (s.label +: s.alts).map(_ -> s.label))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap

  /** surface (preferred or alt) -> preferred label. Ambiguous surfaces
    * resolve to the candidate with the highest popularity — strict
    * first-max in candidate order, absent popularity counts 0
    * (utilities.py:843-857).
    */
  // lazy: popularity needs `occupations`, declared below (object init order)
  lazy val skillSurfaceToPreferred: Map[String, String] =
    skillSurfaceCandidates.view.mapValues { cands =>
      var best: String = null
      var count = -1
      cands.foreach { v =>
        val p = skillPopularity.getOrElse(v, 0)
        if (p > count) { best = v; count = p }
      }
      best
    }.toMap

  // ------------------------------------------------------------------
  // Occupations (ISCO-like 3-digit codes; utilities.py:313-398)
  // ------------------------------------------------------------------
  final case class Occupation(isco3: String, name: String, alts: Seq[String],
      essential: Seq[String], optional: Seq[String], nace: String)

  val occupations: Seq[Occupation] = Seq(
    Occupation("251", "software engineer", Seq("software developer", "backend developer"),
      Seq("python programming", "java programming", "sql databases", "web development"),
      Seq("cloud computing", "scala programming"), "J"),
    Occupation("252", "network administrator", Seq("systems administrator"),
      Seq("network administration", "cybersecurity"),
      Seq("cloud computing", "sql databases"), "J"),
    Occupation("212", "data scientist", Seq("machine learning engineer"),
      Seq("machine learning", "data analysis", "statistics", "python programming"),
      Seq("sql databases", "cloud computing"), "M"),
    Occupation("241", "accountant", Seq("financial accountant"),
      Seq("accounting", "financial reporting"),
      Seq("tax preparation", "data analysis"), "M"),
    Occupation("242", "management consultant", Seq("business consultant"),
      Seq("project management", "communication skills"),
      Seq("data analysis", "marketing strategy"), "M"),
    Occupation("222", "nurse", Seq("registered nurse", "staff nurse"),
      Seq("nursing care", "medical documentation"),
      Seq("communication skills", "customer service"), "Q"),
    Occupation("833", "truck driver", Seq("delivery driver", "lorry driver"),
      Seq("truck driving", "route planning"),
      Seq("warehouse operations", "quality inspection"), "H"),
    Occupation("432", "warehouse clerk", Seq("logistics clerk"),
      Seq("warehouse operations", "route planning"),
      Seq("quality inspection", "customer service"), "H"),
    Occupation("233", "teacher", Seq("secondary school teacher"),
      Seq("teaching", "curriculum development"),
      Seq("communication skills", "project management"), "P"),
    Occupation("122", "sales manager", Seq("regional sales manager"),
      Seq("sales negotiation", "customer service"),
      Seq("marketing strategy", "communication skills"), "G"),
    Occupation("243", "marketing specialist", Seq("marketing manager"),
      Seq("marketing strategy", "communication skills"),
      Seq("graphic design", "sales negotiation"), "G"),
    Occupation("216", "graphic designer", Seq("visual designer"),
      Seq("graphic design", "web development"),
      Seq("marketing strategy", "communication skills"), "J"),
    Occupation("721", "welder", Seq("metal welder"),
      Seq("welding", "metal fabrication"),
      Seq("quality inspection", "warehouse operations"), "C"),
    Occupation("422", "customer service agent", Seq("call centre agent"),
      Seq("customer service", "communication skills"),
      Seq("sales negotiation", "sql databases"), "G"))

  val occupationByIsco: Map[String, Occupation] = occupations.map(o => o.isco3 -> o).toMap

  // ------------------------------------------------------------------
  // NACE sections (utilities.py:272 NACE_CODE_TO_SEC); order = node order
  // (argmax first-wins tie-break).
  // ------------------------------------------------------------------
  val naceSections: Seq[(String, String)] = Seq(
    "C" -> "Manufacturing",
    "G" -> "Wholesale and retail trade",
    "H" -> "Transportation and storage",
    "J" -> "Information and communication",
    "M" -> "Professional scientific and technical activities",
    "P" -> "Education",
    "Q" -> "Human health and social work activities")

  val naceName: Map[String, String] = naceSections.toMap

  // ------------------------------------------------------------------
  // Salaries dim — deterministic monthly salary for every
  // (country, isco3) pair (replaces Salaries.csv, utilities.py:317,733).
  // ------------------------------------------------------------------
  /** Monthly salary in the country's local currency family — stable hash,
    * range 1500..5400.
    */
  def monthlySalary(iso2: String, isco3: String): Double = {
    val h = math.abs(MurmurHash3.stringHash(iso2 + ":" + isco3, 42))
    1500.0 + (h % 40) * 100.0
  }

  // ------------------------------------------------------------------
  // Job-title dictionary (replaces jobs.txt, setup/setup.py:44-45)
  // ------------------------------------------------------------------
  val titleDict: Seq[String] =
    occupations.flatMap(o => o.name +: o.alts).distinct

  // ------------------------------------------------------------------
  // Deterministic token embeddings (replaces GoogleNews word2vec,
  // utilities.py:905) — pruned to the title dictionary token closure as
  // SURVEY §4 mandates. Tokens of the same occupation cluster by
  // construction, so `furthest` outlier pruning (utilities.py:1003-1011)
  // behaves like the reference's semantic pruning.
  // ------------------------------------------------------------------
  val embeddingDim = 16

  private def hashNoise(token: String, d: Int): Float =
    ((MurmurHash3.stringHash(token, 7 + d) % 1000) / 10000.0f)

  /** token -> vector: unit basis of its occupation group + small hash noise;
    * tokens shared across occupations average their groups' bases.
    */
  lazy val embeddings: Map[String, Array[Float]] = {
    val tokenGroups: Map[String, Seq[Int]] = occupations.zipWithIndex
      .flatMap { case (o, i) => (o.name +: o.alts).flatMap(_.split(' ')).distinct.map(_ -> i) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    tokenGroups.map { case (tok, groups) =>
      val v = Array.fill(embeddingDim)(0.0f)
      groups.foreach { g => v(g % embeddingDim) += 1.0f / groups.size }
      (0 until embeddingDim).foreach(d => v(d) += hashNoise(tok, d))
      tok -> v
    }
  }

  // ------------------------------------------------------------------
  // Organizations (ORG gazetteer, X4 — the shipped reference config
  // disables spaCy ORG extraction (ExtractInfo.py:133); ours keeps it on
  // to feed the entity-linking stage mandated by the north_rule).
  // ------------------------------------------------------------------
  val orgs: Seq[String] = Seq(
    "Acme Industries", "Globex Corporation", "Initech Solutions", "Umbrella Logistics",
    "Stark Manufacturing", "Wayne Consulting", "Cyberdyne Systems", "Tyrell Healthcare",
    "Wonka Foods", "Hooli Technologies", "Vandelay Imports", "Soylent Analytics")

  /** Legal-suffix noise used by the generator to exercise entity linking. */
  // NOTE: the transcript generator only draws suffix indices 1-3 (one
  // nextInt(3) — widening the draw would shift every later RNG draw and
  // churn all seed-pinned fixtures); the dotted " B.V."/" S.A." variants,
  // whose punctuation interacts with the clean chain, are exercised
  // directly by the linking spec instead
  val orgSuffixes: Seq[String] = Seq("", " GmbH", " Ltd", " Inc", " B.V.", " S.A.")

  // ------------------------------------------------------------------
  // Lemma dictionary (WordNet subset for the fixture vocabulary;
  // replaces per-token WordNetLemmatizer, ExtractInfo.py:203-205)
  // ------------------------------------------------------------------
  val lemmas: Map[String, String] = Map(
    "hours" -> "hour", "days" -> "day", "weeks" -> "week", "months" -> "month",
    "years" -> "year", "salaries" -> "salary", "wages" -> "wage", "skills" -> "skill",
    "positions" -> "position", "jobs" -> "job", "degrees" -> "degree", "masters" -> "master",
    "bachelors" -> "bachelor", "euros" -> "euro", "dollars" -> "dollar", "pounds" -> "pound",
    "candidates" -> "candidate", "requirements" -> "requirement", "benefits" -> "benefit",
    "responsibilities" -> "responsibility", "applications" -> "application",
    "qualifications" -> "qualification", "teams" -> "team", "projects" -> "project",
    "clients" -> "client", "systems" -> "system", "services" -> "service",
    "databases" -> "database", "apprentices" -> "apprentice", "trainees" -> "trainee")

  // ------------------------------------------------------------------
  // Stopwords (sklearn 'english' subset covering fixture vocabulary;
  // used by education n-gram matching, ExtractInfo.py:652-655)
  // ------------------------------------------------------------------
  val stopwords: Set[String] = Set(
    "a", "about", "above", "after", "again", "all", "also", "am", "an", "and", "any", "are",
    "as", "at", "be", "because", "been", "before", "being", "below", "between", "both", "but",
    "by", "can", "could", "did", "do", "does", "doing", "down", "during", "each", "few", "for",
    "from", "further", "had", "has", "have", "having", "he", "her", "here", "hers", "him",
    "his", "how", "i", "if", "in", "into", "is", "it", "its", "just", "me", "more", "most",
    "my", "no", "nor", "not", "now", "of", "off", "on", "once", "only", "or", "other", "our",
    "out", "over", "own", "per", "same", "she", "should", "so", "some", "such", "than", "that",
    "the", "their", "them", "then", "there", "these", "they", "this", "those", "through", "to",
    "too", "under", "until", "up", "very", "was", "we", "were", "what", "when", "where",
    "which", "while", "who", "whom", "why", "will", "with", "would", "you", "your")

  /** Tool names the generator plants in the `tool` column (new surface —
    * tool-call entity mentions per the north_star).
    */
  val toolNames: Seq[String] = Seq("search_jobs", "fetch_posting", "translate", "geo_lookup", "salary_db")
}

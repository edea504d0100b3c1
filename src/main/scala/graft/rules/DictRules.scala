package graft.rules

import java.util.regex.Pattern

import graft.sources.Dims

/** Aho-Corasick multi-pattern matcher (standard algorithm: trie + BFS
  * failure links). Replaces the reference's pyahocorasick automata over the
  * job-title and skill dictionaries (/root/reference/extract-info/
  * utilities.py:884-894,984-1000). Immutable after construction →
  * broadcast-able; scan is O(|text| + hits) so a 100 TB corpus pays one
  * linear pass per document regardless of dictionary size.
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  val pats: Array[String] = patterns.toArray

  // frozen transition tables (r6): the construction-time boxed
  // mutable.Maps are dropped after build; the scan loop does a primitive
  // binary search over each node's sorted child chars instead of boxed
  // Map lookups (AhoCorasick.scan was a top-5 kernel frame in kg
  // thread-dump sampling). Also ~4x smaller when broadcast.
  private val frozen: (Array[Array[Char]], Array[Array[Int]], Array[Int],
    Array[Array[Int]]) = AhoCorasick.build(pats)
  private val childChars = frozen._1
  private val childNext = frozen._2
  private val failArr = frozen._3
  private val outArr = frozen._4

  @inline private def next(node: Int, ch: Char): Int = {
    val cs = childChars(node)
    var lo = 0
    var hi = cs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = cs(mid)
      if (c == ch) return childNext(node)(mid)
      else if (c < ch) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** all matches as (endIndexInclusive, pattern), in end-position order —
    * the contract of pyahocorasick's `Automaton.iter`.
    */
  def scan(text: String): Seq[(Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      var t = next(node, ch)
      while (node != 0 && t < 0) { node = failArr(node); t = next(node, ch) }
      node = if (t >= 0) t else 0
      val o = outArr(node)
      if (o.length > 0) {
        var j = 0
        while (j < o.length) { out += ((i, pats(o(j)))); j += 1 }
      }
      i += 1
    }
    out.toSeq
  }
}

object AhoCorasick {
  import scala.collection.mutable

  /** Standard trie + BFS failure-link construction (unchanged semantics
    * from the r5 in-class builder), frozen to sorted-child-array form.
    */
  private def build(pats: Array[String]): (Array[Array[Char]],
      Array[Array[Int]], Array[Int], Array[Array[Int]]) = {
    val gotoMaps = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outputs = mutable.ArrayBuffer(List.empty[Int])
    val fails = mutable.ArrayBuffer(0)
    pats.zipWithIndex.foreach { case (p, idx) =>
      var node = 0
      p.foreach { ch =>
        node = gotoMaps(node).getOrElseUpdate(ch, {
          gotoMaps += mutable.Map.empty[Char, Int]
          outputs += Nil
          fails += 0
          gotoMaps.size - 1
        })
      }
      outputs(node) = idx :: outputs(node)
    }
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).values.foreach { c => fails(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoMaps(r).foreach { case (ch, u) =>
        queue += u
        var v = fails(r)
        while (v != 0 && !gotoMaps(v).contains(ch)) v = fails(v)
        fails(u) = gotoMaps(v).getOrElse(ch, 0)
        if (fails(u) == u) fails(u) = 0
        outputs(u) = outputs(u) ::: outputs(fails(u))
      }
    }
    val n = gotoMaps.length
    val childChars = new Array[Array[Char]](n)
    val childNext = new Array[Array[Int]](n)
    val outArr = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val sorted = gotoMaps(i).toArray.sortBy(_._1)
      childChars(i) = sorted.map(_._1)
      childNext(i) = sorted.map(_._2)
      outArr(i) = outputs(i).toArray // preserves list order (hit order)
      i += 1
    }
    (childChars, childNext, fails.toArray, outArr)
  }
}

/** Dictionary-branch semantics: job title (X12), ESCO skills (X13/X14),
  * sector (X15), estimated salary (X16). Pure and broadcast-friendly.
  */
object DictRules {

  // ------------------------------------------------------------------
  // Branch-3 Preprocessor (utilities.py:144-240, mode 2): strip tags,
  // printable-only, delete parenthesised content, collapse whitespace.
  // ------------------------------------------------------------------
  private val pParens = Pattern.compile("[\\[(].*?[\\])]")
  private val pTags = Pattern.compile("<[^>]+>")
  private val pWs = Pattern.compile("\\s+")

  /** Scanner form (regex-free — preprocess runs once per CONVERSATION over
    * the full text, the conv-stage hot path); pinned to [[preprocessRegex]]
    * by DictRulesSpec fuzz.
    */
  def preprocess(s: String): String = {
    if (s == null) return ""
    var d = CleanScan.stripTagsSpace(s)
    d = d.filter(c => c >= ' ' && c < 127 || c.isWhitespace)
    d = CleanScan.dropParensSpans(d)
    CleanScan.collapseWs(d).trim
  }

  /** Pattern twin of [[preprocess]] (differential pin only). */
  private[graft] def preprocessRegex(s: String): String = {
    if (s == null) return ""
    var d = pTags.matcher(s).replaceAll(" ")
    d = d.filter(c => c >= ' ' && c < 127 || c.isWhitespace)
    d = pParens.matcher(d).replaceAll(" ")
    pWs.matcher(d).replaceAll(" ").trim
  }

  // ------------------------------------------------------------------
  // Greedy non-overlap scan with whole-word re-verify
  // (utilities.py:861-882 / :918-923)
  // ------------------------------------------------------------------
  /** \bW\b CASE_INSENSITIVE find — scanner (the Pattern variant compiled a
    * fresh regex per call: ~200 compilations per conversation through
    * filterSkillsByTitle × greedyMatches). Pinned to
    * [[findWholeWordRegex]] by DictRulesSpec fuzz.
    */
  private[graft] def findWholeWord(w: String, s: String): Boolean =
    Rules.indexOfBoundedCI(s, w) >= 0

  /** Pattern twin of [[findWholeWord]] (differential pin only). */
  private[graft] def findWholeWordRegex(w: String, s: String): Boolean =
    Pattern.compile("\\b" + Pattern.quote(w) + "\\b", Pattern.CASE_INSENSITIVE)
      .matcher(s).find()

  def greedyMatches(ac: AhoCorasick, text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    ac.scan(text).foreach { case (end, kw) =>
      if (findWholeWord(kw, text.substring(math.min(start, text.length)))) {
        out += kw
        start = end + 1
      }
    }
    out.toSeq
  }

  lazy val titleAutomaton: AhoCorasick = new AhoCorasick(Dims.titleDict)
  lazy val skillAutomaton: AhoCorasick = new AhoCorasick(Dims.skillSurfaceToPreferred.keys.toSeq.sorted)

  // ------------------------------------------------------------------
  // X12 — job title: greedy matches → embedding outlier pruning →
  // containment tie-break (utilities.py:901-968, furthest :1003-1011)
  // ------------------------------------------------------------------
  private def phraseVector(phrase: String): Option[Array[Float]] = {
    val toks = phrase.split(' ')
    Dims.embeddings.get(toks.head).map { first =>
      val v = first.clone()
      toks.tail.foreach { t =>
        Dims.embeddings.get(t).foreach(w => (0 until v.length).foreach(d => v(d) += w(d)))
      }
      v
    }
  }

  private def cosineDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
  }

  private def furthest(vectors: Seq[Array[Float]]): Int =
    vectors.indices.maxBy(i => vectors.map(v => math.abs(cosineDist(vectors(i), v))).sum)

  def extractTitle(adLower: String): String = {
    var matches = greedyMatches(titleAutomaton, adLower)
    var vectors = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val keep = scala.collection.mutable.ArrayBuffer.empty[String]
    matches.foreach { m =>
      phraseVector(m) match {
        case Some(v) => vectors += v; keep += m
        case None => // token absent from vocab → drop the match (utilities.py:935-941)
      }
    }
    matches = keep.toSeq
    var vecs = vectors.toSeq
    while (vecs.length > 2) {
      val rm = furthest(vecs)
      vecs = vecs.patch(rm, Nil, 1)
      matches = matches.patch(rm, Nil, 1)
    }
    val res = matches match {
      case Seq(a, b) =>
        if (a == b) a
        else if (b.contains(a)) b
        else if (a.contains(b)) a
        else a
      case Seq(a) => a
      case _ => ""
    }
    if (res.isEmpty) "" else res.split(' ').map(_.capitalize).mkString(" ")
  }

  // ------------------------------------------------------------------
  // X13 — ESCO skill matching: greedy scan → surface -> preferred,
  // first-occurrence dedup (set-order pinned; utilities.py:861-882)
  // ------------------------------------------------------------------
  def extractSkills(adLower: String): Seq[String] =
    greedyMatches(skillAutomaton, adLower)
      .distinct
      .map(Dims.skillSurfaceToPreferred)
      .distinct

  // ------------------------------------------------------------------
  // X14 — filter skills by title (utilities.py:650-676)
  // ------------------------------------------------------------------
  def filterSkillsByTitle(title: String, skills: Seq[String]): Seq[String] = {
    if (title == null || title.isEmpty) return Seq.empty
    val toks = title.toLowerCase.split(' ').filterNot(Dims.stopwords).toSeq
    if (toks.isEmpty) return Seq.empty
    val skillset = scala.collection.mutable.HashSet.empty[String]
    Dims.occupations.foreach { occ =>
      def scoreOf(label: String): Double = {
        val hits = toks.count(w => findWholeWord(w, label))
        hits.toDouble / math.max(label.split(' ').length, toks.length)
      }
      val score = (occ.name +: occ.alts).map(scoreOf).max
      if (score > 0) { skillset ++= occ.essential; skillset ++= occ.optional }
    }
    skills.filter(skillset)
  }

  // ------------------------------------------------------------------
  // Taxonomy scoring (X15/X16): precomputed probability × information
  // weight tables over the propagated trees (SURVEY §2.7 A8/A9 — rollup
  // by code prefix replaces the reference's bottom-up dict propagation,
  // utilities.py:54-77,678-777).
  // ------------------------------------------------------------------

  /** (skill, count) relations under a group of occupations (+essential
    * +optional, each counting 1 like the leaf dicts).
    */
  private def skillCounts(occs: Seq[Dims.Occupation]): Map[String, Int] =
    occs.flatMap(o => o.essential ++ o.optional)
      .groupBy(identity).view.mapValues(_.size).toMap

  final case class Node(code: String, counts: Map[String, Int], total: Int)

  private def nodesAt(level: Int): Seq[Node] =
    Dims.occupations.groupBy(_.isco3.take(level)).toSeq.sortBy(_._1).map { case (code, occs) =>
      val c = skillCounts(occs)
      Node(code, c, c.values.sum)
    }

  lazy val iscoLevels: Seq[Seq[Node]] = (1 to 3).map(nodesAt)

  lazy val naceNodes: Seq[Node] =
    Dims.naceSections.map { case (code, _) =>
      val c = skillCounts(Dims.occupations.filter(_.nace == code))
      Node(code, c, c.values.sum)
    }

  /** 1 - entropy/log2(#level-1 nodes) over the level-1 skill distribution
    * (utilities.py:746-777; their normalizers are hardcoded log2(10)/log2(19),
    * ours derive from the fixture taxonomy).
    */
  private def information(skill: String, level1: Seq[Node]): Double = {
    val probs = level1.map(n => n.counts.getOrElse(skill, 0).toDouble / n.total)
    val ps = probs.sum
    if (ps == 0) return 1.0
    val norm = probs.map(_ / ps)
    val entropy = -norm.filter(_ > 0).map(p => p * math.log(p) / math.log(2)).sum
    1.0 - entropy / (math.log(level1.length) / math.log(2))
  }

  lazy val iscoInfo: Map[String, Double] = {
    val l1 = iscoLevels.head
    allSkillLabels.map(s => s -> information(s, l1)).toMap
  }
  lazy val naceInfo: Map[String, Double] =
    allSkillLabels.map(s => s -> information(s, naceNodes)).toMap

  private def allSkillLabels: Seq[String] = Dims.skills.map(_.label)

  /** Flat weight rows for the Spark broadcast-join implementation:
    * weight = P(skill | node) × information(skill).
    */
  lazy val naceWeightRows: Seq[(String, String, Double)] =
    for {
      n <- naceNodes
      (skill, cnt) <- n.counts.toSeq.sortBy(_._1)
    } yield (n.code, skill, cnt.toDouble / n.total * naceInfo(skill))

  lazy val iscoWeightRows: Seq[(Int, String, String, Double)] =
    for {
      (nodes, lvlIdx) <- iscoLevels.zipWithIndex
      n <- nodes
      (skill, cnt) <- n.counts.toSeq.sortBy(_._1)
    } yield (lvlIdx + 1, n.code, skill, cnt.toDouble / n.total * iscoInfo(skill))

  private def argmaxNode(nodes: Seq[Node], skills: Seq[String], info: Map[String, Double]): String =
    nodes.maxByPreservingOrder { n =>
      skills.map(s => n.counts.getOrElse(s, 0).toDouble / n.total * info.getOrElse(s, 0.0)).sum
    }.code

  private implicit class SeqOps(nodes: Seq[Node]) {
    /** first max wins — Python's score.index(max(score)). */
    def maxByPreservingOrder(f: Node => Double): Node = {
      var best = nodes.head; var bestScore = f(nodes.head)
      nodes.tail.foreach { n => val s = f(n); if (s > bestScore) { best = n; bestScore = s } }
      best
    }
  }

  /** get_sector (utilities.py:678-698). */
  def sector(skills: Seq[String]): String =
    Dims.naceName(argmaxNode(naceNodes, skills, naceInfo))

  /** 3-level ISCO walk (utilities.py:700-727). */
  def isco3(skills: Seq[String]): String = {
    var prefix = ""
    (1 to 3).foreach { lvl =>
      val candidates = iscoLevels(lvl - 1).filter(_.code.startsWith(prefix))
      prefix = argmaxNode(candidates, skills, iscoInfo)
    }
    prefix
  }

  /** estimate_salary (utilities.py:700-742): monthly dim × 12, converted
    * to EUR, int-truncated.
    */
  def estimateSalary(skills: Seq[String], location: Option[String]): Option[Int] =
    for {
      loc <- location
      country <- Dims.countryByName.get(loc)
    } yield {
      val code = isco3(skills)
      val amount = Dims.monthlySalary(country.iso2, code) * 12
      (amount * Dims.fxToEur(country.currency)).toInt
    }
}

package graft.rules

import scala.collection.mutable

/** X17 — the reference's DBSCAN skill-vector filter (`filter_skills`,
  * utilities.py:525-648). The call site (extractor.py:80) uses the X14
  * alternate, so this path is dead in the reference; it is ported here
  * to faithful semantics anyway so a user flipping the call back gets the
  * same behavior from this engine.
  *
  * Reference semantics, kept exactly:
  *  1. per skill, a probability vector over the LEVEL-1 taxonomy nodes:
  *     P(node) = (essential+optional count)/node total, then L1-normalized
  *     when the sum is positive (utilities.py:530-566);
  *  2. skills whose NACE or ISCO vector is all-zero are dropped first
  *     (utilities.py:569-581);
  *  3. only when MORE THAN TWO skills survive (utilities.py:584): an
  *     ε-sweep — eps starts at 0.1 and grows by 0.1 (double accumulation,
  *     like the Python float loop) for at most 10 fits of
  *     DBSCAN(eps, min_samples=2, metric=cosine); a fit whose labels are
  *     ALL zero (one cluster, no noise) stops the sweep WITHOUT being
  *     recorded unless it is the first (e > 0.1 guard) — so the labels
  *     used are those of the LAST eps that still discriminated;
  *  4. the NACE and ISCO sweeps run independently (each stops at its own
  *     eps); a skill is dropped iff it is noise (-1) at the last retained
  *     eps of EITHER sweep.
  *
  * DBSCAN with min_samples=2 degenerates to connected components of the
  * ε-neighborhood graph: any point with one neighbor is core, so there are
  * no border points and noise = isolated vertices. Labels are assigned in
  * first-core-point index order, matching sklearn's scan order. The
  * distributed shape is therefore per-posting local clustering (skill sets
  * are tens of elements over ~20-dim vectors) fanned out across postings —
  * the same shape as every other whole-document rule in this engine, and
  * the right one at 10^12-turn scale: no cross-posting shuffle exists in
  * the reference semantics.
  */
object SkillCluster {

  /** (essential+optional)/total per level-1 node, L1-normalized when the
    * mass is positive (utilities.py:543-566).
    */
  private[graft] def probVector(skill: String, nodes: Seq[DictRules.Node]): Array[Double] = {
    val v = new Array[Double](nodes.length)
    var i = 0
    var s = 0.0
    while (i < nodes.length) {
      val n = nodes(i)
      v(i) = n.counts.getOrElse(skill, 0).toDouble / n.total
      s += v(i)
      i += 1
    }
    if (s > 0) { i = 0; while (i < v.length) { v(i) /= s; i += 1 } }
    v
  }

  /** Both vectors for every skill in the fixture taxonomy, precomputed once
    * per JVM (the skill vocabulary is closed — extraction only ever emits
    * dictionary labels). Unknown strings fall back to on-the-fly vectors,
    * which are all-zero and thus dropped by the zero-norm gate.
    */
  private lazy val vecCache: Map[String, (Array[Double], Array[Double])] = {
    val nace = DictRules.naceNodes
    val isco = DictRules.iscoLevels.head
    graft.sources.Dims.skills.map(_.label)
      .map(s => s -> (probVector(s, nace), probVector(s, isco))).toMap
  }

  private def vectorsFor(skill: String): (Array[Double], Array[Double]) =
    vecCache.getOrElse(skill,
      (probVector(skill, DictRules.naceNodes), probVector(skill, DictRules.iscoLevels.head)))

  private def l2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  /** scipy.spatial.distance.cosine: 1 - u·v/(|u||v|). Callers guarantee
    * nonzero norms (the zero-norm gate runs first).
    */
  private[graft] def cosineDist(u: Array[Double], v: Array[Double]): Double = {
    var dot = 0.0; var i = 0
    while (i < u.length) { dot += u(i) * v(i); i += 1 }
    1.0 - dot / (l2(u) * l2(v))
  }

  /** sklearn DBSCAN(eps, min_samples=2, cosine) labels: connected
    * components of the `dist <= eps` graph in first-point scan order;
    * isolated points are -1.
    */
  private[graft] def dbscanLabels(vecs: IndexedSeq[Array[Double]], eps: Double): Array[Int] = {
    val n = vecs.length
    // n is tens at most (skills of ONE posting) — the dense O(n^2) distance
    // matrix is the fast path here, not a scale concern
    val dist = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = cosineDist(vecs(i), vecs(j))
        dist(i)(j) = d; dist(j)(i) = d
        j += 1
      }
      i += 1
    }
    val labels = Array.fill(n)(-2) // -2 = unvisited
    var next = 0
    i = 0
    while (i < n) {
      if (labels(i) == -2) {
        var hasNeighbor = false
        var j = 0
        while (j < n && !hasNeighbor) { if (j != i && dist(i)(j) <= eps) hasNeighbor = true; j += 1 }
        if (!hasNeighbor) labels(i) = -1
        else {
          labels(i) = next
          val queue = mutable.Queue(i)
          while (queue.nonEmpty) {
            val u = queue.dequeue()
            var k = 0
            while (k < n) {
              if (k != u && dist(u)(k) <= eps && labels(k) != next) {
                labels(k) = next
                queue.enqueue(k)
              }
              k += 1
            }
          }
          next += 1
        }
      }
      i += 1
    }
    labels
  }

  /** The ε-sweep (utilities.py:585-601): labels at the last retained eps.
    * Never null for n >= 1 — the first fit (e = 0.1) is always retained.
    */
  private[graft] def epsSweepLabels(vecs: IndexedSeq[Array[Double]]): Array[Int] = {
    var e = 0.1
    var last: Array[Int] = null
    var fits = 0
    var stopped = false
    while (fits < 10 && !stopped) {
      val labels = dbscanLabels(vecs, e)
      if (labels.forall(_ == 0) && e > 0.1) stopped = true
      else { last = labels; e += 0.1 }
      fits += 1
    }
    last
  }

  /** The whole X17 filter over one posting's skill list (order-preserving). */
  def filterSkills(skillsIn: Seq[String]): Seq[String] = {
    if (skillsIn.isEmpty) return skillsIn
    val vecs = skillsIn.map(vectorsFor)
    // zero-norm gate — the reference checks nace first then isco per index
    // (utilities.py:569-581); same membership as the OR
    val keep = skillsIn.indices.filter { i =>
      l2(vecs(i)._1) != 0.0 && l2(vecs(i)._2) != 0.0
    }
    var skills = keep.map(skillsIn)
    if (skills.length > 2) {
      val naceV = keep.map(i => vecs(i)._1).toIndexedSeq
      val iscoV = keep.map(i => vecs(i)._2).toIndexedSeq
      val nl = epsSweepLabels(naceV)
      val il = epsSweepLabels(iscoV)
      skills = skills.indices.collect {
        case i if nl(i) != -1 && il(i) != -1 => skills(i)
      }
    }
    skills
  }
}

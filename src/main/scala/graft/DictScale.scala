package graft

import org.apache.spark.sql.SparkSession

import graft.rules.{AhoCorasick, DictRules}
import graft.sources.{Dims, TranscriptGen}

/** Dictionary-scale evidence for the X13 skill scanner (reference: the
  * ESCO automaton covers ~13k surface forms, utilities.py:884-894; the
  * fixture dict is tens of entries). Runs greedyMatches over the same
  * turn corpus with the fixture dict and with a synthetic 13k-phrase dict
  * and prints both wall times: Aho-Corasick scan cost is O(text+matches),
  * so the big dict must not scale super-linearly with dict size.
  * Diagnostic main — results recorded in BENCH_SCALING.md.
  */
object DictScale {

  /** 13k two-word phrases over common-word pools, salted with the real
    * fixture surfaces so genuine hits occur in the generated text.
    */
  def syntheticDict(n: Int = 13000): Seq[String] = {
    val a = Seq("data", "software", "senior", "cloud", "network", "test",
      "product", "project", "machine", "deep", "web", "mobile", "system",
      "business", "digital", "agile", "quality", "customer", "service",
      "support", "field", "clinical", "retail", "logistics", "energy",
      "financial", "legal", "medical", "technical", "global", "smart",
      "secure", "rapid", "core", "open", "visual", "neural", "robotic",
      "virtual", "applied", "modern", "classic", "urban", "rural", "solar",
      "heavy", "light", "fast", "slow", "green", "blue", "lean", "prime",
      "micro", "macro", "hybrid", "remote", "onsite", "backend", "frontend",
      "fullstack", "embedded", "realtime", "batch", "stream", "graph",
      "vector", "tensor", "quantum", "spatial", "temporal", "causal",
      "static", "dynamic", "linear", "sparse", "dense", "robust", "scalable",
      "portable", "modular", "atomic", "parallel", "serial", "binary",
      "decimal", "optical", "acoustic", "thermal", "chemical", "electric",
      "magnetic", "organic", "synthetic", "natural", "manual", "automated",
      "assisted", "guided", "managed", "shared", "private", "public")
    val b = Seq("engineering", "analysis", "design", "testing", "operations",
      "management", "development", "research", "planning", "modeling",
      "automation", "integration", "migration", "deployment", "monitoring",
      "optimization", "visualization", "classification", "regression",
      "clustering", "forecasting", "simulation", "validation", "auditing",
      "reporting", "budgeting", "negotiation", "communication", "leadership",
      "training", "coaching", "recruiting", "sourcing", "procurement",
      "assembly", "welding", "machining", "inspection", "maintenance",
      "repair", "installation", "calibration", "diagnostics", "logistics",
      "warehousing", "dispatching", "scheduling", "invoicing", "accounting",
      "compliance", "governance", "security", "cryptography", "networking",
      "virtualization", "containers", "orchestration", "pipelines",
      "architecture", "prototyping", "documentation", "localization",
      "translation", "copywriting", "editing", "publishing", "marketing",
      "advertising", "branding", "merchandising", "pricing", "selling",
      "consulting", "strategy", "transformation", "innovation", "quality",
      "safety", "ergonomics", "sustainability", "recycling", "farming",
      "harvesting", "irrigation", "nursing", "therapy", "radiology",
      "surgery", "pharmacy", "dentistry", "teaching", "tutoring",
      "assessment", "curriculum", "administration", "litigation",
      "arbitration", "underwriting", "actuarial", "brokerage", "trading",
      "settlement", "custody", "taxation", "payroll", "benefits",
      "onboarding", "retention", "analytics", "engineering2", "support",
      "operations2", "services", "systems", "platforms", "frameworks",
      "libraries", "databases", "warehouses", "lakes", "meshes")
    val fixture = Dims.skillSurfaceToPreferred.keys.toSeq.sorted
    val synth = for {
      i <- 0 until (n - fixture.size)
    } yield s"${a(i % a.size)} ${b((i / a.size) % b.size)} ${i / (a.size * b.size) match {
      case 0 => "skills"
      case k => s"level$k"
    }}"
    (fixture ++ synth.distinct).distinct
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "40000").toLong
    implicit val spark: SparkSession = Sessions.local(cpus, appName = "graft-dictscale")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val turns = TranscriptGen.dataset(spark, nConvs, 42L, 4, 800)
      .map(t => if (t.text == null) "" else t.text.toLowerCase).cache()
    val n = turns.count()

    def bench(dict: Seq[String]): (Double, Long) = {
      val ac = new AhoCorasick(dict)
      val bc = spark.sparkContext.broadcast(ac)
      // warm-up + measured, min-of-2 (host noise)
      def once(): (Long, Double) = Bench.time(
        turns.mapPartitions(_.map(t => DictRules.greedyMatches(bc.value, t).size.toLong))
          .reduce(_ + _))
      val (m1, t1) = once()
      val (_, t2) = once()
      (math.min(t1, t2), m1)
    }

    val small = Dims.skillSurfaceToPreferred.keys.toSeq.sorted
    val big = syntheticDict()
    val (tSmall, mSmall) = bench(small)
    val (tBig, mBig) = bench(big)
    println(
      f"""{"metric":"dict_scale","turns":$n,"dict_small":${small.size},"dict_big":${big.size},"sec_small":$tSmall%.2f,"sec_big":$tBig%.2f,"matches_small":$mSmall,"matches_big":$mBig,"slowdown":${tBig / tSmall}%.2f,"turns_per_sec_big":${n / tBig}%.0f,"cores":$cpus}""")
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RDFS-lite (+ two OWL-RL rules) forward-chaining inference over a
  * (subj, pred, obj) triple table: materializes the entailment of
  *
  *  - `inverseOf`     (owl: s p o ∧ p inverseOf q ⊢ o q s, both ways)
  *  - `subPropertyOf` (rdfs5 transitivity + rdfs7 property inheritance)
  *  - `type TransitiveProperty` (owl: per-predicate bounded closure)
  *  - `type SymmetricProperty`  (owl: s p o ⊢ o p s)
  *  - `subClassOf`    (rdfs11 transitivity + rdfs9 type propagation)
  *  - `domain`        (rdfs2: s p o ∧ p domain C ⊢ s type C)
  *  - `range`         (rdfs3: s p o ∧ p range D ⊢ o type D)
  *
  * ONE pass in the documented dependency order (inverse → inherit →
  * transitive-close → domain/range → subclass-propagate) yields the
  * fixpoint for ontologies whose rules don't feed BACKWARD across that
  * order (e.g. a transitive property's output re-entering an inverseOf);
  * that restriction is the price of never running an unbounded
  * data-scale loop, and it is the common shape of real containment/
  * taxonomy ontologies. The closures run over SCHEMA triples
  * (vocabulary-sized, broadcast-friendly) or one predicate's pair set;
  * every data-scale step is a single equi-join — at 10^12 data triples
  * the plan is broadcast joins and a distinct, never an iterative
  * data-scale fixpoint.
  *
  * Conventions: schema rows use the pred names above verbatim; data type
  * assertions use `typePred` (default "type"). Output = data triples ∪
  * every entailed triple, distinct (set semantics, as entailment is).
  */
object Reasoner {

  def rdfsClosure(data: DataFrame, schema: DataFrame,
      typePred: String = "type", maxDepth: Int = 16): DataFrame = {
    // owl:equivalentClass / owl:equivalentProperty (OWL RL scm-eqc1/
    // scm-eqp1): an equivalence is mutual subsumption, so each declared
    // row expands to subClassOf/subPropertyOf BOTH ways before the
    // hierarchy closures run — chains and mixes (equivalent-to-a-
    // subclass-of) then close transitively for free. The 2-cycles this
    // introduces are safe: the semi-naive closure anti-joins known
    // pairs, so it terminates, and rdfs9/rdfs7 over an A⊑B⊑A pair is
    // exactly equivalence semantics.
    def mutual(eqPred: String, subPred: String): DataFrame = {
      val eq = schema.where(col("pred") === lit(eqPred))
      eq.select(col("subj"), lit(subPred).as("pred"), col("obj"))
        .unionAll(eq.select(col("obj").as("subj"), lit(subPred).as("pred"),
          col("subj").as("obj")))
    }
    val schemaX = schema
      .unionAll(mutual("equivalentClass", "subClassOf"))
      .unionAll(mutual("equivalentProperty", "subPropertyOf"))
    def pairsOf(p: String): DataFrame = {
      val direct = schemaX.where(col("pred") === lit(p))
        .select(col("subj").as("src"), col("obj").as("dst"))
      GraphQuery.transitiveClosure(direct, maxDepth)
        .select(col("src"), col("dst"))
    }
    val subProp = pairsOf("subPropertyOf")
    val subClass = pairsOf("subClassOf")

    val typed = data.where(col("pred") === lit(typePred))
      .select(col("subj"), col("obj"))
    val plain = data.where(col("pred") =!= lit(typePred))
      .select(col("subj"), col("pred"), col("obj"))

    // owl:inverseOf (both directions — the schema declares one row):
    // (s p o) ∧ (p inverseOf q) ⊢ (o q s), applied to the RAW property
    // triples so the derived inverses then inherit/close like any other
    val invK = schema.where(col("pred") === "inverseOf")
    val invPairs = invK.select(col("subj").as("pred"), col("obj").as("q"))
      .unionAll(invK.select(col("obj").as("pred"), col("subj").as("q")))
      .distinct()
    val inversed = plain.join(invPairs, Seq("pred"))
      .select(col("obj").as("subj"), col("q").as("pred"),
        col("subj").as("obj"))
    val withInv = plain.unionAll(inversed).distinct()

    // owl:SymmetricProperty: (s p o) ⊢ (o p s) for declared predicates.
    // Symmetry and rdfs7 inheritance feed EACH OTHER exactly once each
    // way — a symmetric sub-property's flipped pairs must inherit
    // upward, and a triple that becomes an instance of a symmetric
    // SUPER-property via inheritance must flip — so the pass runs
    // sym → inherit → sym → inherit, which is the fixpoint: the
    // subPropertyOf closure is transitive, so one inheritance step
    // reaches every super, and flipping is an involution per predicate.
    val symPreds = schema.where(col("pred") === lit(typePred) &&
        col("obj") === "SymmetricProperty")
      .select(col("subj").as("pred")).distinct()
    def symClose(df: DataFrame): DataFrame =
      df.unionAll(df.join(symPreds, Seq("pred"))
          .select(col("obj").as("subj"), col("pred"), col("subj").as("obj")))
        .distinct()
    def inherit(df: DataFrame): DataFrame =
      df.unionAll(df
          .join(subProp.withColumnRenamed("src", "pred"), Seq("pred"))
          .select(col("subj"), col("dst").as("pred"), col("obj")))
        .distinct()
    val propsBeforeTrans = inherit(symClose(inherit(symClose(withInv))))

    // owl:TransitiveProperty: close each declared predicate's pair set
    // (bounded like the schema closures; applied AFTER inheritance so a
    // transitive super-property closes over inherited pairs too)
    val transPreds = schema
      .where(col("pred") === lit(typePred) &&
        col("obj") === "TransitiveProperty")
      .select(col("subj")).collect().map(_.getString(0)).toSeq
    val transClosed = transPreds.map { p =>
      GraphQuery.transitiveClosure(
        propsBeforeTrans.where(col("pred") === lit(p))
          .select(col("subj").as("src"), col("obj").as("dst")), maxDepth)
        .select(col("src").as("subj"), lit(p).as("pred"),
          col("dst").as("obj"))
    }
    val allProp = (propsBeforeTrans +: transClosed).reduce(_ unionAll _)
      .distinct()

    // rdfs2/rdfs3 over the INHERITED set (a triple entailed via rdfs7
    // carries its super-property's domain/range)
    val domK = schema.where(col("pred") === "domain")
      .select(col("subj").as("pred"), col("obj").as("cls"))
    val rngK = schema.where(col("pred") === "range")
      .select(col("subj").as("pred"), col("obj").as("cls"))
    val domTypes = allProp.join(domK, Seq("pred"))
      .select(col("subj"), col("cls").as("obj"))
    val rngTypes = allProp.join(rngK, Seq("pred"))
      .select(col("obj").as("subj"), col("cls").as("obj"))
    val baseTypes = typed.unionAll(domTypes).unionAll(rngTypes)

    // rdfs9: propagate every type assertion up the closed class hierarchy
    val superTypes = baseTypes
      .join(subClass.withColumnRenamed("src", "obj"), Seq("obj"))
      .select(col("subj"), col("dst").as("obj"))
    val allTypes = baseTypes.unionAll(superTypes)
      .select(col("subj"), lit(typePred).as("pred"), col("obj")).distinct()

    allProp.unionAll(allTypes).distinct()
  }

  /** owl:FunctionalProperty / owl:InverseFunctionalProperty → derived
    * `sameAs` links (OWL RL prp-fp / prp-ifp): a functional predicate
    * maps each subject to ONE individual, so two objects asserted for
    * the same (subject, predicate) are the same entity; inverse-
    * functional is the mirror (two subjects sharing one object — the
    * classic "same email ⇒ same person" identity rule). Declarations are
    * `p type FunctionalProperty` / `p type InverseFunctionalProperty`
    * schema rows.
    *
    * Emits the STAR form — (group-min, other) per violating group —
    * which is exactly the seed [[smushSameAs]]'s connected-component
    * labeling needs; transitivity/symmetry of the identity comes from
    * the smusher, not from quadratic pair emission here. Cost: one
    * broadcast semi-join to the declared predicates, then ONE window
    * shuffle per direction over only those predicates' triples — no
    * group ever materializes pairwise.
    */
  def functionalSameAs(data: DataFrame, schema: DataFrame,
      typePred: String = "type", sameAsPred: String = "sameAs"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def declared(cls: String): DataFrame =
      schema.where(col("pred") === lit(typePred) && col("obj") === lit(cls))
        .select(col("subj").as("pred")).distinct()
    def starLinks(keyCol: String, valCol: String, cls: String): DataFrame = {
      val scoped = data
        .where(col("subj").isNotNull && col("obj").isNotNull)
        .join(broadcast(declared(cls)), Seq("pred"))
      val w = Window.partitionBy(col("pred"), col(keyCol))
      scoped
        .withColumn("__rep", min(col(valCol)).over(w))
        .where(col(valCol) =!= col("__rep"))
        .select(col("__rep").as("subj"), lit(sameAsPred).as("pred"),
          col(valCol).as("obj"))
        .distinct()
    }
    starLinks("subj", "obj", "FunctionalProperty")
      .unionAll(starLinks("obj", "subj", "InverseFunctionalProperty"))
      .distinct()
  }

  /** owl:sameAs smushing — canonicalization applied to the triple table:
    * every subject/object is rewritten to its identity-component
    * representative (lexicographic min over the undirected `sameAsPred`
    * graph) and the sameAs links themselves are consumed, so downstream
    * consumers see ONE node per real-world entity. Labels propagate by
    * synchronous neighbor-min supersteps; identity-link components are
    * tiny by construction (linking emits pairs/cliques around one
    * entity), and an unconverged exit THROWS after a final stability
    * probe rather than letting stale labels smush incorrectly. The
    * label frame is link-scale, never triple-scale; the rewrite itself
    * is two broadcast-friendly joins over the data.
    */
  def smushSameAs(data: DataFrame, sameAsPred: String = "sameAs",
      maxIter: Int = 10): DataFrame = {
    val links = data.where(col("pred") === lit(sameAsPred))
      .select(col("subj").as("src"), col("obj").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val und = links
      .unionAll(links.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val nodes = und.select(col("src").as("node")).distinct().localCheckpoint()
    def step(lab: DataFrame): DataFrame = {
      val msgs = und.join(lab.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
      lab.unionAll(msgs).groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint()
    }
    var lab = nodes.withColumn("label", col("node"))
    (1 to maxIter).foreach(_ => lab = step(lab))
    val unstable = step(lab).withColumnRenamed("label", "l2")
      .join(lab, Seq("node")).where(col("l2") =!= col("label")).count()
    if (unstable > 0) throw new IllegalStateException(
      s"sameAs smushing did not converge in $maxIter supersteps " +
        s"($unstable labels still moving) — raise maxIter")
    val subjMap = lab.select(col("node").as("subj"), col("label").as("s_can"))
    val objMap = lab.select(col("node").as("obj"), col("label").as("o_can"))
    data.where(col("pred") =!= lit(sameAsPred))
      .join(subjMap, Seq("subj"), "left")
      .join(objMap, Seq("obj"), "left")
      .select(coalesce(col("s_can"), col("subj")).as("subj"), col("pred"),
        coalesce(col("o_can"), col("obj")).as("obj"))
      .distinct()
  }
}

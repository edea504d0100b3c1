package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.GraphQuery.TriplePattern

/** A SPARQL-lite text front-end over [[GraphQuery]]: parses the restricted
  * grammar below into triple patterns and plans it with the same
  * constant-filtered-scan + shared-variable-join machinery the
  * programmatic API uses, so a query text and its hand-built
  * [[GraphQuery.bgpMatch]] equivalent produce the identical DataFrame.
  *
  * Grammar (whitespace-separated; `#` comments to end of line):
  * {{{
  * query  := (PREFIX name: <iri>)*  -- ex:foo expands in term positions
  *           SELECT DISTINCT? (sel+ | *) WHERE group
  *             (GROUP BY ?var+ (HAVING ( bool ))*)?
  *             (ORDER BY key+)? (LIMIT n | OFFSET n)*
  * key    := ?var | ASC ( ?var ) | DESC ( ?var )  -- ?var must be selected
  *         | CONSTRUCT { triple ('.' triple)* } WHERE group (LIMIT n)?
  *         | ASK group
  *         | DESCRIBE ?var+ WHERE group   -- outgoing triples of bindings
  * sel    := ?var | ( agg ( DISTINCT? ?var | * ) AS ?alias )
  *           agg := COUNT|SUM|MIN|MAX|AVG|GROUP_CONCAT|SAMPLE
  *           (DISTINCT for COUNT/SUM; GROUP_CONCAT joins SORTED members
  *            with one space, or `( ?v ; SEPARATOR= 'sep' )`; SAMPLE
  *            picks the min binding — deterministic forms of SPARQL's
  *            order-free aggregates, so they stay cross-engine exact)
  * group  := { item ('.' item)* '.'? }            -- RECURSIVE: any item
  *                                                   at any depth
  * item   := term (pred | path) term              -- a triple pattern
  *         | OPTIONAL group    -- left-joined full group (may itself
  *                                hold OPTIONAL/UNION/FILTER/BIND; its
  *                                inner FILTERs narrow the group before
  *                                the join, never the solution)
  *         | MINUS group                          -- anti-join on shared vars
  *         | FILTER EXISTS group                  -- semi-join pattern test
  *         | FILTER NOT EXISTS group              -- anti-join pattern test
  *         | branch UNION branch (UNION branch)*  -- same-var-set branches;
  *                        branch := group | { SELECT ... } (a subquery)
  *         | FILTER ( bool )   -- bool: comparison | boolean fn | ! bool
  *                             | bool && bool | bool || bool | ( bool ) ;
  *                                comparison: expr (op expr)? with op in
  *                                = != < <= > >= ;
  *                                   expr: ?var | literal | expr (+|-|*|/)
  *                                   expr | fn(args) with fn in STRLEN
  *                                   UCASE LCASE ABS SUBSTR CONCAT
  *                                   COALESCE IF(bool,a,b) and boolean
  *                                   CONTAINS STRSTARTS STRENDS BOUND(?v)
  *                                   (operators whitespace-separated)
  *         | BIND ( expr AS ?var )                 -- computed binding
  *         | VALUES ?var { const+ }               -- inline allowed values
  *         | VALUES ( ?var+ ) { ( const+ )+ }     -- inline binding TABLE
  *                        (broadcast-joined on its variable columns)
  *         | { SELECT ... }                       -- SPARQL 1.1 subquery:
  *                        evaluated recursively, its PROJECTED variables
  *                        join the enclosing group
  * term   := ?var | 'quoted literal' | "quoted" | <iri> | bare-word
  * path   := SPARQL 1.1 property paths in the predicate position, written
  *           without internal spaces: `a|b`, `a/b`, `^a`, `(e)`, `e+`
  *           (UNBOUNDED closure — semi-naive to fixpoint), `e+N`
  *           (closure bounded at N hops), `!p` / `!(p1|..|^q1|..)`
  *           (negated property set: forward members exclude predicates
  *           on forward links, ^-members on REVERSED links — SPARQL 1.1
  *           §9.1 split), `e*` (reflexive closure:
  *           zero-length rows over every graph term, then `e+`) or `e?`
  *           (zero-or-one: the same identity, plus e's own pairs);
  *           evaluated via GraphQuery.pathPairs with SET semantics
  * }}}
  *
  * Documented restrictions vs full SPARQL: every FILTER sees exactly
  * its OWN group's bindings (the SPARQL group-scope rule; no cross-
  * group variable capture), UNION branches must bind identical variable
  * sets, numeric comparison is used when the literal side parses as a
  * number (bindings cast to double), string comparison otherwise,
  * declared PREFIX names expand everywhere but the `a` keyword does not
  * — undeclared terms match the triple table's values verbatim, and
  * property paths are rejected in CONSTRUCT templates.
  */
object SparqlLite {

  // ------------------------------------------------------------------ AST

  /** FILTER/BIND expression AST: terms (?vars and literals), arithmetic
    * (+ - * /, whitespace-separated tokens, parens group), comparisons
    * and the SPARQL 1.1 string/number builtins most queries reach for —
    * STRLEN UCASE LCASE ABS SUBSTR CONCAT plus the boolean
    * CONTAINS / STRSTARTS / STRENDS.
    */
  private sealed trait FExpr
  private final case class FTerm(t: String) extends FExpr
  private final case class FBin(op: String, a: FExpr, b: FExpr) extends FExpr
  private final case class FFn(name: String, args: Seq[FExpr]) extends FExpr
  private final case class FNot(e: FExpr) extends FExpr

  private val cmpOps = Set("=", "!=", "<", "<=", ">", ">=")
  private val boolFns = Set("CONTAINS", "STRSTARTS", "STRENDS", "BOUND",
    "REGEX")
  private val allFns = boolFns ++ Set("STRLEN", "UCASE", "LCASE", "ABS",
    "SUBSTR", "CONCAT", "COALESCE", "IF", "STR")

  private def fvars(e: FExpr): Seq[String] = e match {
    case FTerm(t) => if (t.startsWith("?")) Seq(t.stripPrefix("?")) else Seq.empty
    case FBin(_, a, b) => fvars(a) ++ fvars(b)
    case FFn(_, as) => as.flatMap(fvars)
    case FNot(e0) => fvars(e0)
  }

  /** An expression whose VALUE is numeric — decides comparison typing
    * (numeric compare casts both sides to double, exactly the legacy
    * literal-side rule generalized; string compare otherwise).
    */
  private def numericF(e: FExpr): Boolean = e match {
    case FTerm(t) => !t.startsWith("?") && !t.startsWith("'") &&
      scala.util.Try(t.toDouble).isSuccess
    case FBin(op, _, _) => !cmpOps.contains(op) && op != "&&" && op != "||"
    case FFn(n, _) => n == "STRLEN" || n == "ABS"
    case FNot(_) => false
  }

  private def valCol(e: FExpr): Column = e match {
    case FTerm(t) if t.startsWith("?") => col(t.stripPrefix("?"))
    // the tokenizer's quote sentinel survives into FTerm so a QUOTED
    // literal stays a string even when it parses as a number —
    // STRENDS(?n, '1') must compare strings, not doubles
    case FTerm(t) if t.startsWith("'") => lit(t.substring(1))
    case FTerm(t) =>
      scala.util.Try(t.toDouble).toOption.map(d => lit(d)).getOrElse(lit(t))
    case FBin(op, a, b) if !cmpOps.contains(op) && op != "&&" && op != "||" =>
      val (x, y) = (valCol(a).cast("double"), valCol(b).cast("double"))
      op match {
        case "+" => x + y
        case "-" => x - y
        case "*" => x * y
        case "/" => x / y
      }
    case FFn("STRLEN", Seq(a)) => length(valCol(a)).cast("double")
    case FFn("UCASE", Seq(a)) => upper(valCol(a))
    case FFn("LCASE", Seq(a)) => lower(valCol(a))
    case FFn("ABS", Seq(a)) => abs(valCol(a).cast("double"))
    case FFn("SUBSTR", Seq(str, pos)) =>
      valCol(str).substr(valCol(pos).cast("int"), lit(Int.MaxValue))
    case FFn("SUBSTR", Seq(str, pos, len)) =>
      valCol(str).substr(valCol(pos).cast("int"), valCol(len).cast("int"))
    case FFn("CONCAT", as) if as.nonEmpty => concat(as.map(valCol): _*)
    // SPARQL STR: the lexical form of the term — our object domain is
    // already strings, so this is a string cast (it exists so numeric-
    // typed BIND results can feed string functions/comparisons)
    case FFn("STR", Seq(a)) => valCol(a).cast("string")
    case FFn("COALESCE", as) if as.nonEmpty => coalesce(as.map(valCol): _*)
    case FFn("IF", Seq(c, a, b)) => when(boolCol(c), valCol(a)).otherwise(valCol(b))
    case f @ FFn(n, _) if boolFns.contains(n) => boolCol(f)
    case other => throw new IllegalArgumentException(
      s"unsupported expression (check function arity): $other")
  }

  private def cmpCol(op: String, a: Column, b: Column): Column = op match {
    case "="  => a === b
    case "!=" => a =!= b
    case "<"  => a < b
    case "<=" => a <= b
    case ">"  => a > b
    case ">=" => a >= b
  }

  private def boolCol(e: FExpr): Column = e match {
    case FBin(op, FTerm(x0), FTerm(y0)) if cmpOps.contains(op) =>
      // the original two-term rule, verbatim: numeric comparison exactly
      // when the OTHER side is a number literal — quote sentinels are
      // STRIPPED here, because the legacy grammar treated '9' and 9
      // alike in simple comparisons (documented restriction)
      val (x, y) = (x0.stripPrefix("'"), y0.stripPrefix("'"))
      def side(t: String, other: String): Column =
        if (t.startsWith("?")) {
          if (!other.startsWith("?") && scala.util.Try(other.toDouble).isSuccess)
            col(t.stripPrefix("?")).cast("double")
          else col(t.stripPrefix("?"))
        } else if (scala.util.Try(t.toDouble).isSuccess && other.startsWith("?"))
          lit(t.toDouble)
        else lit(t)
      cmpCol(op, side(x, y), side(y, x))
    case FBin(op, a, b) if cmpOps.contains(op) =>
      if (numericF(a) || numericF(b))
        cmpCol(op, valCol(a).cast("double"), valCol(b).cast("double"))
      else cmpCol(op, valCol(a), valCol(b))
    case FFn("CONTAINS", Seq(a, b)) => valCol(a).contains(valCol(b))
    case FFn("STRSTARTS", Seq(a, b)) => valCol(a).startsWith(valCol(b))
    case FFn("STRENDS", Seq(a, b)) => valCol(a).endsWith(valCol(b))
    // SPARQL REGEX(text, pattern) — Java regex `find` semantics
    // (unanchored), matching DuckDB's regexp_matches for the oracle twin
    case FFn("REGEX", Seq(a, b)) => regexp_like(valCol(a), valCol(b))
    // SPARQL BOUND: an OPTIONAL-unmatched binding is a null column here,
    // so BOUND(?x) is exactly isNotNull — with !, the classic
    // negation-by-failure idiom over OPTIONAL
    case FFn("BOUND", Seq(a @ FTerm(t))) if t.startsWith("?") =>
      valCol(a).isNotNull
    case FBin("&&", a, b) => boolCol(a) && boolCol(b)
    case FBin("||", a, b) => boolCol(a) || boolCol(b)
    case FNot(e0) => !boolCol(e0)
    case other => throw new IllegalArgumentException(
      s"FILTER needs a comparison or boolean function, got $other")
  }
  private final case class Values(v: String, consts: Seq[String])
  /** Multi-variable VALUES: an inline binding TABLE joined on its
    * variable columns (vars.length columns, each row one tuple).
    */
  private final case class ValuesTable(vars: Seq[String], rows: Seq[Seq[String]])
  private final case class Agg(fn: String, operand: String, alias: String,
      distinct: Boolean, sep: String)

  /** One group graph pattern `{ ... }` — the RECURSIVE unit of the
    * grammar: triples and property paths, expression FILTERs, BINDs,
    * VALUES, subqueries, and nested OPTIONAL / MINUS / UNION / EXISTS
    * groups, each of which is itself a full GGroup. Brace nesting is
    * general: OPTIONAL can contain OPTIONAL, UNION branches can carry
    * FILTERs, MINUS bodies can hold paths, and so on — the planner
    * composes each group to a frame the same way at every depth.
    */
  private final case class GGroup(
      patterns: Seq[TriplePattern],
      filters: Seq[FExpr],
      binds: Seq[(String, FExpr)],
      values: Seq[Values],
      valueTables: Seq[ValuesTable],
      optionals: Seq[GGroup],
      minuses: Seq[GGroup],
      unions: Seq[Seq[GGroup]],
      exists: Seq[(GGroup, Boolean)],
      subqueries: Seq[(String, Seq[String])]) {
    /** Does this group contribute a joinable frame of its own? */
    def hasFrame: Boolean =
      patterns.nonEmpty || unions.nonEmpty || subqueries.nonEmpty
    /** Variables present as COLUMNS of the group's frame before its own
      * BINDs run: patterns, then optional groups, then union branches,
      * then subquery projections — first-appearance order, which pins
      * `SELECT *` column order (MINUS/EXISTS groups bind nothing
      * outward).
      */
    def frameVars: Seq[String] =
      (patterns.flatMap(_.vars) ++ optionals.flatMap(_.allVars) ++
        unions.flatMap(_.flatMap(_.allVars)) ++
        subqueries.flatMap(_._2)).distinct
    /** [[frameVars]] plus this group's own BIND names. */
    def allVars: Seq[String] = (frameVars ++ binds.map(_._1)).distinct
  }

  private final case class Query(form: String, distinct: Boolean,
      select: Seq[String], aggs: Seq[Agg], groupBy: Seq[String],
      orderBy: Seq[(String, Boolean)], template: Seq[TriplePattern],
      root: GGroup, havings: Seq[FExpr],
      prefixes: Map[String, String],
      limit: Option[Int], offset: Option[Int])

  // ------------------------------------------------------------ tokenizer

  /** Tokens: quoted strings (kept with a `'` sentinel prefix), `<iri>`
    * (brackets stripped), punctuation `{ } ( ) .` as single tokens,
    * everything else whitespace-delimited words.
    */
  private[operators] def tokenize(q: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && q.charAt(i) != '\n') i += 1 }
      else if (c == '\'' || c == '"') {
        val j = q.indexOf(c, i + 1)
        require(j >= 0, s"unterminated ${c} quote at offset $i")
        out += ("'" + q.substring(i + 1, j)) // sentinel marks "literal"
        i = j + 1
      } else if (c == '<') {
        // `<` opens an IRI only when a whitespace-free `<...>` follows;
        // otherwise it is the comparison operator `<` / `<=` (an IRI
        // contains no whitespace, an operator is never followed by `>`
        // inside the same token)
        val j = q.indexOf('>', i + 1)
        val isIri = j >= 0 && !q.substring(i + 1, j).exists(_.isWhitespace) &&
          (i + 1 >= n || q.charAt(i + 1) != '=')
        if (isIri) {
          out += ("'" + q.substring(i + 1, j))
          i = j + 1
        } else if (i + 1 < n && q.charAt(i + 1) == '=') { out += "<="; i += 2 }
        else { out += "<"; i += 1 }
      } else if ("{}().,".contains(c)) { out += c.toString; i += 1 }
      else {
        val j0 = i
        while (i < n && !q.charAt(i).isWhitespace &&
          !"{}().,#'\"<".contains(q.charAt(i))) i += 1
        out += q.substring(j0, i)
      }
    }
    out.toSeq
  }

  // --------------------------------------------------------------- parser

  private def parse(text: String): Query = {
    val ts = tokenize(text)
    var i = 0
    def peek: String = if (i < ts.length) ts(i) else
      throw new IllegalArgumentException("unexpected end of query")
    def next(): String = { val t = peek; i += 1; t }
    def expect(kw: String): Unit = {
      val t = next()
      require(t.equalsIgnoreCase(kw), s"expected $kw, got $t")
    }
    // PREFIX declarations: `PREFIX ex: <http://...>` before the query
    // form; `ex:name` then expands to the IRI + local part in every term
    // position (and inside path expressions, at path-compile time).
    // Undeclared colon-bearing tokens stay VERBATIM — terms match the
    // triple table's values as written, the documented rule.
    val prefixes = scala.collection.mutable.Map.empty[String, String]
    while (i < ts.length && peek.equalsIgnoreCase("PREFIX")) {
      next()
      val name = next()
      require(name.endsWith(":") && name.length > 1,
        s"PREFIX name must end with ':', got $name")
      val iri = next()
      require(iri.startsWith("'"), s"PREFIX $name needs an <iri>, got $iri")
      prefixes(name.dropRight(1)) = iri.substring(1)
    }
    def expand(t: String): String = expandPrefixed(t, prefixes)

    // a term in pattern position: strip the literal sentinel; vars keep '?'
    def term(): String = {
      val t = next()
      if (t.startsWith("'")) t.substring(1)
      else if (t.startsWith("?")) t
      else expand(t)
    }
    // predicate position may hold a property-path expression, which the
    // tokenizer splits at parens — re-join while parens are unbalanced or
    // the next token visibly continues a path (starts with an operator)
    def continuesPath(tok: String): Boolean =
      tok == "(" || tok == ")" || tok == "?" || "+|/^*".contains(tok.charAt(0))
    def predTerm(): String = {
      val first = next()
      if (first.startsWith("'")) return first.substring(1)
      if (first.startsWith("?")) return first
      var s = first
      var d = s.count(_ == '(') - s.count(_ == ')')
      while (i < ts.length && (d > 0 || continuesPath(peek))) {
        val t = next()
        s += t
        d += t.count(_ == '(') - t.count(_ == ')')
      }
      // raw-syntax classification: operator chars make it a PATH (its
      // members expand inside parsePath); otherwise a literal predicate
      // name, prefix-expanded here
      if (s.exists(c => "^|/+*()?!".contains(c))) PathMark + s
      else expand(s)
    }

    val form = next().toUpperCase
    require(Seq("SELECT", "CONSTRUCT", "ASK", "DESCRIBE").contains(form),
      s"query must start with SELECT, CONSTRUCT, ASK or DESCRIBE, got $form")
    var distinct = false
    val select = scala.collection.mutable.ArrayBuffer.empty[String]
    val aggs = scala.collection.mutable.ArrayBuffer.empty[Agg]
    var star = false
    val template = scala.collection.mutable.ArrayBuffer.empty[TriplePattern]
    form match {
      case "SELECT" =>
        distinct = peek.equalsIgnoreCase("DISTINCT") && { next(); true }
        while (!peek.equalsIgnoreCase("WHERE")) {
          val t = next()
          if (t == "*") star = true
          else if (t == "(") {
            // (AGG(DISTINCT? ?v|*) AS ?alias)
            val fn = next().toUpperCase
            require(Seq("COUNT", "SUM", "MIN", "MAX", "AVG",
              "GROUP_CONCAT", "SAMPLE").contains(fn),
              s"unsupported aggregate $fn")
            expect("(")
            val dist = peek.equalsIgnoreCase("DISTINCT") && { next(); true }
            require(!dist || fn == "COUNT" || fn == "SUM",
              s"DISTINCT is supported for COUNT and SUM, got $fn")
            val operand = next()
            require(operand.startsWith("?") ||
              (operand == "*" && fn == "COUNT" && !dist),
              s"$fn takes a ?var${if (fn == "COUNT" && !dist) " or *" else ""}, got $operand")
            // GROUP_CONCAT ( ?v ; SEPARATOR= 'sep' ) — tokens
            // whitespace-separated per the grammar's global rule;
            // `SEPARATOR =` (split) accepted too
            var sep = " "
            if (peek == ";") {
              require(fn == "GROUP_CONCAT",
                s"only GROUP_CONCAT takes a SEPARATOR, not $fn")
              next()
              val kw = next()
              require(kw.equalsIgnoreCase("SEPARATOR=") ||
                kw.equalsIgnoreCase("SEPARATOR"),
                s"expected SEPARATOR= after ';', got $kw")
              if (kw.equalsIgnoreCase("SEPARATOR")) expect("=")
              val s = next()
              require(s.startsWith("'"),
                s"SEPARATOR takes a quoted string, got $s")
              sep = s.substring(1)
            }
            expect(")"); expect("AS")
            val alias = next()
            require(alias.startsWith("?"), s"AS takes a ?alias, got $alias")
            expect(")")
            aggs += Agg(fn, operand, alias.stripPrefix("?"), dist, sep)
            select += alias.stripPrefix("?")
          } else {
            require(t.startsWith("?"), s"SELECT list takes ?vars, aggregates or *, got $t")
            select += t.stripPrefix("?")
          }
        }
        expect("WHERE")
      case "CONSTRUCT" =>
        expect("{")
        while (peek != "}") {
          template += TriplePattern(term(), term(), term())
          if (peek == ".") next()
        }
        expect("}")
        require(template.nonEmpty, "empty CONSTRUCT template")
        expect("WHERE")
      case "ASK" => () // ASK { block } — the block follows directly
      case "DESCRIBE" =>
        while (!peek.equalsIgnoreCase("WHERE")) {
          val v = next()
          require(v.startsWith("?"), s"DESCRIBE takes ?vars, got $v")
          select += v.stripPrefix("?")
        }
        require(select.nonEmpty, "DESCRIBE names no variables")
        expect("WHERE")
    }
    // FILTER operands may be fractional numbers, which the tokenizer
    // splits at the '.' — re-fuse `<int> . <digits>` into one literal
    def filterOperand(): String = {
      val t = term()
      val intLike = t.nonEmpty &&
        (t.head.isDigit || (t.head == '-' && t.length > 1)) &&
        t.drop(1).forall(_.isDigit)
      if (intLike && i + 1 < ts.length && peek == "." &&
        ts(i + 1).nonEmpty && ts(i + 1).forall(_.isDigit)) {
        next()
        t + "." + next()
      } else t
    }
    // recursive-descent FILTER/BIND expressions: * / bind tighter than
    // + -, parens group, functions take comma-separated args; operator
    // tokens must be whitespace-separated (the grammar's global rule)
    def isFnAt: Boolean = i + 1 < ts.length && !ts(i).startsWith("'") &&
      !ts(i).startsWith("?") && allFns.contains(ts(i).toUpperCase) &&
      ts(i + 1) == "("
    def fprimary(): FExpr =
      if (peek == "(") { next(); val e = fexpr(); expect(")"); e }
      else if (isFnAt) {
        val name = next().toUpperCase
        expect("(")
        // IF's first argument is a BOOLEAN (comparison/connectives);
        // every other argument position is a value expression
        val args = scala.collection.mutable.ArrayBuffer[FExpr](
          if (name == "IF") forExpr() else fexpr())
        while (peek == ",") { next(); args += fexpr() }
        expect(")")
        FFn(name, args.toSeq)
      } else if (i < ts.length && ts(i).startsWith("'")) FTerm(next())
      else FTerm(filterOperand())
    def fmul(): FExpr = {
      var e = fprimary()
      while (peek == "*" || peek == "/") { val op = next(); e = FBin(op, e, fprimary()) }
      e
    }
    def fexpr(): FExpr = {
      var e = fmul()
      while (peek == "+" || peek == "-") { val op = next(); e = FBin(op, e, fmul()) }
      e
    }
    def fcompare(): FExpr = {
      val a = fexpr()
      if (i < ts.length && cmpOps.contains(peek)) {
        val op = next(); FBin(op, a, fexpr())
      } else a match {
        case f @ FFn(n, _) if boolFns.contains(n) => f
        case other => throw new IllegalArgumentException(
          s"FILTER needs a comparison or boolean function, got $other")
      }
    }
    def fatom(): FExpr =
      if (peek == "!") { next(); FNot(fatom()) }
      else if (peek == "(") {
        // '(' in boolean position is ambiguous: a boolean group
        // ((A || B) && C) or an arithmetic group ((?a + 1) * 2 > 21).
        // Try the boolean reading first and BACKTRACK on failure or
        // when an operator follows the closing paren (then the parens
        // belonged to an arithmetic operand of a comparison).
        val save = i
        val asBool =
          try {
            next()
            val e = forExpr()
            expect(")")
            val follows = if (i < ts.length) ts(i) else ")"
            if (cmpOps.contains(follows) || "+-*/".contains(follows)) None
            else Some(e)
          } catch { case _: IllegalArgumentException => None }
        asBool match {
          case Some(e) => e
          case None => i = save; fcompare()
        }
      } else fcompare()
    def fandExpr(): FExpr = {
      var e = fatom()
      while (peek == "&&") { next(); e = FBin("&&", e, fatom()) }
      e
    }
    def forExpr(): FExpr = {
      var e = fandExpr()
      while (peek == "||") { next(); e = FBin("||", e, fandExpr()) }
      e
    }
    def fbool(): FExpr = forExpr()

    /** One `{ ... }` group graph pattern, RECURSIVELY (consumes the
      * opening brace itself): any item may appear at any depth —
      * OPTIONAL inside OPTIONAL, FILTERs inside UNION branches, paths
      * inside MINUS bodies. Each nested clause body is a full GGroup.
      */
    def parseGroup(): GGroup = {
      expect("{")
      val patterns = scala.collection.mutable.ArrayBuffer.empty[TriplePattern]
      val filters = scala.collection.mutable.ArrayBuffer.empty[FExpr]
      val binds = scala.collection.mutable.ArrayBuffer.empty[(String, FExpr)]
      val values = scala.collection.mutable.ArrayBuffer.empty[Values]
      val valueTables = scala.collection.mutable.ArrayBuffer.empty[ValuesTable]
      val optionals = scala.collection.mutable.ArrayBuffer.empty[GGroup]
      val minuses = scala.collection.mutable.ArrayBuffer.empty[GGroup]
      val unions = scala.collection.mutable.ArrayBuffer.empty[Seq[GGroup]]
      val exists = scala.collection.mutable.ArrayBuffer.empty[(GGroup, Boolean)]
      val subqueries =
        scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
      while (peek != "}") {
        if (peek.equalsIgnoreCase("OPTIONAL")) {
          // the optional body is a full group: its own filters/binds/
          // nested clauses compose BEFORE the left join (SPARQL group
          // scope — they narrow what can match, never remove a solution
          // of the required graph)
          next()
          optionals += parseGroup()
        } else if (peek.equalsIgnoreCase("MINUS")) {
          next()
          minuses += parseGroup()
        } else if (peek == "{") {
          // a braced item: a SPARQL 1.1 subquery `{ SELECT ... }`, a
          // UNION of branches, or a subquery AS a union branch (legal
          // SPARQL — each branch parses as subquery-or-group)
          def atSubquery: Boolean = peek == "{" && i + 1 < ts.length &&
            ts(i + 1).equalsIgnoreCase("SELECT")
          // collect the balanced token span, reassemble it as query
          // text (re-quoting literal sentinels) and parse it EAGERLY —
          // malformed subqueries fail at the outer parse and the
          // projection is known for scope checks; it re-plans
          // recursively at plan time, joining on its projected vars
          def parseSubquery(): (String, Seq[String]) = {
            next() // '{'
            val sub = scala.collection.mutable.ArrayBuffer.empty[String]
            var depth = 1
            while (depth > 0) {
              val t = next()
              if (t == "{") depth += 1
              else if (t == "}") depth -= 1
              if (depth > 0) sub += t
            }
            // outer PREFIX declarations apply inside the subquery
            // (SPARQL prologue scope): prepend them to the text
            val prologue = prefixes.toSeq.sortBy(_._1)
              .map { case (n, iri) => s"PREFIX $n: <$iri>" }.mkString(" ")
            val body = sub.map(tok =>
              if (tok.startsWith("'")) "'" + tok.substring(1) + "'" else tok)
              .mkString(" ")
            val text = if (prologue.isEmpty) body else s"$prologue $body"
            val sq = parse(text)
            require(sq.form == "SELECT", "subqueries must be SELECT queries")
            (text, sq.select)
          }
          def subqueryGroup(sq: (String, Seq[String])): GGroup =
            GGroup(Seq.empty, Seq.empty, Seq.empty, Seq.empty, Seq.empty,
              Seq.empty, Seq.empty, Seq.empty, Seq.empty, Seq(sq))
          def parseBranch(): GGroup =
            if (atSubquery) subqueryGroup(parseSubquery()) else parseGroup()
          val first: Either[(String, Seq[String]), GGroup] =
            if (atSubquery) Left(parseSubquery()) else Right(parseGroup())
          if (i < ts.length && peek.equalsIgnoreCase("UNION")) {
            val branches = scala.collection.mutable.ArrayBuffer(
              first.fold(subqueryGroup, identity))
            while (i < ts.length && peek.equalsIgnoreCase("UNION")) {
              next()
              branches += parseBranch()
            }
            unions += branches.toSeq
          } else first match {
            case Left(sq) => subqueries += sq
            case Right(_) => throw new IllegalArgumentException(
              "a braced group must be a UNION of two or more branches")
          }
        } else if (peek.equalsIgnoreCase("FILTER")) {
          next()
          // FILTER EXISTS { ... } / FILTER NOT EXISTS { ... } — pattern
          // tests compiled to semi/anti joins on the shared variables
          // (the well-designed-pattern correlation, same domain rule as
          // MINUS); otherwise an expression FILTER
          val neg = peek.equalsIgnoreCase("NOT") && { next(); true }
          if (neg || peek.equalsIgnoreCase("EXISTS")) {
            expect("EXISTS")
            exists += ((parseGroup(), !neg))
          } else {
            expect("(")
            filters += fbool()
            expect(")")
          }
        } else if (peek.equalsIgnoreCase("BIND")) {
          next(); expect("(")
          val e = fexpr()
          expect("AS")
          val v = next()
          require(v.startsWith("?"), s"BIND takes AS ?var, got $v")
          expect(")")
          binds += ((v.stripPrefix("?"), e))
        } else if (peek.equalsIgnoreCase("VALUES")) {
          next()
          if (peek == "(") {
            // multi-variable form: VALUES (?a ?b) { (x y) (u v) ... } —
            // an inline binding table joined on its variable columns
            next()
            val vs = scala.collection.mutable.ArrayBuffer.empty[String]
            while (peek != ")") {
              val v = next()
              require(v.startsWith("?"), s"VALUES var list takes ?vars, got $v")
              vs += v.stripPrefix("?")
            }
            next() // ')'
            require(vs.nonEmpty, "empty VALUES var list")
            expect("{")
            val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
            while (peek != "}") {
              expect("(")
              val row = scala.collection.mutable.ArrayBuffer.empty[String]
              while (peek != ")") row += term()
              next() // ')'
              require(row.length == vs.length,
                s"VALUES row (${row.mkString(" ")}) arity ${row.length} != ${vs.length}")
              rows += row.toSeq
            }
            expect("}")
            require(rows.nonEmpty, "empty VALUES set")
            valueTables += ValuesTable(vs.toSeq, rows.toSeq)
          } else {
            val v = next()
            require(v.startsWith("?"), s"VALUES takes a ?var, got $v")
            expect("{")
            val consts = scala.collection.mutable.ArrayBuffer.empty[String]
            while (peek != "}") consts += term()
            expect("}")
            require(consts.nonEmpty, "empty VALUES set")
            values += Values(v.stripPrefix("?"), consts.toSeq)
          }
        } else {
          require(!peek.equalsIgnoreCase("UNION"),
            "UNION must follow a braced group")
          patterns += TriplePattern(term(), predTerm(), term())
        }
        if (peek == ".") next()
      }
      expect("}")
      GGroup(patterns.toSeq, filters.toSeq, binds.toSeq, values.toSeq,
        valueTables.toSeq, optionals.toSeq, minuses.toSeq, unions.toSeq,
        exists.toSeq, subqueries.toSeq)
    }

    val root = parseGroup()
    val groupBy = scala.collection.mutable.ArrayBuffer.empty[String]
    val havings = scala.collection.mutable.ArrayBuffer.empty[FExpr]
    if (i < ts.length && peek.equalsIgnoreCase("GROUP")) {
      next(); expect("BY")
      while (i < ts.length && peek.startsWith("?"))
        groupBy += next().stripPrefix("?")
      require(groupBy.nonEmpty, "GROUP BY names no variables")
      while (i < ts.length && peek.equalsIgnoreCase("HAVING")) {
        next(); expect("(")
        havings += fbool()
        expect(")")
      }
    }
    val orderBy = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    if (i < ts.length && peek.equalsIgnoreCase("ORDER")) {
      next(); expect("BY")
      while (i < ts.length && (peek.startsWith("?") ||
        peek.equalsIgnoreCase("ASC") || peek.equalsIgnoreCase("DESC"))) {
        val t = next()
        if (t.startsWith("?")) orderBy += ((t.stripPrefix("?"), true))
        else {
          val asc = t.equalsIgnoreCase("ASC")
          expect("(")
          val v = next()
          require(v.startsWith("?"), s"ORDER BY ${t.toUpperCase} takes a ?var")
          expect(")")
          orderBy += ((v.stripPrefix("?"), asc))
        }
      }
      require(orderBy.nonEmpty, "ORDER BY names no keys")
    }
    var limit: Option[Int] = None
    var offset: Option[Int] = None
    while (i < ts.length && (peek.equalsIgnoreCase("LIMIT") ||
      peek.equalsIgnoreCase("OFFSET"))) {
      val kw = next().toUpperCase
      val n = next().toInt
      require(n >= 0, s"$kw takes a non-negative count, got $n")
      if (kw == "LIMIT") { require(limit.isEmpty, "duplicate LIMIT"); limit = Some(n) }
      else { require(offset.isEmpty, "duplicate OFFSET"); offset = Some(n) }
    }
    require(i == ts.length, s"trailing tokens after query: ${ts.drop(i).mkString(" ")}")
    require(root.hasFrame, "query has no required triple pattern")
    if (form == "ASK" || form == "DESCRIBE")
      require(limit.isEmpty && offset.isEmpty,
        s"$form does not take LIMIT/OFFSET")

    // recursive scope validation, one group at a time: BINDs may use
    // the group's frame vars and EARLIER binds and must be fresh
    // (SPARQL forbids rebinding); FILTERs and VALUES see only what
    // THEIR group binds — the SPARQL group-scope rule, which is exactly
    // what makes an OPTIONAL-inner FILTER narrow the group rather than
    // the solution; MINUS/EXISTS must share a variable with the
    // enclosing FRAME (binds excluded: they run after those joins) to
    // be correlated; UNION branches must bind identical variable sets
    // (documented restriction — branches align by column for the union).
    def validate(g: GGroup, where: String): Unit = {
      require(g.hasFrame,
        s"$where binds no frame — it needs a triple pattern, UNION or subquery")
      val frame = g.frameVars
      val names = scala.collection.mutable.ListBuffer.empty[String]
      g.binds.foreach { case (v, e) =>
        require(!frame.contains(v) && !names.contains(v),
          s"BIND ?$v rebinds an already-bound variable")
        fvars(e).foreach(u => require(frame.contains(u) || names.contains(u),
          s"BIND expression uses unbound ?$u"))
        names += v
      }
      val all = g.allVars
      g.filters.foreach(f => fvars(f).foreach(u => require(all.contains(u),
        s"FILTER uses ?$u, which $where does not bind")))
      (g.values.map(_.v) ++ g.valueTables.flatMap(_.vars)).foreach(v =>
        require(all.contains(v), s"VALUES ?$v is unbound in $where"))
      g.minuses.foreach { m =>
        require(m.allVars.intersect(frame).nonEmpty,
          "MINUS group shares no variable with the enclosing graph " +
            "(SPARQL would remove nothing; write the intended join)")
        validate(m, "the MINUS group")
      }
      g.exists.foreach { case (eg, _) =>
        require(eg.allVars.intersect(frame).nonEmpty,
          "EXISTS group shares no variable with the enclosing graph " +
            "(the test would be uncorrelated; write the intended join)")
        validate(eg, "the EXISTS group")
      }
      g.optionals.foreach(validate(_, "the OPTIONAL group"))
      g.unions.foreach { branches =>
        branches.foreach(validate(_, "the UNION branch"))
        val sets = branches.map(_.allVars.toSet)
        require(sets.distinct.length == 1,
          s"UNION branches must bind the same variables, got $sets")
      }
    }
    validate(root, "the query")

    val bound = root.frameVars
    val boundAll = root.allVars
    val sel =
      if (form == "DESCRIBE") select.toList
      else if (star || form != "SELECT") boundAll.toList
      else select.toList
    require(sel.nonEmpty, "empty SELECT list")
    val aliases = aggs.map(_.alias)
    if (form == "SELECT" || form == "DESCRIBE")
      sel.filterNot(aliases.contains).foreach(v =>
        require(boundAll.contains(v), s"$form ?$v is unbound"))
    aggs.foreach(a => require(a.operand == "*" ||
      boundAll.contains(a.operand.stripPrefix("?")),
      s"aggregate over unbound ${a.operand}"))
    groupBy.foreach(v => require(boundAll.contains(v), s"GROUP BY ?$v is unbound"))
    if (aggs.nonEmpty)
      sel.filterNot(aliases.contains).foreach(v => require(groupBy.contains(v),
        s"?$v is selected next to aggregates but not in GROUP BY"))
    else require(groupBy.isEmpty, "GROUP BY without an aggregate in SELECT")
    require(aggs.isEmpty || form == "SELECT", "aggregates require SELECT")
    require(havings.isEmpty || aggs.nonEmpty, "HAVING requires aggregates")
    havings.foreach(h => fvars(h).foreach(v =>
      require(aliases.contains(v) || groupBy.contains(v),
        s"HAVING ?$v must be an aggregate alias or a grouped variable")))
    require(!(star && aggs.nonEmpty), "SELECT * cannot mix with aggregates")
    template.flatMap(_.vars).distinct
      .foreach(v => require(bound.contains(v), s"CONSTRUCT ?$v is unbound"))
    orderBy.foreach { case (v, _) =>
      require(form == "SELECT", "ORDER BY requires SELECT")
      // a non-selected key is legal for a PLAIN select: the planner
      // sorts before projecting. DISTINCT/aggregates collapse rows
      // after projection, where an unselected key no longer exists.
      require(sel.contains(v) ||
        (aggs.isEmpty && !distinct && boundAll.contains(v)),
        s"ORDER BY ?$v must be selected (or at least bound, for plain " +
          "non-DISTINCT selects)")
    }
    Query(form, distinct, sel, aggs.toSeq, groupBy.toList, orderBy.toSeq,
      template.toSeq, root, havings.toSeq, prefixes.toMap, limit, offset)
  }

  // ---------------------------------------------------------------- paths

  /** Path-ness is decided at PARSE time from the RAW syntax (operator
    * chars outside any <iri> brackets) and recorded as a marker prefix —
    * an EXPANDED prefixed name or a bracketed IRI may legitimately
    * contain '/' and must stay a literal predicate, never re-parse as
    * path syntax.
    */
  private val PathMark = "\u0001"
  private def isPath(p: String): Boolean = p.startsWith(PathMark)
  private def pathText(p: String): String = p.stripPrefix(PathMark)

  /** Recursive-descent parser for the path fragment (SPARQL 1.1
    * precedence: `|` < `/` < `^`/postfix): `a|b`, `a/b`, `^a`, `(e)`,
    * `e+` (unbounded closure to fixpoint), `e+N` (bounded at N), `e*`
    * (reflexive closure).
    */
  /** `pfx:rest` → declared IRI + rest; everything else verbatim. */
  private def expandPrefixed(t: String, prefixes:
      scala.collection.Map[String, String]): String = {
    val c = t.indexOf(':')
    if (c <= 0) t
    else prefixes.get(t.substring(0, c)) match {
      case Some(iri) => iri + t.substring(c + 1)
      case None => t
    }
  }

  private[operators] def parsePath(s: String): GraphQuery.PathExpr =
    parsePath(s, Map.empty)

  private[operators] def parsePath(s: String,
      prefixes: scala.collection.Map[String, String]): GraphQuery.PathExpr = {
    import GraphQuery.PathExpr._
    var i = 0
    def peekc: Char = if (i < s.length) s.charAt(i) else ' '
    def alt(): GraphQuery.PathExpr = {
      var e = seq()
      while (peekc == '|') { i += 1; e = Alt(e, seq()) }
      e
    }
    def seq(): GraphQuery.PathExpr = {
      var e = unary()
      while (peekc == '/') { i += 1; e = Chain(e, unary()) }
      e
    }
    def unary(): GraphQuery.PathExpr =
      if (peekc == '^') { i += 1; Inv(unary()) } // ^a+ = ^(a+), per grammar
      else if (peekc == '!') { i += 1; postfix(negatedSet()) }
      else postfix(primary())
    def negatedSet(): GraphQuery.PathExpr = {
      def name(): String = {
        val j0 = i
        while (i < s.length && !"^|/+*()?!".contains(s.charAt(i))) i += 1
        require(i > j0, s"empty negated-set member at offset $j0 in $s")
        expandPrefixed(s.substring(j0, i), prefixes)
      }
      // a member may be `p` (excludes p on FORWARD links) or `^q`
      // (excludes q on REVERSED links) — SPARQL 1.1 §9.1 splits the
      // set into a forward and an inverse part
      val fwd = scala.collection.mutable.ArrayBuffer.empty[String]
      val bwd = scala.collection.mutable.ArrayBuffer.empty[String]
      def member(): Unit =
        if (peekc == '^') { i += 1; bwd += name() } else fwd += name()
      if (peekc == '(') {
        i += 1
        member()
        while (peekc == '|') { i += 1; member() }
        require(peekc == ')', s"unbalanced parens in negated set of $s")
        i += 1
      } else member()
      NegatedSet(fwd.toSeq, bwd.toSeq)
    }
    def primary(): GraphQuery.PathExpr =
      if (peekc == '(') {
        i += 1
        val e = alt()
        require(peekc == ')', s"unbalanced parens in path $s")
        i += 1
        e
      } else {
        val j0 = i
        while (i < s.length && !"^|/+*()?".contains(s.charAt(i))) i += 1
        require(i > j0, s"empty path step at offset $j0 in $s")
        Pred(expandPrefixed(s.substring(j0, i), prefixes))
      }
    def postfix(e: GraphQuery.PathExpr): GraphQuery.PathExpr =
      if (peekc == '+') {
        i += 1
        val j0 = i
        while (i < s.length && s.charAt(i).isDigit) i += 1
        if (i > j0) Plus(e, s.substring(j0, i).toInt) // e+N bounded
        else PlusAll(e)                               // e+ to fixpoint
      } else if (peekc == '*') {
        i += 1
        Star(e) // reflexive: identity over every graph term, then e+
      } else if (peekc == '?') {
        i += 1
        Opt(e) // zero-or-one: the same identity, plus e's own pairs
      } else e
    val e = alt()
    require(i == s.length, s"trailing path syntax at offset $i in $s")
    e
  }

  /** A path pattern compiled to its binding frame: the pair set of the
    * path, endpoints renamed to the pattern's variables or filtered on
    * its constants (set semantics, as SPARQL paths are).
    */
  private def pathFrame(triples: DataFrame, tp: TriplePattern,
      expr: GraphQuery.PathExpr): DataFrame = {
    require(tp.vars.nonEmpty, s"path pattern $tp binds no variable")
    // constant-endpoint seeding: `<c> p+ ?x` starts the closure frontier
    // AT c (a bound object seeds the reversed path and swaps back)
    // instead of filtering the full-graph fixpoint afterwards — the cost
    // becomes the constant's reachable cone (GraphQuery.pathPairsFrom)
    def seed(c: String): DataFrame =
      triples.sparkSession.range(1).select(lit(c).as("src"))
    val pairs =
      if (!tp.s.startsWith("?"))
        GraphQuery.pathPairsFrom(triples, expr, seed(tp.s))
      else if (!tp.o.startsWith("?"))
        GraphQuery.pathPairsFrom(triples, GraphQuery.reverse(expr), seed(tp.o))
          .select(col("dst").as("src"), col("src").as("dst"))
      else GraphQuery.pathPairs(triples, expr)
    if (tp.s == tp.o) {
      // ?x path ?x — an equality constraint on the pair set, one column
      pairs.where(col("src") === col("dst"))
        .select(col("src").as(tp.s.stripPrefix("?")))
    } else {
      var df = pairs
      def slot(c: String, t: String): Unit =
        if (t.startsWith("?")) df = df.withColumnRenamed(c, t.stripPrefix("?"))
        else df = df.where(col(c) === lit(t)).drop(c)
      slot("src", tp.s); slot("dst", tp.o)
      df
    }
  }

  // -------------------------------------------------------------- planner

  /** Session stats cache, keyed by the triple table's canonicalized
    * logical plan: N queries against the same table pay ONE statistics
    * job (at 100-TB scale the stats aggregation is itself a full-table
    * pass — it belongs to the TABLE, not the query). Bounded; staleness
    * is safe by construction because statistics only influence join
    * ORDER, never the result set — a stale entry costs plan quality,
    * not correctness. [[clearStatsCache]] drops it (e.g. after a bulk
    * rewrite of the underlying table).
    */
  private val statsCacheMax = 32
  // access-ordered LRU (r6, ADVICE r5): the r5 cache (a) keyed by the
  // canonicalized LogicalPlan itself, pinning plan trees and their RDD
  // references for the JVM lifetime, and (b) evicted by wholesale
  // clear() at 32 entries, re-paying EVERY table's stats job after the
  // 33rd distinct table. An Int semanticHash key cannot pin plans, and
  // LRU eviction drops exactly the coldest table. A hash collision can
  // only swap in another table's stats, which — like the documented
  // staleness — costs join-ORDER quality, never correctness.
  private val statsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Integer, GraphQuery.BgpStats](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Integer, GraphQuery.BgpStats]): Boolean =
        size() > statsCacheMax
    })

  def clearStatsCache(): Unit = statsCache.clear()

  private[graft] def statsCacheSize: Int = statsCache.size()

  private[graft] def cachedStats(triples: DataFrame): GraphQuery.BgpStats = {
    val key: Integer = triples.queryExecution.analyzed.canonicalized.semanticHash()
    val hit = statsCache.get(key)
    if (hit != null) hit
    else {
      val s = GraphQuery.BgpStats.compute(triples)
      statsCache.put(key, s)
      s
    }
  }

  /** Parse and plan `queryText` against a (subj, pred, obj) triple table. */
  def sparql(triples: DataFrame, queryText: String): DataFrame =
    sparql(triples, queryText, None)

  /** [[sparql]] with caller-provided predicate statistics — the API a
    * store uses to hold VoID stats precomputed beside the table instead
    * of deriving them per query (`stats = None` falls back to the
    * session cache, then to one compute job).
    */
  def sparql(triples: DataFrame, queryText: String,
      stats: Option[GraphQuery.BgpStats]): DataFrame = {
    val q = parse(queryText)
    q.template.foreach(tp => require(!isPath(tp.p),
      s"property paths are not allowed in CONSTRUCT templates: $tp"))
    // predicate statistics for BGP join ordering: caller-provided, else
    // session-cached, else computed at most ONCE per query (lazy —
    // single-pattern-only queries never pay the job) and shared by every
    // group AND by subqueries
    lazy val bgpStats = stats.getOrElse(cachedStats(triples))
    def matchBgp(ps: Seq[GraphQuery.TriplePattern]) =
      GraphQuery.bgpMatch(triples, ps,
        if (ps.lengthCompare(1) > 0) Some(bgpStats) else None)
    // each distinct path text parses ONCE per query — the estimate
    // thunks, union-branch estimates and frame construction all share
    // the same PathExpr instead of re-parsing up to three times
    val pathExprCache =
      scala.collection.mutable.Map.empty[String, GraphQuery.PathExpr]
    def pathExprOf(tp: TriplePattern): GraphQuery.PathExpr =
      pathExprCache.getOrElseUpdate(tp.p,
        parsePath(pathText(tp.p), q.prefixes))
    // per-pattern cardinality estimate, path-aware: a path frame's cost
    // folds into frame ordering next to plain patterns (a constant
    // endpoint shrinks it by the term universe, mirroring
    // BgpStats.estimate's constant-slot rule)
    def patternEst(tp: TriplePattern): Double =
      if (isPath(tp.p)) {
        var e = bgpStats.estimatePath(pathExprOf(tp))
        if (!tp.s.startsWith("?"))
          e /= math.max(1.0, bgpStats.totalSubjects.toDouble)
        if (!tp.o.startsWith("?"))
          e /= math.max(1.0, bgpStats.totalObjects.toDouble)
        e
      } else bgpStats.estimate(tp)
    def groupEst(g: GGroup): Double =
      if (g.patterns.nonEmpty) g.patterns.map(patternEst).min
      else bgpStats.totalTriples.toDouble
    // greedy frame order — cheapest first, then cheapest CONNECTED (the
    // same law orderPatterns applies inside the plain BGP), so a
    // selective path or union can anchor the join prefix and an
    // expensive closure defers to the end. Estimates are thunks: a
    // single-frame group never forces the stats job. Inner equi-joins
    // and cross joins commute, so this is semantics-preserving; the
    // final SELECT fixes the output column order either way.
    def greedyJoin(frames: Seq[(DataFrame, () => Double)]): DataFrame =
      if (frames.lengthCompare(1) == 0) frames.head._1
      else {
        val est = frames.map(_._2())
        val vars = frames.map(_._1.columns.toSet)
        val remaining =
          scala.collection.mutable.LinkedHashSet(frames.indices: _*)
        val bound = scala.collection.mutable.Set.empty[String]
        def pick(c: Iterable[Int]): Int = c.minBy(i => (est(i), i))
        var acc: DataFrame = null
        while (remaining.nonEmpty) {
          val connected = remaining.filter(i => vars(i).exists(bound))
          val next = if (acc != null && connected.nonEmpty) pick(connected)
                     else pick(remaining)
          val f = frames(next)._1
          acc =
            if (acc == null) f
            else {
              val shared = acc.columns.toSeq.intersect(f.columns.toSeq)
              if (shared.nonEmpty) acc.join(f, shared) else acc.crossJoin(f)
            }
          bound ++= vars(next)
          remaining -= next
        }
        acc
      }
    // one group composed to its binding frame, RECURSIVELY — identical
    // machinery at every depth: plain patterns via the stats-ordered
    // BGP, paths via (possibly seeded) pair sets, UNION branches and
    // subqueries as frames, all greedy-joined; then nested OPTIONALs
    // left-join, EXISTS/MINUS semi/anti-join, BINDs compute, VALUES
    // restrict, and the group's own FILTERs narrow the result — so an
    // inner FILTER scopes to its group, never the enclosing solution
    def groupEval(g: GGroup): DataFrame = {
      val (pathPs, plainPs) = g.patterns.partition(tp => isPath(tp.p))
      val unionFrames = g.unions.map { branches =>
        // branches bind identical var sets (parse-checked); align
        // columns to the first branch's order before the bag union
        val order = branches.head.allVars
        val f = branches.map(b => groupEval(b).select(order.map(col): _*))
          .reduce(_ unionAll _)
        // a union's size is the sum of its branches; a branch joins
        // DOWN from its cheapest member
        (f, () => branches.map(groupEst).sum)
      }
      val subFrames = g.subqueries.map { case (t, _) =>
        // thread the outer stats through — a subquery against the same
        // table must never pay its own stats job
        (sparql(triples, t, Some(bgpStats)),
          () => bgpStats.totalTriples.toDouble)
      }
      val frames: Seq[(DataFrame, () => Double)] =
        (if (plainPs.nonEmpty)
           Seq((matchBgp(plainPs), () => plainPs.map(patternEst).min))
         else Seq.empty) ++
        pathPs.map(tp => (pathFrame(triples, tp, pathExprOf(tp)),
          () => patternEst(tp))) ++
        unionFrames ++ subFrames
      var df = greedyJoin(frames)
      g.optionals.foreach { og =>
        val f = groupEval(og)
        val shared = df.columns.toSeq.intersect(f.columns.toSeq)
        require(shared.nonEmpty,
          "OPTIONAL group shares no variable with the preceding graph")
        df = df.join(f, shared, "left")
      }
      g.exists.foreach { case (eg, positive) =>
        val f = groupEval(eg)
        val shared = df.columns.toSeq.intersect(f.columns.toSeq)
        df = df.join(f.select(shared.map(col): _*), shared,
          if (positive) "left_semi" else "left_anti")
      }
      g.minuses.foreach { mg =>
        // SPARQL MINUS over patterns sharing variables = anti-join on
        // the shared domain (the FILTER NOT EXISTS-coincident case;
        // disjoint domains are rejected at parse time)
        val f = groupEval(mg)
        val shared = df.columns.toSeq.intersect(f.columns.toSeq)
        require(shared.nonEmpty,
          "MINUS group shares no variable with the preceding graph")
        df = df.join(f.select(shared.map(col): _*), shared, "left_anti")
      }
      // BIND first: VALUES and FILTER may reference computed bindings
      // (VALUES is a restriction/join — it commutes with the computation)
      g.binds.foreach { case (v, e) => df = df.withColumn(v, valCol(e)) }
      g.values.foreach { v =>
        df = df.where(col(v.v).isInCollection(v.consts))
      }
      g.valueTables.foreach { vt =>
        // inline data is tiny by construction: broadcast the tuple table
        // and inner-join on the variable columns
        val rows = vt.rows.map(r => org.apache.spark.sql.Row(r: _*))
        val schema = org.apache.spark.sql.types.StructType(vt.vars.map(v =>
          org.apache.spark.sql.types.StructField(v,
            org.apache.spark.sql.types.StringType)))
        val inline = triples.sparkSession.createDataFrame(
          triples.sparkSession.sparkContext.parallelize(rows, 1), schema)
        df = df.join(broadcast(inline), vt.vars)
      }
      g.filters.foreach(f => df = df.where(boolCol(f)))
      df
    }
    var df = groupEval(q.root)
    q.form match {
      case "SELECT" =>
        val sortCols = q.orderBy.map { case (v, asc) =>
          if (asc) col(v).asc else col(v).desc
        }
        // an ORDER BY key outside the SELECT list (plain non-DISTINCT
        // selects only, parse-validated): sort BEFORE projecting, while
        // the key column still exists — Catalyst keeps the order through
        // the project (TakeOrderedAndProject under a LIMIT)
        val preSorted = q.aggs.isEmpty && q.orderBy.nonEmpty &&
          q.orderBy.exists { case (v, _) => !q.select.contains(v) }
        var out =
          if (q.aggs.isEmpty) {
            val base = if (preSorted) df.orderBy(sortCols: _*) else df
            base.select(q.select.map(col): _*)
          } else {
            // numeric aggregates cast bindings to double (triple objects
            // are strings); COUNT/MIN/MAX operate on the raw binding
            val aggCols = q.aggs.map { a =>
              val c = if (a.operand == "*") null
                else col(a.operand.stripPrefix("?"))
              (a.fn match {
                case "COUNT" =>
                  if (a.operand == "*") count(lit(1))
                  else if (a.distinct) count_distinct(c)
                  else count(c)
                case "SUM" =>
                  if (a.distinct) sum_distinct(c.cast("double"))
                  else sum(c.cast("double"))
                case "AVG"   => avg(c.cast("double"))
                case "MIN"   => min(c)
                case "MAX"   => max(c)
                // deterministic forms of SPARQL's order-free aggregates,
                // so another engine can recompute them value-exact:
                // GROUP_CONCAT emits members in sorted order (separator
                // from the SEPARATOR clause, default one space); SAMPLE
                // picks the minimum binding
                case "GROUP_CONCAT" =>
                  concat_ws(a.sep, sort_array(collect_list(c)))
                case "SAMPLE" => min(c)
              }).as(a.alias)
            }
            var agged = df.groupBy(q.groupBy.map(col): _*)
              .agg(aggCols.head, aggCols.tail: _*)
            q.havings.foreach(h => agged = agged.where(boolCol(h)))
            agged.select(q.select.map(col): _*)
          }
        if (q.distinct) out = out.distinct()
        if (q.orderBy.nonEmpty && !preSorted)
          out = out.orderBy(sortCols: _*)
        q.offset.foreach(n => out = out.offset(n))
        q.limit.foreach(n => out = out.limit(n))
        out
      case "CONSTRUCT" =>
        // OFFSET/LIMIT bound the solution sequence BEFORE templating
        // (SPARQL order); the constructed graph is a set, hence distinct
        val paged = q.offset.map(df.offset).getOrElse(df)
        val sols = q.limit.map(paged.limit).getOrElse(paged)
        q.template.map { tp =>
          sols.select(tp.slots.map { case (c, t) =>
            (if (t.startsWith("?")) col(t.stripPrefix("?")) else lit(t)).as(c)
          }: _*)
        }.reduce(_ unionAll _).distinct()
      case "ASK" =>
        // limit(1) first: existence needs one row, not the full count
        df.limit(1).agg((count(lit(1)) > 0).as("ask"))
      case "DESCRIBE" =>
        // outgoing description: every triple whose subject is bound to a
        // described variable in some solution (set semantics)
        val ids = q.select.map(v => df.select(col(v).as("subj")))
          .reduce(_ unionAll _).where(col("subj").isNotNull).distinct()
        triples.join(ids, Seq("subj"), "left_semi")
          .select(col("subj"), col("pred"), col("obj")).distinct()
    }
  }
}

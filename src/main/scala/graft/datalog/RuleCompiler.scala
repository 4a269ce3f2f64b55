package graft.datalog

import Ast._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType
import scala.collection.mutable

/** Compiles one Datalog rule into a DataFrame plan.
  *
  * Translation scheme (the §2.2 equivalent of SURVEY.md — reference:
  * /root/reference/datalog/.../logical/LogicalPlanGenerator.scala):
  *   - positive body atoms fold left-to-right into equi inner joins, with
  *     join conditions derived from variable co-occurrence; constants and
  *     intra-atom repeated variables become scan-level filters (pushed to
  *     the source by Catalyst);
  *   - comparisons compile to filters; `Unbound = boundExpr` comparisons
  *     are assignments binding a new variable to a computed column;
  *   - negated atoms compile to `left_anti` joins (cleaner than the
  *     reference's LeftOuter+IsNull at LogicalPlanGenerator.scala:192-213);
  *   - `sort((V,dir))`/`limit(n)` apply to the body before projection
  *     (:387-409);
  *   - aggregate heads group by the plain head args over the body *bag*
  *     (no pre-distinct — matches the reference, which aggregates the raw
  *     join output);
  *   - FloatType columns widen to double at scan, matching the reference's
  *     float-arithmetic behavior observed in its MLM golden answers.
  *
  * Output columns are positional: c0..c{n-1}.
  */
object RuleCompiler {

  final class CompileException(msg: String) extends RuntimeException(msg)

  /** Thrown by a resolver to signal "this predicate has no facts yet" —
    * the enclosing rule variant contributes nothing this iteration. */
  final class SkipRule extends RuntimeException

  /** resolve(predName, occurrenceIndexAmongThatPredInThisRule) → DataFrame */
  type Resolver = (String, Int) => DataFrame

  /** Once-per-(head, atom) warn guard, scoped by the CALLER (one per
    * evaluator, so the fixpoint loop's per-iteration recompiles don't
    * spam the warning, but a fresh program/context warns afresh — a
    * JVM-global set suppressed warnings across unrelated contexts that
    * happened to reuse predicate names, and grew without bound under
    * magic-set-generated heads). */
  type WarnedSet = scala.collection.mutable.Set[(String, String)]
  def newWarnedSet(): WarnedSet = scala.collection.mutable.Set.empty

  /** A body atom sharing no variables with the atoms before it forces a
    * cartesian product — semantically required by Datalog, but a silent
    * quadratic blowup at scale. Policy from `spark.datalog.crossjoin`
    * (warn|error|allow, default warn). */
  private def onCrossJoin(rule: Rule, atom: BodyAtom, policy: String,
      warned: WarnedSet): Unit = {
    lazy val msg = s"rule for '${rule.head.pred}': body atom " +
      s"'${atom.pred}' shares no variables with the preceding atoms — " +
      "compiling a CARTESIAN product (quadratic at scale; set " +
      "spark.datalog.crossjoin=allow to silence or =error to reject)"
    policy match {
      case "error" => throw new CompileException(msg)
      case "allow" => ()
      case _ =>
        if (warned.add((rule.head.pred, atom.pred)))
          System.err.println(s"[graft.datalog] $msg")
    }
  }

  def compile(rule: Rule, resolve: Resolver,
      crossJoinPolicy: String = "warn",
      crossWarned: WarnedSet = newWarnedSet(),
      shjBuildLeftFor: String => Boolean = _ => false): DataFrame = {
    val varMap = mutable.Map[String, Column]()
    var cur: Option[DataFrame] = None
    var atomIdx = 0
    val occCount = mutable.Map[String, Int]().withDefaultValue(0)
    var sortSpec: Option[SortSpec] = None
    var limitSpec: Option[LimitSpec] = None
    val negAtoms = mutable.ArrayBuffer[BodyAtom]()
    var pending = List[Comparison]()

    def boundExpr(e: Expr): Boolean = e match {
      case TermExpr(Variable(v)) => varMap.contains(v)
      case TermExpr(Constant(_)) => true
      case TermExpr(Anon) => false
      case Arith(_, l, r) => boundExpr(l) && boundExpr(r)
    }

    def column(e: Expr): Column = e match {
      case TermExpr(Variable(v)) =>
        varMap.getOrElse(v, throw new CompileException(s"unbound variable $v"))
      case TermExpr(Constant(x)) => lit(x)
      case TermExpr(Anon) => throw new CompileException("'_' in expression")
      case Arith(op, l, r) =>
        val (cl, cr) = (column(l), column(r))
        op match {
          case "+" => cl + cr
          case "-" => cl - cr
          case "*" => cl * cr
          case "/" => cl / cr
        }
    }

    def compileComparison(c: Comparison): Column = {
      val (cl, cr) = (column(c.l), column(c.r))
      c.op match {
        case "=" => cl === cr
        case "~=" => cl =!= cr
        case "<" => cl < cr
        case ">" => cl > cr
        case "<=" => cl <= cr
        case ">=" => cl >= cr
      }
    }

    /** Try to consume a comparison: assignment if one side is a lone
      * unbound variable and the other is bound; filter if fully bound;
      * otherwise leave pending. Returns true if consumed. */
    def tryComparison(c: Comparison): Boolean = (c.l, c.r) match {
      case (TermExpr(Variable(v)), r) if !varMap.contains(v) && c.op == "=" && boundExpr(r) =>
        varMap(v) = column(r); true
      case (l, TermExpr(Variable(v))) if !varMap.contains(v) && c.op == "=" && boundExpr(l) =>
        varMap(v) = column(l); true
      case (l, r) if boundExpr(l) && boundExpr(r) =>
        cur = Some(cur match {
          case Some(df) => df.filter(compileComparison(c))
          case None =>
            throw new CompileException("comparison filter with no relation in scope")
        })
        true
      case _ => false
    }

    def retryPending(): Unit = {
      var progress = true
      while (progress) {
        progress = false
        val (done, rest) = pending.partition(tryComparison)
        // partition evaluates tryComparison with side effects; done = consumed
        if (done.nonEmpty) progress = true
        pending = rest
      }
    }

    /** Scan an atom's relation with fresh unique column names (self-join
      * safe); float columns widen to double. */
    def scanAtom(atom: BodyAtom): (DataFrame, IndexedSeq[String]) = {
      val occ = occCount(atom.pred)
      occCount(atom.pred) = occ + 1
      val base = resolve(atom.pred, occ)
      if (base.columns.length != atom.args.length)
        throw new CompileException(
          s"${atom.pred} has arity ${base.columns.length}, used with ${atom.args.length}")
      val names = base.columns.indices.map(i => s"__t${atomIdx}_c$i")
      atomIdx += 1
      val proj = base.select(base.columns.zipWithIndex.map { case (c, i) =>
        val cc = base.col(c)
        val widened =
          if (base.schema(i).dataType == FloatType) cc.cast("double") else cc
        widened.as(names(i))
      }: _*)
      (proj, names)
    }

    def processAtom(atom: BodyAtom): Unit = {
      val (df0, names) = scanAtom(atom)
      var df = df0
      val joinConds = mutable.ArrayBuffer[Column]()
      val localBind = mutable.Map[String, String]() // var -> col name in this atom
      atom.args.zipWithIndex.foreach { case (arg, i) =>
        arg match {
          case Constant(x) => df = df.filter(col(names(i)) === lit(x))
          case Anon => ()
          case Variable(v) =>
            localBind.get(v) match {
              case Some(prev) => df = df.filter(col(names(i)) === col(prev))
              case None =>
                localBind(v) = names(i)
                if (varMap.contains(v)) joinConds += (col(names(i)) === varMap(v))
                else varMap(v) = col(names(i))
            }
        }
      }
      cur = Some(cur match {
        case None =>
          // joinConds here mean equality against pre-bound (assignment) vars
          joinConds.foldLeft(df)((d, c) => d.filter(c))
        case Some(acc) =>
          if (joinConds.isEmpty) {
            onCrossJoin(rule, atom, crossJoinPolicy, crossWarned)
            acc.crossJoin(df)
          } else {
            // shuffle-hash hint scoped to THIS join (ADVICE r19): when
            // the incoming atom is a claimed static, hint the LEFT
            // (accumulated, delta-carrying) side so JoinSelection picks
            // a shuffled-hash join with the frontier built and the
            // claimed static streamed — without suppressing the
            // size-based broadcast of other small statics in the same
            // body (a whole-delta hint outranks BHJ at every join it
            // reaches first)
            val left =
              if (shjBuildLeftFor(atom.pred)) acc.hint("shuffle_hash") else acc
            left.join(df, joinConds.reduce(_ && _), "inner")
          }
      })
      retryPending()
    }

    /** Negation → left_anti on the shared (bound) variables; constants
      * and intra-atom repeats pre-filter the negated scan; unbound vars
      * are existential. Reference: anti-join via LeftOuter+IsNull
      * (LogicalPlanGenerator.scala:192-213). */
    def processNegation(atom: BodyAtom): Unit = {
      val acc = cur.getOrElse(
        throw new CompileException("negated atom with no positive relation in scope"))
      val (df0, names) = scanAtom(atom)
      var df = df0
      val joinConds = mutable.ArrayBuffer[Column]()
      val localBind = mutable.Map[String, String]()
      atom.args.zipWithIndex.foreach { case (arg, i) =>
        arg match {
          case Constant(x) => df = df.filter(col(names(i)) === lit(x))
          case Anon => ()
          case Variable(v) =>
            localBind.get(v) match {
              case Some(prev) => df = df.filter(col(names(i)) === col(prev))
              case None =>
                localBind(v) = names(i)
                if (varMap.contains(v)) joinConds += (col(names(i)) === varMap(v))
              // unbound in outer scope → existential, no condition
            }
        }
      }
      val cond = joinConds.reduceOption(_ && _).getOrElse(lit(true))
      cur = Some(acc.join(df, cond, "left_anti"))
    }

    // ---- body pass: atoms and comparisons in textual order, negation last
    rule.body.foreach {
      case a: BodyAtom if a.negated => negAtoms += a
      case a: BodyAtom => processAtom(a)
      case c: Comparison => if (!tryComparison(c)) pending = pending :+ c
      case s: SortSpec => sortSpec = Some(s)
      case l: LimitSpec => limitSpec = Some(l)
    }
    retryPending()
    if (pending.nonEmpty)
      throw new CompileException(
        s"unresolvable comparisons (unbound variables): $pending")

    // tuple rule (assignments only, e.g. `reach(A) <- A=3.`): one-row seed
    val spark = org.apache.spark.sql.SparkSession.active
    var body: DataFrame = cur.getOrElse(spark.range(1).toDF("__seed"))

    negAtoms.foreach { a =>
      // negation against the one-row seed needs cur set
      if (cur.isEmpty) cur = Some(body)
      processNegation(a)
      body = cur.get
    }

    // sort/limit before head projection (reference :387-409; PYMK top-k)
    sortSpec.foreach { s =>
      val keys = s.keys.map { case (v, asc) =>
        val c = varMap.getOrElse(v, throw new CompileException(s"sort on unbound $v"))
        if (asc) c.asc else c.desc
      }
      body = body.orderBy(keys: _*)
    }
    limitSpec.foreach(l => body = body.limit(l.n))

    // ---- head projection
    val head = rule.head
    if (!head.isAggregate) {
      body.select(head.args.zipWithIndex.map {
        case (PlainArg(e), i) => column(e).as(s"c$i")
        case (a: AggArg, _) =>
          throw new CompileException(s"unexpected aggregate ${a.func}") // unreachable
      }: _*)
    } else {
      val plain = head.args.zipWithIndex.collect {
        case (PlainArg(e), i) => (s"c$i", column(e))
      }
      val aggs = head.args.zipWithIndex.collect { case (a @ AggArg(f, e, v, _), i) =>
        if (v.isDefined && f != "count" && f != "countd" && f != "msum")
          throw new CompileException(
            s"functor/tuple argument is only defined for count (all " +
              s"non-null), countd (distinct tuples) and msum in recursion, not $f")
        val c = f match {
          case "min" | "mmin" => min(column(e))
          case "max" | "mmax" => max(column(e))
          case "sum" => sum(column(e))
          case "msum" =>
            if (v.isDefined)
              throw new CompileException(
                "msum<(K,V)> is only defined inside recursive cliques")
            sum(column(e))
          // multi-expression count (flattened functor/tuple term) counts
          // rows where every component is non-null, matching the
          // reference's UnresolvedFunction("count", exprs)
          case "count" =>
            if (e == TermExpr(Anon)) count(lit(1))
            else if (v.isEmpty) count(column(e))
            else count(when(a.exprs.map(column(_).isNotNull).reduce(_ && _), lit(1)))
          // stratified reading of the monotonic count: distinct keys
          case "mcount" =>
            if (e == TermExpr(Anon)) count(lit(1)) else countDistinct(column(e))
          // countd<(A,B,...)> = distinct tuples — the reference flattens
          // functor args into the aggregate's expression list
          // (LogicalPlanGenerator.scala:284-297)
          case "countd" =>
            val cols = a.exprs.map(column)
            countDistinct(cols.head, cols.tail: _*)
          case "avg" => avg(column(e))
          case other => throw new CompileException(s"unknown aggregate $other")
        }
        c.as(s"c$i")
      }
      val projected = body.select(
        plain.map { case (n, c) => c.as(n) } ++
          body.columns.map(col): _*)
      val agged =
        if (plain.isEmpty) projected.agg(aggs.head, aggs.tail: _*)
        else projected.groupBy(plain.map(p => col(p._1)): _*).agg(aggs.head, aggs.tail: _*)
      // restore head-arg order
      agged.select(head.args.indices.map(i => col(s"c$i")): _*)
    }
  }
}

package graft.datalog

import Ast._
import scala.collection.mutable

/** Semantic analysis of a Datalog program: predicate dependency graph →
  * Tarjan SCCs → evaluation order; stratification checks (negation and
  * stratified aggregates must not cross a cycle); clique classification
  * (plain semi-naive vs monotonic-aggregate recursion).
  *
  * Mirrors the reference's compiler-side analysis (the DeALS jar decides
  * SemiNaive vs MonotonicSemiNaive evaluation types; see SURVEY.md §2.2
  * RECURSIVE_CLIQUE and /root/reference/datalog/.../logical/
  * LogicalPlanGenerator.scala:78-128).
  */
final class Analysis(val program: Program) {

  final class AnalysisException(msg: String) extends RuntimeException(msg)

  /** rules grouped by head predicate (IDB predicates) */
  val rulesFor: Map[String, Seq[Rule]] = program.rules.groupBy(_.head.pred)

  val edbPreds: Set[String] = program.decls.map(_.name).toSet

  def isIdb(p: String): Boolean = rulesFor.contains(p)

  /** direct positive+negative IDB dependencies of a predicate */
  private def deps(p: String): Seq[String] =
    rulesFor.getOrElse(p, Nil).flatMap(_.bodyAtoms.map(_.pred)).filter(isIdb)

  /** Tarjan strongly-connected components over IDB predicates, emitted in
    * reverse topological order (dependencies before dependents). */
  lazy val sccs: Seq[Seq[String]] = {
    val index = mutable.Map[String, Int]()
    val low = mutable.Map[String, Int]()
    val onStack = mutable.Set[String]()
    val stack = mutable.Stack[String]()
    var counter = 0
    val out = mutable.ArrayBuffer[Seq[String]]()

    def strongConnect(v: String): Unit = {
      index(v) = counter; low(v) = counter; counter += 1
      stack.push(v); onStack += v
      for (w <- deps(v)) {
        if (!index.contains(w)) {
          strongConnect(w)
          low(v) = math.min(low(v), low(w))
        } else if (onStack(w)) {
          low(v) = math.min(low(v), index(w))
        }
      }
      if (low(v) == index(v)) {
        val comp = mutable.ArrayBuffer[String]()
        var w = ""
        while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
        out += comp.toSeq
      }
    }
    rulesFor.keys.toSeq.sorted.foreach(p => if (!index.contains(p)) strongConnect(p))
    out.toSeq // Tarjan emits components in reverse topological order already
  }

  /** predicate → the SCC it belongs to */
  lazy val sccOf: Map[String, Set[String]] = {
    val m = mutable.Map[String, Set[String]]()
    for (scc <- sccs; p <- scc) m(p) = scc.toSet
    m.toMap
  }

  /** Is this predicate part of a recursive clique (multi-member SCC or
    * self-loop)? */
  def isRecursive(p: String): Boolean = {
    val scc = sccOf(p)
    scc.size > 1 || deps(p).contains(p)
  }

  /** A recursive clique's classification. */
  final case class Clique(preds: Set[String], monotonic: Boolean) {
    def exitRules(p: String): Seq[Rule] =
      rulesFor(p).filterNot(r => r.bodyAtoms.exists(a => preds(a.pred)))
    def recursiveRules(p: String): Seq[Rule] =
      rulesFor(p).filter(r => r.bodyAtoms.exists(a => preds(a.pred)))
  }

  def cliqueOf(p: String): Clique = {
    val preds = sccOf(p)
    val allRules = preds.toSeq.flatMap(rulesFor(_))
    val monotonicHeads = allRules.filter(_.head.isMonotonicAgg).map(_.head.pred).toSet
    val stratifiedAggHeads = allRules
      .filter(r => r.head.isAggregate && !r.head.isMonotonicAgg).map(_.head.pred).toSet

    // Stratification checks:
    // 1. no negated clique-member in a clique rule body
    for (r <- allRules; a <- r.bodyAtoms if a.negated && preds(a.pred))
      throw new AnalysisException(
        s"program is not stratified: ~${a.pred} inside recursive clique ${preds.mkString(",")}")
    // 2. stratified aggregates may not be produced inside the clique
    if (stratifiedAggHeads.nonEmpty)
      throw new AnalysisException(
        s"stratified aggregate head(s) ${stratifiedAggHeads.mkString(",")} inside recursion " +
          "— only monotonic mmin/mmax are legal in recursive cliques")
    // 3. monotonic cliques: every rule of an mmin/mmax predicate must carry
    //    the same aggregate signature
    if (monotonicHeads.nonEmpty) {
      for (p2 <- monotonicHeads; r <- rulesFor(p2)) {
        if (!r.head.isMonotonicAgg)
          throw new AnalysisException(
            s"predicate $p2 mixes monotonic-aggregate and plain rule heads")
        for (agg <- r.head.aggArgs) agg.func match {
          case "mmin" | "mmax" =>
            if (agg.v.isDefined)
              throw new AnalysisException(
                s"${agg.func} takes a single expression, not a functor/tuple term")
          case "mcount" =>
            if (agg.e == TermExpr(Anon))
              throw new AnalysisException(
                "mcount<_> is not defined under set semantics — count a key: mcount<K>")
            if (agg.v.isDefined)
              throw new AnalysisException(
                "mcount takes a single key in recursion: mcount<K>")
          case "msum" =>
            if (agg.v.isEmpty || agg.rest.nonEmpty)
              throw new AnalysisException(
                "msum in recursion takes the tuple form msum<(K,V)>: " +
                  "sum over distinct support keys K of the max contribution V")
          case other =>
            throw new AnalysisException(s"unknown monotonic aggregate $other")
        }
      }
      if (!preds.forall(monotonicHeads))
        throw new AnalysisException(
          s"clique ${preds.mkString(",")} mixes monotonic-aggregate and plain predicates")
    }
    Clique(preds, monotonicHeads.nonEmpty)
  }

  /** Count of clique-member atoms in a rule body: 1 = linear, ≥2 = non-linear. */
  def recursiveLiteralCount(r: Rule, clique: Set[String]): Int =
    r.bodyAtoms.count(a => clique(a.pred))
}

package graft.datalog

/** AST for the DeAL-style Datalog dialect of the reference engine.
  *
  * Language surface (see SURVEY.md §1b; reference grammar lives in the
  * external DeALS jar, behavior reconstructed from
  * /root/reference/datalog/src/test/ suites):
  *   - `database({pred(Col:type, ...), ...}).` declarations
  *   - rules `head <- body.`; facts/queries `pred(args).`
  *   - body: atoms, negated atoms `~p(...)`, comparisons
  *     `= ~= < > <= >=`, arithmetic `+ - * /`, `sort((V,asc|desc))`,
  *     `limit(n)` pseudo-predicates
  *   - head aggregates `min/max/count/countd/sum/avg/mmin/mmax<X>`
  *   - variables start uppercase or `_`; lowercase identifiers in
  *     argument position are string constants (e.g. `avg_price(a,A)`);
  *     `_` is anonymous
  *   - `%` comments to end of line
  */
object Ast {

  sealed trait Term
  final case class Variable(name: String) extends Term
  case object Anon extends Term
  /** value is Int, Long, Double, Float or String (dates stay strings
    * until typed against a datetime column). */
  final case class Constant(value: Any) extends Term

  sealed trait Expr
  final case class TermExpr(t: Term) extends Expr
  final case class Arith(op: String, l: Expr, r: Expr) extends Expr

  /** Head argument: plain expression or aggregate. Aggregate arg may be
    * Anon for `count<_>`. The monotonic sum takes the tuple form
    * `msum<(K,V)>` — K is the support key, V the contribution value
    * (sum over distinct K of the max V seen; the partial-monotonic
    * semantics of the Datalog aggregate literature, left TODO by the
    * reference at AggregateSetRDD.scala:146-147) — carried in `v`.
    *
    * Functor/complex aggregate terms — tuples `(A,B,C)` and named
    * functors `f(A, g(B,C))` — flatten recursively into the aggregate's
    * expression list, as the reference does for InterpreterFunctor args
    * (LogicalPlanGenerator.scala:284-297): the first two land in `e`/`v`,
    * any further ones in `rest`. Only count/countd accept >1 expression
    * (count = rows where all non-null; countd = distinct tuples). */
  sealed trait HeadArg
  final case class PlainArg(e: Expr) extends HeadArg
  final case class AggArg(func: String, e: Expr, v: Option[Expr] = None,
      rest: Seq[Expr] = Nil)
      extends HeadArg {
    def exprs: Seq[Expr] = Seq(e) ++ v ++ rest
  }

  object AggArg {
    val stratified = Set("min", "max", "count", "countd", "sum", "avg")
    val monotonic = Set("mmin", "mmax", "mcount", "msum")
    val all: Set[String] = stratified ++ monotonic
  }

  final case class HeadAtom(pred: String, args: Seq[HeadArg]) {
    def aggArgs: Seq[AggArg] = args.collect { case a: AggArg => a }
    def isAggregate: Boolean = aggArgs.nonEmpty
    def isMonotonicAgg: Boolean =
      aggArgs.exists(a => AggArg.monotonic(a.func))
  }

  sealed trait BodyItem
  final case class BodyAtom(pred: String, args: Seq[Term], negated: Boolean)
      extends BodyItem
  final case class Comparison(op: String, l: Expr, r: Expr) extends BodyItem
  /** `sort((V,asc),(W,desc))` — applies to the rule body before head
    * projection (reference: LogicalPlanGenerator.scala:387-399). */
  final case class SortSpec(keys: Seq[(String, Boolean)]) extends BodyItem
  final case class LimitSpec(n: Int) extends BodyItem

  final case class Rule(head: HeadAtom, body: Seq[BodyItem]) {
    def bodyAtoms: Seq[BodyAtom] = body.collect { case a: BodyAtom => a }
  }

  final case class ColumnDecl(name: String, typeName: String)
  final case class PredDecl(name: String, cols: Seq[ColumnDecl])

  final case class Program(decls: Seq[PredDecl], rules: Seq[Rule])

  /** Query form: `tc(A,B).` / bound `tc(0,B).` */
  final case class QueryForm(pred: String, args: Seq[Term])
}

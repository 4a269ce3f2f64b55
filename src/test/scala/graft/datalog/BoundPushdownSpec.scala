package graft.datalog

/** Bound-argument pushdown: a bound query over a *left-linear* recursion
  * seeds the fixpoint instead of filtering the full closure; right-linear
  * forms (bound position fed by a non-recursive atom) must fall back to
  * post-filtering — results are identical either way. */
class BoundPushdownSpec extends DatalogSuite {
  private val db = "database({arc(X:integer, Y:integer)})."

  private def eval(program: String, query: String): (Set[String], Boolean) = {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(db + program)
    ctx.registerData("arc", Fixtures.graph1b)
    val rows = ctx.queryStrings(query).toSet
    (rows, ctx.lastBoundPushdown)
  }

  test("left-linear TC with bound first argument uses pushdown") {
    val ll = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B)."
    val (rows, pushed) = eval(ll, "tc(6,B).")
    assert(pushed, "expected exit-rule pushdown for left-linear TC")
    assert(rows == Set("[6,7]", "[6,8]", "[6,9]", "[6,10]"))
  }

  test("right-linear TC falls back to post-filter with identical results") {
    val rl = "tc(A,B) <- arc(A,B). tc(A,B) <- arc(A,C), tc(C,B)."
    val (rows, pushed) = eval(rl, "tc(6,B).")
    assert(!pushed, "right-linear bound head arg is not stable — no pushdown")
    assert(rows == Set("[6,7]", "[6,8]", "[6,9]", "[6,10]"))
  }

  test("non-linear TC falls back (second occurrence needs full relation)") {
    val nl = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), tc(C,B)."
    val (rows, pushed) = eval(nl, "tc(6,B).")
    assert(!pushed)
    assert(rows == Set("[6,7]", "[6,8]", "[6,9]", "[6,10]"))
  }

  test("bound seed with no matches yields an empty, well-typed result") {
    val ll = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B)."
    val (rows, pushed) = eval(ll, "tc(99,B).")
    assert(pushed && rows.isEmpty)
  }

  test("both arguments bound — stable subset pushes, rest post-filters") {
    val ll = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B)."
    // position 0 is stable (pushed as the seed); position 1 is fed by
    // arc each iteration (not stable) and is applied as a post-filter
    val (rows, pushed) = eval(ll, "tc(0,5).")
    assert(pushed)
    assert(rows == Set("[0,5]"))
  }
}

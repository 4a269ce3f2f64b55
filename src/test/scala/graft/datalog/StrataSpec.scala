package graft.datalog

/** Stratified composition across recursive cliques: a clique may be
  * negated or aggregated by a HIGHER stratum — two independent reach
  * fixpoints combined by negation, and an aggregate over their
  * difference. */
class StrataSpec extends DatalogSuite {
  private val db = "database({arc(X:integer, Y:integer)})."

  test("negation of one recursive clique inside another stratum") {
    // graph1: 0→1→…→5 and 0→6→…→10; from1 = {} seeds at 1 so chain 1..5
    val program =
      "from0(X) <- X=0. from0(Y) <- from0(X), arc(X,Y). " +
        "from1(X) <- X=1. from1(Y) <- from1(X), arc(X,Y). " +
        "only0(X) <- from0(X), ~from1(X)."
    runCase(db + program, "only0(A).",
      Map("arc" -> Fixtures.graph1),
      // from0 = {0..10}, from1 = {1..5} → only0 = {0, 6..10}
      Seq("[0]", "[6]", "[7]", "[8]", "[9]", "[10]"))
  }

  test("aggregate over the stratified difference of two cliques") {
    val program =
      "from0(X) <- X=0. from0(Y) <- from0(X), arc(X,Y). " +
        "from1(X) <- X=1. from1(Y) <- from1(X), arc(X,Y). " +
        "only0(X) <- from0(X), ~from1(X). " +
        "n_only0(count<X>) <- only0(X)."
    runCase(db + program, "n_only0(A).",
      Map("arc" -> Fixtures.graph1), Seq("[6]"))
  }
}

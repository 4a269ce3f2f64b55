package graft.datalog

/** Functor/complex terms in aggregate arguments — tuples `(A,B,...)` and
  * named functors `f(A, g(B,C))` flatten recursively into the aggregate's
  * expression list, mirroring the reference's InterpreterFunctor handling
  * (LogicalPlanGenerator.scala:284-297). */
class FunctorSpec extends DatalogSuite {
  val database = "database({" +
    "sale(Region:string, Product:string, Store:integer, Amount:integer)" +
    "})."
  val sale = Seq(
    "east,apple,1,10",
    "east,apple,1,20", // duplicate (Region,Product,Store) triple
    "east,apple,2,30",
    "east,pear,1,40",
    "west,apple,1,50",
    "west,pear,2,60",
    "west,pear,2,70")

  test("countd over a 2-tuple: distinct pairs per group") {
    val p = "pairs(Region, countd<(Product, Store)>) <- sale(Region, Product, Store, _)."
    runCase(database + p, "pairs(Region, N).",
      Map("sale" -> sale),
      Seq("[east,3]", "[west,2]"))
  }

  test("countd over a 3-tuple: distinct triples, globally") {
    val p = "triples(countd<(Region, Product, Store)>) <- sale(Region, Product, Store, _)."
    runCase(database + p, "triples(N).",
      Map("sale" -> sale),
      Seq("[5]"))
  }

  test("named functor flattens like a tuple") {
    val p = "pairs(Region, countd<pair(Product, Store)>) <- sale(Region, Product, Store, _)."
    runCase(database + p, "pairs(Region, N).",
      Map("sale" -> sale),
      Seq("[east,3]", "[west,2]"))
  }

  test("nested functor flattens recursively") {
    val p = "triples(countd<key(Region, sub(Product, Store))>) <- sale(Region, Product, Store, _)."
    runCase(database + p, "triples(N).",
      Map("sale" -> sale),
      Seq("[5]"))
  }

  test("multi-expression count = rows where every component is non-null") {
    val p = "n(Region, count<(Product, Store)>) <- sale(Region, Product, Store, _)."
    runCase(database + p, "n(Region, N).",
      Map("sale" -> sale),
      Seq("[east,4]", "[west,3]"))
  }

  test("parenthesized arithmetic in an aggregate term is grouping, not a tuple") {
    val p = "m(Region, max<(Amount+10)*2>) <- sale(Region, _, _, Amount)."
    runCase(database + p, "m(Region, M).",
      Map("sale" -> sale),
      Seq("[east,100]", "[west,160]"))
  }

  test("sum rejects functor/tuple terms") {
    val p = "s(Region, sum<(Product, Store)>) <- sale(Region, Product, Store, _)."
    val ex = intercept[Exception] {
      runCase(database + p, "s(Region, S).", Map("sale" -> sale), Seq())
    }
    assert(ex.getMessage.contains("functor/tuple"))
  }

  test("mmin rejects functor/tuple terms") {
    val db = "database({arc(X:integer, Y:integer, C:integer)})."
    val p = "sp(Y, mmin<(C, C)>) <- arc(0, Y, C)." +
      "sp(Y, mmin<(D, C)>) <- sp(X, D), arc(X, Y, C)."
    val ex = intercept[Exception] {
      runCase(db + p, "sp(Y, D).", Map("arc" -> Seq("0,1,5")), Seq())
    }
    assert(ex.getMessage.contains("single expression"))
  }
}

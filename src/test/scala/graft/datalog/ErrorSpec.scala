package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** Error paths: the analyzer/compiler must reject unsafe programs with
  * actionable messages (reference behavior for unstratified programs
  * and illegal aggregates, SURVEY.md §2.2/§7). */
class ErrorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val db = "database({arc(X:integer, Y:integer)})."

  private def run(program: String, query: String): Unit = {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(db + program)
    ctx.registerData("arc", Fixtures.graph1)
    ctx.query(query).collect()
  }

  test("negation inside a recursive clique is rejected (not stratified)") {
    val e = intercept[Exception] {
      run("p(X) <- arc(X,_). p(X) <- p(Y), arc(Y,X), ~p(X).", "p(A).")
    }
    assert(e.getMessage.contains("stratified"))
  }

  test("stratified aggregate head inside recursion is rejected") {
    val e = intercept[Exception] {
      run("p(X, count<Y>) <- arc(X,Y). p(X, count<Y>) <- p(Y, _), arc(Y,X).",
        "p(A,B).")
    }
    assert(e.getMessage.contains("monotonic"))
  }

  test("mixing monotonic-aggregate and plain heads is rejected") {
    val e = intercept[Exception] {
      run("p(X, mmin<Y>) <- arc(X,Y). p(X, Y) <- p(Y, X).", "p(A,B).")
    }
    assert(e.getMessage.toLowerCase.contains("mixes"))
  }

  test("win/lose game: direct negative self-recursion is rejected") {
    // the XSB-style game over a move graph — locally stratified under
    // well-founded semantics, but OUTSIDE stratified Datalog: the
    // engine must reject it with the clique named, matching the
    // reference compiler's rejection path (its DeALS front end fails
    // compile; ref dl/BigDatalogContext.scala:124-138 surfaces it)
    val e = intercept[Exception] {
      run("win(X) <- arc(X,Y), ~win(Y).", "win(A).")
    }
    assert(e.getMessage.contains("stratified") && e.getMessage.contains("win"))
  }

  test("win/lose game: negative cycle through a second predicate is rejected") {
    // negation crossing predicates inside one SCC (win -> ~lose -> win):
    // the stratification check must see negated dependency edges when
    // forming cliques, or this would silently evaluate garbage
    val e = intercept[Exception] {
      run("win(X) <- arc(X,Y), ~lose(Y). lose(X) <- arc(X,Y), ~win(Y).",
        "win(A).")
    }
    assert(e.getMessage.contains("stratified"),
      s"expected a stratification rejection, got: ${e.getMessage}")
  }

  test("unknown relation is reported by name") {
    val e = intercept[Exception] { run("p(X) <- nosuch(X).", "p(A).") }
    assert(e.getMessage.contains("nosuch"))
  }

  test("arity mismatch is reported") {
    val e = intercept[Exception] { run("p(X) <- arc(X).", "p(A).") }
    assert(e.getMessage.contains("arity"))
  }

  test("unbound head variable is rejected") {
    val e = intercept[Exception] { run("p(X, Z) <- arc(X, _).", "p(A,B).") }
    assert(e.getMessage.contains("unbound"))
  }

  private def runCross(policy: Option[String]): Seq[String] = {
    val key = "spark.datalog.crossjoin"
    val prev = spark.conf.getOption(key)
    policy match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    try {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(
        "database({arc(X:integer, Y:integer), brc(X:integer, Y:integer)}). " +
          "p(X,Y) <- arc(X,_), brc(Y,_).")
      ctx.registerData("arc", Seq("1,2", "3,4"))
      ctx.registerData("brc", Seq("5,6", "7,8"))
      ctx.queryStrings("p(A,B).")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("disjoint body atoms compile a cartesian under the default policy") {
    // spark.datalog.crossjoin default `warn`: semantically required by
    // Datalog, so the product evaluates (2x2 = 4 rows) with a one-time
    // stderr warning
    assert(runCross(None).toSet ==
      Set("[1,5]", "[1,7]", "[3,5]", "[3,7]"))
  }

  test("spark.datalog.crossjoin=error rejects disjoint body atoms") {
    val e = intercept[Exception] { runCross(Some("error")) }
    assert(e.getMessage.contains("CARTESIAN") && e.getMessage.contains("brc"),
      s"expected the cartesian rejection naming the atom, got: ${e.getMessage}")
    // allow stays silent and evaluates
    assert(runCross(Some("allow")).size == 4)
  }

  test("spark.datalog.crossjoin validates its value") {
    val e = intercept[Exception] { runCross(Some("nope")) }
    assert(e.getMessage.contains("crossjoin"))
  }
}

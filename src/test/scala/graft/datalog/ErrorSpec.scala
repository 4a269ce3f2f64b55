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
}

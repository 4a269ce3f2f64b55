package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** SQL interop parity with the reference (whose BigDatalogContext IS a
  * SQLContext): base relations are temp views, and computed fixpoints
  * join into plain SQL after `registerDerived`. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("base relations and derived fixpoints are SQL-queryable") {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(
      "database({arc(X:integer, Y:integer)}). " +
        "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B).")
    ctx.registerData("arc", Fixtures.graph1b)
    // base relation visible to SQL with declared column names
    assert(ctx.sql("SELECT count(*) AS n FROM arc WHERE X = 0")
      .collect().head.getLong(0) == 3L)
    // fixpoint result composes with base relations in one SQL query
    val tc = ctx.registerDerived("tc")
    assert(tc.columns.toSeq == Seq("v0", "v1"))
    val joined = ctx.sql(
      """SELECT count(*) AS n
         FROM tc JOIN arc ON tc.v1 = arc.X
         WHERE tc.v0 = 0""").collect().head.getLong(0)
    // one joined row per (reachable node m, outgoing arc of m)
    val expected = ctx.query("tc(0,B).").collect()
      .map(_.getInt(1)).map(m => Fixtures.graph1b.count(_.startsWith(s"$m,"))).sum
    assert(joined >= 1 && joined == expected)
    ctx.close()
  }

  test("reset() drops the SQL views; close() drops only derived ones") {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(
      "database({arc(X:integer, Y:integer)}). " +
        "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B).")
    ctx.registerData("arc", Fixtures.graph1b)
    ctx.registerDerived("tc")
    assert(spark.catalog.tableExists("arc") && spark.catalog.tableExists("tc"))
    ctx.close()
    // derived view gone (its checkpoints were released); base survives
    assert(spark.catalog.tableExists("arc") && !spark.catalog.tableExists("tc"))
    ctx.reset()
    assert(!spark.catalog.tableExists("arc"),
      "a stale base view would silently serve pre-reset data")
  }

  test("registerDerived under a custom view name") {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(
      "database({arc(X:integer, Y:integer)}). " +
        "deg(X, count<Y>) <- arc(X, Y).")
    ctx.registerData("arc", Fixtures.graph1b)
    ctx.registerDerived("deg", "degrees")
    assert(ctx.sql("SELECT max(v1) FROM degrees").collect().head.getLong(0) == 3L)
    ctx.close()
  }
}

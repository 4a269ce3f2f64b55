package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** Spark 4.1 ships native recursive CTEs (`WITH RECURSIVE` →
  * UnionLoop/UnionLoopExec). Cross-validate the engine's semi-naive
  * fixpoint against Spark's own recursion — two independent executors
  * of the same semantics in one JVM, a stronger in-process oracle than
  * any hand-rolled reimplementation. Spark's implementation is
  * UNION ALL-only (bag semantics, no per-iteration dedup:
  * UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), which also documents WHY the
  * engine keeps its own loop: set-semantics deltas (delta = T(delta) ∖
  * all) terminate on cyclic data where bag recursion diverges — plus
  * magic-set bound pushdown, monotonic aggregation inside recursion,
  * mutual/non-linear cliques and claimed cross-iteration partitioning,
  * none of which UnionLoop has. */
class NativeRecursionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def engineTc(data: Seq[String]): Set[String] = {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(
      "database({arc(X:integer, Y:integer)}). " +
        "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B).")
    ctx.registerData("arc", data)
    try ctx.queryStrings("tc(A,B).").toSet
    finally ctx.close()
  }

  private def nativeTcDf(data: Seq[String]) = {
    import spark.implicits._
    data.map { s => val a = s.split(","); (a(0).trim.toInt, a(1).trim.toInt) }
      .toDF("x", "y").createOrReplaceTempView("arc_native")
    // UNION ALL is the only supported recursion shape; the closure is
    // finite on a DAG (finitely many paths), deduped outside the loop
    spark.sql(
      """WITH RECURSIVE tc(a, b) AS (
           SELECT x, y FROM arc_native
           UNION ALL
           SELECT tc.a, arc_native.y
           FROM tc JOIN arc_native ON tc.b = arc_native.x)
         SELECT DISTINCT a, b FROM tc""")
  }

  test("native WITH RECURSIVE matches the engine's TC on a DAG") {
    val ours = engineTc(Fixtures.graph1b)
    val native = nativeTcDf(Fixtures.graph1b)
      .collect().map(r => s"[${r.get(0)},${r.get(1)}]").toSet
    assert(native.nonEmpty && native == ours,
      s"native-vs-engine TC diverged: ${(native diff ours).take(5)} / ${(ours diff native).take(5)}")
  }

  test("cyclic TC: bag-semantics native recursion diverges, the engine terminates") {
    // graph2 holds the cycle 1→2→3→1. The engine's set-semantics delta
    // loop reaches the (finite) closure; UNION ALL recursion re-derives
    // the cycle's pairs forever and trips Spark's recursion guard.
    val ours = engineTc(Fixtures.graph2)
    assert(ours.nonEmpty && ours.contains("[1,1]"), s"engine closure wrong: $ours")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.cteRecursionLevelLimit", "25")
    import s2.implicits._
    Fixtures.graph2.map { s => val a = s.split(","); (a(0).trim.toInt, a(1).trim.toInt) }
      .toDF("x", "y").createOrReplaceTempView("arc_native")
    val e = intercept[Exception] {
      s2.sql(
        """WITH RECURSIVE tc(a, b) AS (
             SELECT x, y FROM arc_native
             UNION ALL
             SELECT tc.a, arc_native.y
             FROM tc JOIN arc_native ON tc.b = arc_native.x)
           SELECT DISTINCT a, b FROM tc""").collect()
    }
    assert(e.getMessage.toLowerCase.contains("recursion"),
      s"expected the recursion guard to fire, got: ${e.getMessage.take(120)}")
  }
}

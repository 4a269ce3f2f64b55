package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** Slices of one predicate can carry different (coercible) schemas —
  * an int-typed tuple seed vs long-typed recursive facts. Narrow
  * unions bypass the analyzer's type coercion, so they must refuse
  * mixed schemas (falling back to a coerced plain union) or values
  * above 2^31 would read truncated through the narrower schema. */
class SchemaCoercionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf[T](kvs: (String, String)*)(f: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("int seed + long facts stay exact beyond 2^31 on the slice path") {
    withConf(
      "spark.datalog.recursion.copartition.enabled" -> "true",
      "spark.datalog.recursion.localDeltaRows" -> "0",
      "spark.datalog.recursion.logplans" -> "true") {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(
        "database({arc(X:long, Y:long)}). " +
          "reach(X) <- X=0. reach(Y) <- reach(X), arc(X,Y).")
      ctx.registerData("arc",
        Seq("0,5000000000", "5000000000,5000000001", "5000000001,5000000002"))
      val rows = ctx.queryStrings("reach(A).").toSet
      assert(rows == Set("[0]", "[5000000000]", "[5000000001]", "[5000000002]"))
      // the widening is ONE-TIME: exactly one iteration re-slices the
      // chain (a duplicated (pred, iter) log entry); a nullability-
      // sensitive compare would re-fire it every iteration
      val perIter = ctx.iterationPlanLog.groupBy(e => (e._1, e._2))
      assert(perIter.count(_._2.size > 1) <= 1,
        s"chain widening re-fired: ${perIter.view.mapValues(_.size).toMap}")
      ctx.close()
    }
  }

  test("int seed + long costs stay exact on the monotonic copart path") {
    withConf("spark.datalog.recursion.copartition.enabled" -> "true") {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(
        "database({arc(X:long, Y:long, C:long)}). " +
          "mp(X,mmin<D>) <- X=0, D=0. " +
          "mp(Y,mmin<D>) <- mp(X,D1), arc(X,Y,C), D=D1+C.")
      ctx.registerData("arc",
        Seq("0,1,4000000000", "1,2,4000000000", "0,2,9000000000"))
      val rows = ctx.queryStrings("mp(A,D).").toSet
      assert(rows == Set("[0,0]", "[1,4000000000]", "[2,8000000000]"))
      ctx.close()
    }
  }

  test("decimal EDB: 128-bit exact sums beyond long range (exceeds reference)") {
    // 2^63 ≈ 9.2e18; two 9e18 values overflow long but sum exactly in
    // DecimalType(38,0) — the reference's DbLongLong converters throw
    // "unsupported" here (dl/Utilities.scala:34-45)
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(
      "database({v(K:long, P:decimal)}). tot(K, sum<P>) <- v(K, P).")
    ctx.registerData("v",
      Seq("1,9000000000000000000", "1,9000000000000000000", "2,5"))
    val rows = ctx.queryStrings("tot(K,S).").toSet
    assert(rows == Set("[1,18000000000000000000]", "[2,5]"), rows)
    ctx.close()
  }
}

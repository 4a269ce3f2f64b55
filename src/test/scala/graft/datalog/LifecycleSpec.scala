package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** Cache lifecycle: a fixpoint pins blocks (persisted static join
  * sides, localCheckpointed slices) and `close()` must drain them —
  * the reference's CachedRDDManager contract. Plus the row/byte
  * localization caps. */
class LifecycleSpec extends AnyFunSuite {
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

  private val db = "database({arc(X:integer, Y:integer)})."
  private val tc = "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B)."
  private val chain = (0 until 20).map(i => s"$i,${i + 1}")

  // Compare persistent-RDD ID SETS, not counts: the shared session's
  // ContextCleaner may concurrently unpersist garbage-collected RDDs
  // from earlier suites, so only the delta this test created is stable.
  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("close() returns the persistent-RDD registry to baseline (slice path)") {
    val baseline = persistedIds
    val ctx = new DatalogContext(spark)
    withConf(
      "spark.datalog.recursion.copartition.enabled" -> "true",
      "spark.datalog.recursion.localDeltaRows" -> "0") {
      ctx.loadProgram(db + tc)
      ctx.registerData("arc", chain)
      assert(ctx.query("tc(A,B).").count() == 20 * 21 / 2)
    }
    assert((persistedIds -- baseline).nonEmpty, "fixpoint must have pinned blocks")
    ctx.close()
    val leaked = persistedIds -- baseline
    assert(leaked.isEmpty, s"close() left persistent RDDs behind: $leaked")
  }

  test("close() drains the legacy except(all) path and monotonic state too") {
    val baseline = persistedIds
    val ctx = new DatalogContext(spark)
    withConf(
      "spark.datalog.recursion.copartition.enabled" -> "false",
      "spark.datalog.recursion.localDeltaRows" -> "0") {
      ctx.loadProgram(
        "database({arc(X:integer, Y:integer, C:integer)}). " +
          "p(X,mmin<D>) <- X=0, D=0. " +
          "p(Y,mmin<D>) <- p(X,D1), arc(X,Y,C), D=D1+C. " +
          "tc2(A,B) <- arc(A,B,_). tc2(A,B) <- tc2(A,C), arc(C,B,_).")
      ctx.registerData("arc", (0 until 15).map(i => s"$i,${i + 1},1"))
      assert(ctx.query("p(A,D).").count() == 16)
      assert(ctx.query("tc2(A,B).").count() == 15 * 16 / 2)
    }
    assert((persistedIds -- baseline).nonEmpty)
    ctx.close()
    val leaked = persistedIds -- baseline
    assert(leaked.isEmpty, s"close() left persistent RDDs behind: $leaked")
  }

  test("PackResources.releaseAll() drains pack memos (checkpoints + contexts)") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val baseline = persistedIds
    // one checkpoint-memoizing pack query + one fixpoint-context query
    assert(graft.SparkEntry.queries("txt_lsh_pairs")(spark, sfDir).count() >= 0)
    assert(graft.SparkEntry.queries("dl_reach")(spark, sfDir).count() > 0)
    assert((persistedIds -- baseline).nonEmpty, "packs must have pinned blocks")
    graft.SparkEntry.release()
    val leaked = persistedIds -- baseline
    val detail = leaked.map(id =>
      spark.sparkContext.getPersistentRDDs.get(id)
        .map(r => s"$id=${r.name}/${r.getClass.getSimpleName}@${r.toString}")
        .getOrElse(s"$id=gone"))
    assert(leaked.isEmpty, s"releaseAll() left persistent RDDs behind: $detail")
  }

  test("byte cap keeps wide-row deltas distributed; narrow rows localize") {
    val wideProg =
      "database({w(X:integer, S:string)}). " +
        "p(X,S) <- w(X,S). p(Y,S) <- p(X,S), w(Y,_), Y=X+1, Y<6."
    def run(bytes: String): Int = withConf(
      "spark.datalog.recursion.localDeltaBytes" -> bytes) {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(wideProg)
      ctx.registerData("w", (0 until 6).map(i => s"$i,payload_$i"))
      ctx.query("p(A,B).").count()
      val n = ctx.localizedSlices
      ctx.close()
      n
    }
    assert(run("4194304") > 0, "tiny narrow deltas must localize by default")
    assert(run("1") == 0, "a 1-byte cap must keep every delta distributed")
  }
}

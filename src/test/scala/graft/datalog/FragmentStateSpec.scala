package graft.datalog

import org.scalatest.funsuite.AnyFunSuite

/** Append-only fragment state for mmin/mmax fixpoints
  * (`spark.datalog.recursion.monotonic.fragmentstate`, r18): A/B
  * equality against the legacy tagged-union rewrite loop, engagement
  * accounting, compaction stress, and the nonlinear state-view read.
  * The driver-local path is pinned OFF throughout — these programs are
  * tiny, so without that both arms would take the zero-job driver path
  * and the spec would compare it to itself. */
class FragmentStateSpec extends AnyFunSuite {
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

  /** Run a program+query on one path; returns (rows, fragmentRuns). */
  private def run(
      fragment: String,
      db: String,
      program: String,
      query: String,
      data: Map[String, Seq[String]]): (Set[String], Int) =
    withConf(
      "spark.datalog.recursion.monotoniclocal" -> "false",
      "spark.datalog.recursion.monotonic.fragmentstate" -> fragment) {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(db + program)
      data.foreach { case (n, rows) => ctx.registerData(n, rows) }
      val rows = ctx.queryStrings(query).toSet
      val runs = ctx.monotonicFragmentRuns
      ctx.reset()
      (rows, runs)
    }

  private def ab(
      db: String, program: String, query: String,
      data: Map[String, Seq[String]]): Set[String] = {
    val (legacy, legacyRuns) = run("false", db, program, query, data)
    val (frag, fragRuns) = run("true", db, program, query, data)
    assert(legacyRuns == 0, "legacy arm must not take the fragment path")
    assert(fragRuns >= 1, "fragment arm did not engage the fragment path")
    assert(frag == legacy,
      s"\nquery: $query\nfragment-only: ${(frag -- legacy).take(5).mkString(", ")}" +
        s"\nlegacy-only: ${(legacy -- frag).take(5).mkString(", ")}")
    frag
  }

  private val dbW = "database({arc(X:integer, Y:integer, D:integer)})."
  private val dbU = "database({arc(X:integer, Y:integer)})."

  test("cc via mmin: fragment == legacy, and the golden component count") {
    val program = "cc3(X,mmin<X>) <- arc(X,_). " +
      "cc3(Y,mmin<V>) <- cc3(X,V), arc(X,Y). " +
      "cc2(X,min<Y>) <- cc3(X,Y). " +
      "cc(countd<X>) <- cc2(_,X)."
    val rows = ab(dbU, program, "cc(A)", Map("arc" -> Fixtures.graph1b))
    assert(rows == Set("[1]"))
  }

  test("sssp tuple seed: fragment == legacy (int seed widening + compaction)") {
    // seed = 1 row, so compactBase = 1 and the 2x threshold compacts on
    // nearly every iteration — the compaction lifecycle (retire all but
    // the live frontier, pendingRetire the frontier after the next
    // materialize) runs many times in one fixpoint
    val program = "mminpath(X,mmin<D>) <- X=0, D=0. " +
      "mminpath(Z,mmin<D>) <- mminpath(X,D1), arc(X,Z,D2), D=D1+D2. " +
      "sssp(X,min<D>) <- mminpath(X,D)."
    val rows = ab(dbW, program, "sssp(A,B)",
      Map("arc" -> Fixtures.graph1bWeighted))
    assert(rows == Set("[0,0]", "[1,1]", "[2,2]", "[3,3]", "[4,4]", "[5,5]",
      "[6,1]", "[7,2]", "[8,3]", "[9,4]", "[10,5]"))
  }

  test("all-pairs shortest paths, left-linear: fragment == legacy") {
    val program = "mminpath(X,Y,mmin<D>) <- arc(X,Y,D). " +
      "mminpath(X,Z,mmin<D>) <- mminpath(X,Y,D1), arc(Y,Z,D2), D=D1+D2. " +
      "shortestpaths(X,Z,min<D>) <- mminpath(X,Z,D)."
    ab(dbW, program, "shortestpaths(A,B,C)",
      Map("arc" -> Fixtures.graph3Weighted))
  }

  test("all-pairs shortest paths, NON-linear: the state-view read with superseded rows") {
    // the nonlinear variant reads ALL<mminpath> inside rule bodies —
    // under fragment state that view contains superseded (worse) rows;
    // monotonicity discards their derivations, so the least fixpoint
    // must be unchanged
    val program = "mminpath(X,Y,mmin<D>) <- arc(X,Y,D). " +
      "mminpath(X,Z,mmin<D>) <- mminpath(X,Y,D1), mminpath(Y,Z,D2), D=D1+D2. " +
      "shortestpaths(X,Z,min<D>) <- mminpath(X,Z,D)."
    ab(dbW, program, "shortestpaths(A,B,C)",
      Map("arc" -> Fixtures.graph1bWeighted))
  }

  test("mmax longest path on a DAG: the max ordering end-to-end") {
    val program = "wp(X,mmax<D>) <- X=0, D=0. " +
      "wp(Y,mmax<D>) <- wp(X,D1), arc(X,Y,D2), D=D1+D2. " +
      "longest(X,max<D>) <- wp(X,D)."
    ab(dbW, program, "longest(A,B)", Map("arc" -> Fixtures.graph3Weighted))
  }

  test("auto engages the fragment path when the driver-local path is off") {
    val program = "cc3(X,mmin<X>) <- arc(X,_). " +
      "cc3(Y,mmin<V>) <- cc3(X,V), arc(X,Y)."
    val (_, runs) = run("auto", dbU, program, "cc3(A,B)",
      Map("arc" -> Fixtures.graph1b))
    assert(runs >= 1)
  }

  test("plan pin: one delta-sized exchange per iteration, claims held") {
    // the fragment loop's scale economics live on two plan properties:
    // the candidate aggregate's exchange is the iteration's ONLY
    // shuffle (the state-merge join and its reduce reuse the claimed
    // hash(G) layout), and that must hold whether the static side is
    // broadcast (small) or claimed (big). A Catalyst upgrade that
    // breaks LogicalRDD claim validation or narrow-union partitioning
    // fails here loudly instead of silently re-exchanging state every
    // round at 100 TB.
    val program = "cc3(X,mmin<X>) <- arc(X,_). " +
      "cc3(Y,mmin<V>) <- cc3(X,V), arc(X,Y)."
    for (bcThreshold <- Seq(None, Some("1024"))) { // auto-broadcast | forced-claim
      val kvs = Seq(
        "spark.datalog.recursion.monotoniclocal" -> "false",
        "spark.datalog.recursion.monotonic.fragmentstate" -> "true",
        "spark.datalog.recursion.logplans" -> "true") ++
        bcThreshold.map("spark.sql.autoBroadcastJoinThreshold" -> _)
      val (rows, plans) = withConf(kvs: _*) {
        val ctx = new DatalogContext(spark)
        ctx.loadProgram(dbU + program)
        ctx.registerData("arc", Fixtures.graph1b)
        val rows = ctx.queryStrings("cc3(A,B).").toSet
        val plans = ctx.iterationPlanLog
        ctx.reset()
        (rows, plans)
      }
      assert(rows.nonEmpty)
      assert(plans.nonEmpty)
      plans.foreach { case (p, iter, exchanges, plan) =>
        assert(exchanges <= 1,
          s"bc=$bcThreshold $p iter=$iter: expected <=1 shuffle exchange " +
            s"(the delta-sized candidate agg), got $exchanges:\n$plan")
      }
    }
  }

  test("the loop restores the session's shuffle partitions and coalesce conf") {
    val program = "cc3(X,mmin<X>) <- arc(X,_). " +
      "cc3(Y,mmin<V>) <- cc3(X,V), arc(X,Y)."
    withConf(
      "spark.datalog.recursion.monotoniclocal" -> "false",
      "spark.datalog.recursion.monotonic.fragmentstate" -> "true",
      "spark.sql.shuffle.partitions" -> "7") {
      val ctx = new DatalogContext(spark)
      ctx.loadProgram(dbU + program)
      ctx.registerData("arc", Fixtures.graph1b)
      assert(ctx.queryStrings("cc3(A,B).").nonEmpty)
      ctx.reset()
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7",
        "loop must restore the session's shuffle partitions")
      assert(spark.conf
        .get("spark.sql.adaptive.coalescePartitions.enabled", "true") != "false" ||
        spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled").isEmpty)
    }
  }

  test("monotonicity guard: non-monotone body keeps the legacy loop under auto") {
    // ADVICE r18 (medium): the fragment view exposes superseded rows,
    // sound only for monotone derivations. D = 10 - D1 is the
    // anti-monotone shape — auto must fall back to the legacy
    // best-only loop (and so match its answer); an explicit `true`
    // bypasses the guard (the documented user-asserts escape hatch).
    val db = "database({arc(X:integer, Y:integer), " +
      "src(X:integer, D:integer)})."
    val flip = "w(X,mmin<D>) <- src(X,D). " +
      "w(Y,mmin<D>) <- w(X,D1), arc(X,Y), D=10-D1."
    val data = Map("arc" -> Seq("1,2", "2,3"), "src" -> Seq("1,7"))
    val (auto, autoRuns) = run("auto", db, flip, "w(A,B)", data)
    val (legacy, _) = run("false", db, flip, "w(A,B)", data)
    assert(autoRuns == 0,
      "auto must not engage fragments on a non-monotone body")
    assert(auto == legacy)
    assert(auto == Set("[1,7]", "[2,3]", "[3,7]"))
    val (_, forcedRuns) = run("true", db, flip, "w(A,B)", data)
    assert(forcedRuns >= 1, "explicit true must bypass the guard")
  }

  test("monotonicity guard: filters and joins on the aggregate variable fall back") {
    // a superseded row can PASS a filter/join the current best fails,
    // deriving candidates the best-only view never sees — both shapes
    // must be unverifiable even though their value derivations look
    // monotone
    val filt = "w(X,mmin<D>) <- X=0, D=0. " +
      "w(Y,mmin<D>) <- w(X,D1), arc(X,Y,C), D1<100, D=D1+C."
    val (_, fRuns) = run("auto", dbW, filt, "w(A,B)",
      Map("arc" -> Fixtures.graph3Weighted))
    assert(fRuns == 0, "filter on the aggregate variable must fall back")
    val db = "database({arc(X:integer, Y:integer, D:integer), " +
      "lut(A:integer, B:integer)})."
    val joined = "w(X,mmin<D>) <- X=0, D=0. " +
      "w(Y,mmin<D>) <- w(X,D1), arc(X,Y,_), lut(D1,D)."
    val (_, jRuns) = run("auto", db, joined, "w(A,B)",
      Map("arc" -> Fixtures.graph3Weighted,
        "lut" -> Seq("0,1", "1,2", "2,3")))
    assert(jRuns == 0, "joining the aggregate variable must fall back")
  }

  test("monotonicity guard: sign-known scaling verifies, a variable factor does not") {
    val scale = "w(X,mmin<D>) <- X=0, D=0. " +
      "w(Y,mmin<D>) <- w(X,D1), arc(X,Y,C), D=D1*2+C."
    val (_, sRuns) = run("auto", dbW, scale, "w(A,B)",
      Map("arc" -> Fixtures.graph3Weighted))
    assert(sRuns >= 1, "D1*2+C is verifiably monotone; auto must engage")
    val varFactor = "w(X,mmin<D>) <- X=0, D=0. " +
      "w(Y,mmin<D>) <- w(X,D1), arc(X,Y,C), D=D1*C."
    val (_, vRuns) = run("auto", dbW, varFactor, "w(A,B)",
      Map("arc" -> Fixtures.graph3Weighted))
    assert(vRuns == 0,
      "a variable factor's runtime sign is unknown; auto must fall back")
  }

  test("long-chain sssp: many iterations, many compactions, exact answer") {
    // 40-node path graph: ~40 iterations of 1-row deltas; fragment
    // accounting (fragRows vs compactBase) must stay exact through
    // repeated compactions or the answer drifts
    val n = 40
    val chain = (0 until n).map(i => s"$i,${i + 1},1")
    val program = "mminpath(X,mmin<D>) <- X=0, D=0. " +
      "mminpath(Z,mmin<D>) <- mminpath(X,D1), arc(X,Z,D2), D=D1+D2. " +
      "sssp(X,min<D>) <- mminpath(X,D)."
    val expected = (0 to n).map(i => s"[$i,$i]").toSet
    val (frag, runs) = run("true", dbW, program, "sssp(A,B)",
      Map("arc" -> chain))
    assert(runs >= 1)
    assert(frag == expected)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond the reference's Datalog programs
  * (its Experiments.scala benchmarks TC/SG/APSP/SSSP/CC/Reach/PYMK;
  * PageRank is the canonical next workload of the recursive-analytics
  * literature). All arithmetic is EXACT INTEGER (rank scaled ×10^6,
  * floor division) so results are independent of partitioning and
  * addition order — the DuckDB oracle hash-matches bit-for-bit, which a
  * float PageRank cannot guarantee.
  *
  * Scale shape per iteration: one join edge⋈rank on the source key, one
  * aggregation shuffle on the destination key, one left join back to
  * the node set — the same plan GraphX/Pregel executes, expressed
  * relationally so Catalyst/AQE handle partitioning, and
  * `localCheckpoint` truncates the growing lineage each round (driver
  * stays O(1) plan size). */
object GraphQueries extends QueryPack {

  private val Iters = 5

  /** Cluster-path switch shared by the graph fixpoints: claim hash
    * layouts / keep AQE instead of broadcast-pinning node-sized state
    * (which is only correct while the state fits the 8 GB broadcast
    * cliff — true on local[N] test scales, false at 100 TB). */
  private[queries] def copartConf(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.graph.copartition").exists(_.toBoolean)

  /** Session clone hosting a local-path fixpoint's planning conf: the
    * caller's runtime conf is copied over (static/immutable keys are
    * skipped), then AQE is pinned off for the loop only. Mutating the
    * caller's session instead would silently strip AQE from any query
    * running concurrently on it, and two overlapping fixpoints could
    * restore each other's stale previous value. */
  private def localLoopSession(s: SparkSession): SparkSession = {
    val c = s.newSession()
    s.conf.getAll.foreach { case (k, v) =>
      try c.conf.set(k, v) catch { case scala.util.control.NonFatal(_) => () }
    }
    c.conf.set("spark.sql.adaptive.enabled", "false")
    // constraint propagation re-infers the same not-null facts over the
    // loop's checkpointed state every round — pure optimizer wall on
    // already-materialized inputs (r20 interleaved warm A/B at sf0.1:
    // graph_pagerank_conv 3.63→3.37s, graph_lpa_conv 4.86→4.51s)
    c.conf.set("spark.sql.constraintPropagation.enabled", "false")
    c
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s, dir) =>
      PackResources.checkpoint(s, dir, "graph_pagerank") {
        val arc = DatalogQueries.arcDF(s, dir).select(col("x"), col("y"))
        val nodes = graft.Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("x"))
        val outdeg = arc.groupBy("x").agg(count(lit(1)).as("d"))
        // edges pre-joined with their source's out-degree once and
        // materialized: the iterations rescan an in-memory edge list
        // instead of re-reading parquet (tracked for release)
        val edges = PackResources.checkpoint(s, dir, "graph_pagerank_edges")(
          arc.join(outdeg, "x").select(col("x"), col("y"), col("d")))
        // a FIXED 5-round unrolled lazy plan (each round feeds the next
        // exactly once, so nothing recomputes), materialized once by the
        // tracked memo checkpoint; an open-ended variant would truncate
        // lineage per round like the Datalog fixpoints do
        var pr = nodes.select(col("x"), lit(1000000L).as("p"))
        for (_ <- 1 to Iters) {
          val sums = pr.join(edges, "x")
            .select(col("y").as("x"), expr("p div d").as("c"))
            .groupBy("x").agg(sum("c").as("s"))
          pr = nodes.join(sums, Seq("x"), "left")
            .select(col("x"),
              expr("150000 + (850000 * coalesce(s, 0)) div 1000000").as("p"))
        }
        pr
      }),

    // Open-ended PageRank: iterate until the EXACT integer fixed point
    // (the ×10^6 floor arithmetic quantizes updates, and the edge DAG
    // has no cycles, so ranks stop changing after ~depth rounds — no
    // float epsilon needed, and the DuckDB oracle can find the same
    // round). Engineered to ONE Spark job and one shuffle per round:
    //   - the state checkpoint CLAIMS hash(x) partitioning (validated),
    //     so the rank⋈edges join and the rank⋈sums merge re-use the
    //     state's layout — the only exchange is the destination-keyed
    //     contribution aggregation;
    //   - the old rank rides along through the round (`po`), so
    //     convergence is a boolean column counted BY THE CHECKPOINT
    //     MATERIALIZATION itself (accumulator) — no probe join, no
    //     second job;
    //   - each round localCheckpoints the new state (lineage stays
    //     O(1), the Datalog fixpoints' hygiene) and releases the
    //     superseded round's blocks.
    "graph_pagerank_conv" -> ((s, dir) =>
      PackResources.checkpoint(s, dir, "graph_pagerank_conv") {
        val arc = DatalogQueries.arcDF(s, dir).select(col("x"), col("y"))
        val nodes = graft.Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("x"))
        val outdeg = arc.groupBy("x").agg(count(lit(1)).as("d"))
        val edges = PackResources.checkpoint(s, dir, "graph_pagerank_edges")(
          arc.join(outdeg, "x").select(col("x"), col("y"), col("d")))
        GraphQueries.pagerankConverged(s, nodes, edges)
      }),

    // k-core decomposition (k=3) by iterative peeling — the OTHER
    // canonical graph fixpoint shape: monotone DELETION instead of
    // monotone accumulation (TC) or value improvement (SSSP/PageRank).
    // Output is the onion shell per node: the round it was peeled
    // (0 = survives in the 3-core). Per round: one degree aggregation
    // over the surviving symmetrized edge set, a node-state merge whose
    // newly-peeled flag is counted by the checkpoint materialization
    // itself (no probe job), and two semi-joins restricting the edge
    // state to survivors. Node and edge state both localCheckpoint per
    // round with superseded blocks released — the Datalog fixpoints'
    // lineage hygiene. Local path broadcast-pins the node-sized sides
    // with AQE off (plan shape known, rounds are job-latency-bound);
    // spark.graft.graph.copartition keeps AQE + shuffle joins for
    // cluster-sized state.
    "graph_kcore" -> ((s, dir) =>
      PackResources.checkpoint(s, dir, "graph_kcore") {
        val arc = DatalogQueries.arcDF(s, dir).select(col("x"), col("y"))
        val nodes = graft.Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("x"))
        GraphQueries.kcoreShells(s, nodes, arc, 3)
      }),

    // Synchronous label propagation (community detection): labels seed
    // as node ids; each round every node adopts the most frequent label
    // among its neighbors (ties → smallest label), all nodes updating
    // from the SAME previous round — fully deterministic, so the fixed
    // 4-round unroll hash-matches the oracle. Per-round plan: one
    // neighbor-keyed join + (node, label) count + per-node argmax via
    // max(struct(count, -label)) — a partial-aggregated shuffle (map
    // side collapses each node's candidate labels before the exchange),
    // never a window over the full count set. Isolated nodes keep their
    // label through the left join. ~3 label-sized shuffles per round at
    // any scale; the edge list materializes once and is rescanned.
    "graph_lpa" -> ((s, dir) =>
      PackResources.checkpoint(s, dir, "graph_lpa") {
        val arc = DatalogQueries.arcDF(s, dir).select(col("x"), col("y"))
        val und = PackResources.checkpoint(s, dir, "graph_lpa_edges")(
          arc.union(arc.select(col("y").as("x"), col("x").as("y"))).distinct())
        val nodes = graft.Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("x"))
        var lab = nodes.select(col("x"), col("x").as("lbl"))
        for (_ <- 1 to 4) {
          val cnt = und
            .join(lab.select(col("x").as("y"), col("lbl")), "y")
            .groupBy("x", "lbl").agg(count(lit(1)).as("c"))
          val best = cnt.groupBy("x")
            .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("b"))
            .select(col("x"), (-col("b.nl")).as("blbl"))
          lab = lab.join(best, Seq("x"), "left")
            .select(col("x"), coalesce(col("blbl"), col("lbl")).as("lbl"))
        }
        lab
      }),

    // Label propagation to the FIXED POINT: same per-round plan as
    // graph_lpa, iterated until no node changes label — the change
    // count rides the round checkpoint's materialization (flagged
    // accumulator, no probe job; the pagerankConverged pattern), each
    // superseded round's blocks released eagerly. The DuckDB oracle
    // replays the identical update rule in a recursive CTE and picks
    // the first self-equal round, so a divergence in round count or in
    // any label hash-mismatches.
    "graph_lpa_conv" -> ((s, dir) =>
      PackResources.checkpoint(s, dir, "graph_lpa_conv") {
        val arc = DatalogQueries.arcDF(s, dir).select(col("x"), col("y"))
        val und = PackResources.checkpoint(s, dir, "graph_lpa_edges")(
          arc.union(arc.select(col("y").as("x"), col("x").as("y"))).distinct())
        val nodes = graft.Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("x"))
        GraphQueries.lpaConverged(s, nodes, und)
      }),

    // Link prediction via the resource-allocation index (the
    // no-logarithm cousin of Adamic–Adar, chosen because 10^6 div deg
    // is EXACT integer — the oracle hash-matches bit-for-bit where a
    // float 1/log(deg) could not): for every non-adjacent pair (a,b)
    // sharing ≥1 neighbor, score = Σ_{z∈N(a)∩N(b)} 10^6 div deg(z).
    // Plan shape is the PYMK/triangle one: the pair space is generated
    // ONLY through the shared-neighbor join n(z,a) ⋈ n(z,b) — never
    // all-pairs — so candidate count is Σ_z deg(z)², bounded by the
    // max-degree cap of the block-local graph (deg ≤ 4 here; at 100 TB
    // a hub cap / top-degree exclusion bounds the same product). The
    // existing-edge exclusion is a left_anti on the same und edge list
    // (shared memoized artifact with the LPA gates), and deg(z) rides
    // the exploded neighbor rows — one broadcast-sized join, one
    // (a,b)-keyed aggregation shuffle.
    "graph_ra_linkpred" -> ((s, dir) => {
      val arc = DatalogQueries.arcDF(s, dir).select(col("x"), col("y"))
      val und = PackResources.checkpoint(s, dir, "graph_lpa_edges")(
        arc.union(arc.select(col("y").as("x"), col("x").as("y"))).distinct())
      val deg = und.groupBy(col("x").as("z")).agg(count(lit(1)).as("d"))
      val nb = und.select(col("x").as("z"), col("y").as("n")).join(deg, "z")
      val cand = nb.select(col("z"), col("n").as("a"), col("d"))
        .join(nb.select(col("z"), col("n").as("b")), "z")
        .filter(col("a") < col("b"))
      cand
        .join(und.select(col("x").as("a"), col("y").as("b")),
          Seq("a", "b"), "left_anti")
        .groupBy("a", "b")
        .agg(sum(expr("1000000 div d")).as("ra_score"),
          count(lit(1)).as("n_common"))
    }))

  /** Open-ended integer PageRank to the exact fixed point over
    * `nodes(x)` and out-degree-annotated `edges(x, y, d)`. On local[N]
    * the broadcast-everything rounds win (shuffles are memory copies;
    * the same measured tradeoff as spark.datalog.recursion.copartition)
    * — on a real cluster the claimed hash(x) layout saves a full-state
    * exchange per round: `spark.graft.graph.copartition`, default off.
    * Local path also pins AQE off — its per-stage materialization jobs
    * are ~all of the per-round cost on a small state (each round =
    * 1 shuffle + 2 broadcast stages + final, ≥5 scheduled jobs); with
    * the plan shape known and both build sides hinted, static planning
    * runs a round in 2-3 jobs. The copart (cluster) path keeps AQE on:
    * there the state is too big to broadcast and AQE's runtime sizing +
    * skew handling earn their stage jobs. */
  private[queries] def pagerankConverged(
      s: SparkSession, nodes0: DataFrame, edges0: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val copart = copartConf(s)
    val maxRounds = 64
    // local path: the rounds run on a CLONED session with AQE pinned
    // off (plan shape known, both build sides hinted — static planning
    // runs a round in 2-3 jobs), so the knob never mutates the caller's
    // session: a query running concurrently on the same SparkSession
    // would silently lose AQE, and an overlapping second fixpoint could
    // restore the wrong previous value. Same isolation drainAppend
    // gives its streaming knobs. The copart (cluster) path needs no
    // conf change and stays on the caller's session.
    val loop = if (copart) s else localLoopSession(s)
    val nodes = if (copart) nodes0 else GraftColumnBridge.onSession(loop, nodes0)
    val edges = if (copart) edges0 else GraftColumnBridge.onSession(loop, edges0)
    // every loop checkpoint registers for releaseAll AT CREATION, so a
    // non-convergence failure cannot strand blocks past release()
    // (superseded rounds are additionally unpersisted eagerly below —
    // double unpersist at release is a no-op)
    def ck(df: DataFrame, flag: String): (DataFrame, Long) = {
      val (out, _, _, flagged) = GraftColumnBridge
        .checkpointWithPartitioningFlagged(df, Seq("x"), parts, flag)
      GraftColumnBridge.checkpointedRDD(out).foreach(PackResources.trackRDD)
      (out, flagged)
    }
    // cluster path: the edge state must share the state's hash(x) claim
    // or every round re-exchanges the full (largest) side — claim it
    // ONCE here; the comment "the only per-round exchange is the
    // destination-keyed aggregation" holds only with this in place
    val ed =
      if (copart)
        ck(edges.repartition(parts, col("x")), null)._1
      else edges
    val seedPlan = nodes.select(col("x"), lit(1000000L).as("p"))
    var pr = ck(
      if (copart) seedPlan.repartition(parts, col("x")) else seedPlan, null)._1
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val sums = pr
        .join(if (copart) ed else broadcast(ed), "x")
        .select(col("y").as("x"), expr("p div d").as("c"))
        .groupBy("x").agg(sum("c").as("s"))
      val nextPlan = pr.select(col("x"), col("p").as("po"))
        .join(if (copart) sums else broadcast(sums), Seq("x"), "left")
        .select(col("x"),
          expr("150000 + (850000 * coalesce(s, 0)) div 1000000").as("p"),
          col("po"))
        .withColumn("chg", col("p") =!= col("po"))
      val (next, changed) = ck(nextPlan, "chg")
      converged = changed == 0L
      // the superseded round's blocks are dead once `next` is
      // materialized and compared
      GraftColumnBridge.checkpointedRDD(pr)
        .foreach(_.unpersist(blocking = false))
      pr = next
    }
    require(converged, s"PageRank did not reach its integer fixed " +
      s"point within $maxRounds rounds")
    // the result re-roots onto the caller's session (the clone only
    // hosted the loop's planning conf; the data is a materialized RDD)
    GraftColumnBridge.onSession(s, pr.select("x", "p"))
  }

  /** Synchronous label propagation iterated to the fixed point over
    * `nodes(x)` and symmetrized `und(x, y)` — the SELF-VOTE variant:
    * each round every node adopts the most frequent label among its
    * neighbors AND itself (ties → smallest), all nodes reading the
    * SAME previous round; stops when a round changes no label. The
    * self-vote is what makes a synchronous fixed point exist: plain
    * neighbor-only LPA 2-cycles on symmetric structures (two adjacent
    * nodes swap labels forever — observed on this dataset, the
    * gate-breaking case), while the self-vote breaks the swap (each
    * node then sees a tie and both take the smaller label). The change
    * count rides the round checkpoint's materialization (flagged
    * accumulator — no probe job), superseded rounds unpersist eagerly,
    * and the local/cluster path split is `pagerankConverged`'s: local
    * rounds broadcast the static edge set and the node-sized argmax on
    * an AQE-off session clone; the copart path claims hash layouts
    * instead (edges on the neighbor key, so the label join is
    * exchange-free against the hash(x) state). */
  private[queries] def lpaConverged(
      s: SparkSession, nodes0: DataFrame, und0: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val copart = copartConf(s)
    val maxRounds = 64
    val loop = if (copart) s else localLoopSession(s)
    val nodes = if (copart) nodes0 else GraftColumnBridge.onSession(loop, nodes0)
    val und = if (copart) und0 else GraftColumnBridge.onSession(loop, und0)
    def ck(df: DataFrame, keys: Seq[String], flag: String): (DataFrame, Long) = {
      val (out, _, _, flagged) = GraftColumnBridge
        .checkpointWithPartitioningFlagged(df, keys, parts, flag)
      GraftColumnBridge.checkpointedRDD(out).foreach(PackResources.trackRDD)
      (out, flagged)
    }
    val ed =
      if (copart) ck(und.repartition(parts, col("y")), Seq("y"), null)._1
      else und
    var lab = ck({
      val seed = nodes.select(col("x"), col("x").as("lbl"))
      if (copart) seed.repartition(parts, col("x")) else seed
    }, Seq("x"), null)._1
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val nbr = lab.select(col("x").as("y"), col("lbl"))
      // candidate votes = every neighbor's label + the node's own (the
      // self-vote); own label always present, so no fallback join
      val votes = (if (copart) ed else broadcast(ed)).join(nbr, "y")
        .select(col("x"), col("lbl"))
        .union(lab.select(col("x"), col("lbl")))
      val cnt = votes.groupBy("x", "lbl").agg(count(lit(1)).as("c"))
      val best = cnt.groupBy("x")
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("b"))
        .select(col("x"), (-col("b.nl")).as("blbl"))
      val nextPlan = lab.select(col("x"), col("lbl").as("lo"))
        .join(if (copart) best else broadcast(best), Seq("x"))
        .select(col("x"), col("blbl").as("lbl"),
          (col("blbl") =!= col("lo")).as("chg"))
      val (next, changed) = ck(nextPlan, Seq("x"), "chg")
      converged = changed == 0L
      GraftColumnBridge.checkpointedRDD(lab)
        .foreach(_.unpersist(blocking = false))
      lab = next
    }
    require(converged,
      s"label propagation did not reach a fixed point within $maxRounds rounds")
    GraftColumnBridge.onSession(s, lab.select("x", "lbl"))
  }

  /** Onion shells of k-core peeling over `nodes(x)` and directed
    * `arc(x, y)` (symmetrized internally): shell = the round a node was
    * peeled, 0 = survives the k-core. Same local/cluster path split as
    * `pagerankConverged`. */
  private[queries] def kcoreShells(
      s: SparkSession, nodes0: DataFrame, arc0: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val copart = copartConf(s)
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val maxRounds = 64
    // local path runs on a cloned session with AQE pinned off (see
    // pagerankConverged) — never on the caller's mutable conf
    val loop = if (copart) s else localLoopSession(s)
    // checkpoints register for releaseAll at creation (failure-path
    // safe; double unpersist of superseded rounds is a no-op)
    def ck(df: DataFrame, flag: String): (DataFrame, Long) = {
      val (out, _, _, flagged) = GraftColumnBridge
        .checkpointWithPartitioningFlagged(df, Seq("x"), parts, flag)
      GraftColumnBridge.checkpointedRDD(out).foreach(PackResources.trackRDD)
      (out, flagged)
    }
    // the SETUP checkpoints run on the caller's session — with AQE on,
    // the symmetrize+distinct coalesces the edge state to few
    // partitions, and all ~O(rounds) peeling stages against it stay
    // cheap. Re-rooting the inputs onto the AQE-off loop clone BEFORE
    // setup pinned this checkpoint at `parts` static partitions and
    // cost ~2x on the whole query; only the materialized checkpoints
    // move to the clone (the LogicalRDD survives onSession unchanged,
    // so the in-loop unpersist hooks still find the RDDs)
    var st = ck({
      val seed = nodes0.select(col("x"), lit(null).cast("long").as("shell"))
      if (copart) seed.repartition(parts, col("x")) else seed
    }, null)._1
    var ae = ck({
      val sym = arc0.union(arc0.select(col("y").as("x"), col("x").as("y"))).distinct()
      // cluster path: the edge state carries the hash(x) claim so the
      // per-round degree aggregation and the x-side semi-join reuse its
      // layout instead of re-exchanging the (largest) state every round
      if (copart) sym.repartition(parts, col("x")) else sym
    }, null)._1
    if (!copart) {
      st = GraftColumnBridge.onSession(loop, st)
      ae = GraftColumnBridge.onSession(loop, ae)
    }
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      val deg = ae.groupBy("x").agg(count(lit(1)).as("d"))
      val nstPlan = st
        .join(if (copart) deg else broadcast(deg), Seq("x"), "left")
        .select(col("x"),
          when(col("shell").isNotNull, col("shell"))
            .when(coalesce(col("d"), lit(0L)) < k, lit(round.toLong))
            .as("shell"),
          col("shell").as("so"))
        .withColumn("chg", col("shell").isNotNull && col("so").isNull)
      val (nst, peeled) = ck(nstPlan, "chg")
      converged = peeled == 0L
      if (!converged) {
        val alive = nst.filter(col("shell").isNull).select("x")
        val aliveJ = if (copart) alive else broadcast(alive)
        // the edge state is SYMMETRIC (both directions present), so
        // restricting the x endpoint, flipping, and restricting the
        // x endpoint again restricts both ends — and both semi-joins
        // share ONE broadcast subtree (exchange reuse) instead of
        // broadcasting a renamed copy of `alive` separately
        val naePlan = ae
          .join(aliveJ, Seq("x"), "left_semi")
          .select(col("y").as("x"), col("x").as("y"))
          .join(aliveJ, Seq("x"), "left_semi")
        val nae = ck(
          if (copart) naePlan.repartition(parts, col("x")) else naePlan,
          null)._1
        GraftColumnBridge.checkpointedRDD(ae)
          .foreach(_.unpersist(blocking = false))
        ae = nae
      }
      GraftColumnBridge.checkpointedRDD(st)
        .foreach(_.unpersist(blocking = false))
      st = nst
    }
    require(converged,
      s"k-core peeling did not stabilize within $maxRounds rounds")
    // re-root onto the caller's session (the clone only hosted the
    // loop's planning conf; the data is a materialized RDD)
    GraftColumnBridge.onSession(s,
      st.select(col("x"), coalesce(col("shell"), lit(0L)).as("shell")))
  }

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> {
      val step = (i: Int) =>
        s"""pr$i AS (SELECT n.v,
              150000 + (850000 * COALESCE(s.s, 0)) // 1000000 AS p
            FROM nodes n LEFT JOIN (
              SELECT arc.dst AS v, SUM(pr${i - 1}.p // outd.d) AS s
              FROM pr${i - 1}
              JOIN outd ON pr${i - 1}.v = outd.src
              JOIN arc ON arc.src = pr${i - 1}.v
              GROUP BY arc.dst) s ON n.v = s.v)"""
      s"""WITH ${DatalogQueries.arcSql},
          outd AS (SELECT src, count(*) AS d FROM arc GROUP BY src),
          nodes AS (SELECT c_custkey AS v FROM customer),
          pr0 AS (SELECT v, CAST(1000000 AS BIGINT) AS p FROM nodes),
          ${(1 to Iters).map(step).mkString(",\n")}
          SELECT CAST(v AS BIGINT) AS x, CAST(p AS BIGINT) AS p FROM pr$Iters"""
    },
    // Iterate-to-convergence oracle: the recursive CTE carries (it, v, p)
    // full states (aug adds a zero-contribution self-loop per node so
    // every node survives each round through the single recursive
    // reference); the outer query picks the FIRST round whose state
    // equals the previous one — the same exact integer fixed point the
    // Spark loop stops at.
    "graph_pagerank_conv" ->
      s"""WITH RECURSIVE ${DatalogQueries.arcSql},
          outd AS (SELECT src, count(*) AS d FROM arc GROUP BY src),
          nodes AS (SELECT c_custkey AS v FROM customer),
          aug AS (
            SELECT arc.src, arc.dst, outd.d, TRUE AS re
            FROM arc JOIN outd ON outd.src = arc.src
            UNION ALL
            SELECT v, v, 1, FALSE FROM nodes),
          pr(it, v, p) AS (
            SELECT 0, v, CAST(1000000 AS BIGINT) FROM nodes
            UNION ALL
            SELECT pr.it + 1, aug.dst,
              CAST(150000 + (850000 * SUM(CASE WHEN aug.re
                THEN pr.p // aug.d ELSE 0 END)) // 1000000 AS BIGINT)
            FROM pr JOIN aug ON aug.src = pr.v
            WHERE pr.it < 64
            GROUP BY pr.it, aug.dst),
          diffs AS (
            SELECT a.it, max(abs(a.p - b.p)) AS md
            FROM pr a JOIN pr b ON b.v = a.v AND b.it = a.it - 1
            GROUP BY a.it),
          conv AS (SELECT min(it) AS k FROM diffs WHERE md = 0)
          SELECT CAST(pr.v AS BIGINT) AS x, CAST(pr.p AS BIGINT) AS p
          FROM pr, conv WHERE pr.it = conv.k""",
    // Peeling unrolled to 16 chained rounds: the arc graph is made of
    // fixed 16-key blocks at every SF, so the peel depth is a property
    // of the block shape (7 rounds at k=3), never of the scale factor —
    // by round 16 the state is provably stable (peeling an empty
    // removal set is a fixed point). The Spark loop iterates to the
    // SAME fixed point dynamically; a hypothetical deeper peel would
    // hash-mismatch and fail the gate.
    "graph_kcore" -> {
      val n = 16
      // MATERIALIZED stops DuckDB inlining each round's CTE into every
      // consumer (3 references/round × 16 rounds would re-open the
      // parquet scans hundreds of times — "Too many open files")
      val steps = (1 to n).map { i =>
        s"""d$i AS MATERIALIZED (SELECT e.s AS v, count(*) AS c FROM e
              JOIN a${i - 1} n1 ON e.s = n1.v JOIN a${i - 1} n2 ON e.t = n2.v
              GROUP BY e.s),
            rm$i AS MATERIALIZED (SELECT a.v FROM a${i - 1} a LEFT JOIN d$i d ON d.v = a.v
              WHERE COALESCE(d.c, 0) < 3),
            a$i AS MATERIALIZED (SELECT v FROM a${i - 1} WHERE v NOT IN (SELECT v FROM rm$i))"""
      }.mkString(",\n")
      val shells = (1 to n).map(i => s"SELECT v, $i AS shell FROM rm$i")
        .mkString("\nUNION ALL ")
      s"""WITH ${DatalogQueries.arcSql},
          nodes AS (SELECT c_custkey AS v FROM customer),
          e AS MATERIALIZED (SELECT src AS s, dst AS t FROM arc UNION SELECT dst, src FROM arc),
          a0 AS (SELECT v FROM nodes),
          $steps
          SELECT CAST(v AS BIGINT) AS x, CAST(shell AS BIGINT) AS shell FROM (
            $shells
            UNION ALL SELECT v, 0 AS shell FROM a$n) t"""
    },
    "graph_lpa" -> {
      val rounds = (1 to 4).map { i =>
        s"""c$i AS MATERIALIZED (SELECT e.s AS x, l.lbl, count(*) AS c
              FROM e JOIN l${i - 1} l ON l.x = e.t GROUP BY e.s, l.lbl),
            b$i AS MATERIALIZED (SELECT x, lbl FROM (
              SELECT x, lbl, ROW_NUMBER() OVER (PARTITION BY x
                ORDER BY c DESC, lbl ASC) AS rk FROM c$i) WHERE rk = 1),
            l$i AS MATERIALIZED (SELECT p.x, COALESCE(b.lbl, p.lbl) AS lbl
              FROM l${i - 1} p LEFT JOIN b$i b ON b.x = p.x)"""
      }.mkString(",\n")
      s"""WITH ${DatalogQueries.arcSql},
          e AS MATERIALIZED (SELECT src AS s, dst AS t FROM arc
                             UNION SELECT dst, src FROM arc),
          l0 AS (SELECT c_custkey AS x, c_custkey AS lbl FROM customer),
          $rounds
          SELECT CAST(x AS BIGINT) AS x, CAST(lbl AS BIGINT) AS lbl FROM l4"""
    },
    // Iterate-to-convergence oracle, the graph_pagerank_conv pattern:
    // the recursive CTE carries (it, x, lbl) full states through the
    // single recursive reference — `aug` adds a self-loop per node, so
    // every node survives each round AND casts the self-vote (one
    // count for its own current label, merged into that label's
    // neighbor count). The per-node argmax (count DESC, label ASC) is
    // arg_max over the injective encoding c·2^40 − lbl. The outer
    // query picks the FIRST round whose state equals the previous one.
    "graph_lpa_conv" ->
      s"""WITH RECURSIVE ${DatalogQueries.arcSql},
          e AS (SELECT src AS s, dst AS t FROM arc
                UNION SELECT dst, src FROM arc),
          nodes AS (SELECT c_custkey AS v FROM customer),
          aug AS (SELECT s, t FROM e
                  UNION ALL SELECT v, v FROM nodes),
          lp(it, x, lbl) AS (
            SELECT 0, v, CAST(v AS BIGINT) FROM nodes
            UNION ALL
            SELECT z.it + 1, z.x,
              arg_max(z.lbl, z.c * 1099511627776 - z.lbl)
            FROM (
              SELECT lp.it, aug.s AS x, lp.lbl, count(*) AS c
              FROM lp JOIN aug ON aug.t = lp.x
              WHERE lp.it < 64
              GROUP BY lp.it, aug.s, lp.lbl) z
            GROUP BY z.it, z.x),
          diffs AS (
            SELECT a.it, max(CASE WHEN a.lbl != b.lbl THEN 1 ELSE 0 END) AS md
            FROM lp a JOIN lp b ON b.x = a.x AND b.it = a.it - 1
            GROUP BY a.it),
          conv AS (SELECT min(it) AS k FROM diffs WHERE md = 0)
          SELECT CAST(lp.x AS BIGINT) AS x, CAST(lp.lbl AS BIGINT) AS lbl
          FROM lp, conv WHERE lp.it = conv.k""",
    "graph_ra_linkpred" ->
      s"""WITH ${DatalogQueries.arcSql},
          e AS (SELECT src AS x, dst AS y FROM arc
                UNION SELECT dst, src FROM arc),
          deg AS (SELECT x AS z, count(*) AS d FROM e GROUP BY x),
          nb AS (SELECT e.x AS z, e.y AS n, deg.d
                 FROM e JOIN deg ON deg.z = e.x),
          cand AS (SELECT n1.z, n1.n AS a, n2.n AS b, n1.d
                   FROM nb n1 JOIN nb n2 ON n1.z = n2.z
                   WHERE n1.n < n2.n)
          SELECT CAST(c.a AS BIGINT) AS a, CAST(c.b AS BIGINT) AS b,
                 CAST(sum(1000000 // c.d) AS BIGINT) AS ra_score,
                 CAST(count(*) AS BIGINT) AS n_common
          FROM cand c
          WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.x = c.a AND e.y = c.b)
          GROUP BY c.a, c.b"""
  )
}

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
        import org.apache.spark.sql.GraftColumnBridge
        val arc = DatalogQueries.arcDF(s, dir).select(col("x"), col("y"))
        val nodes = graft.Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("x"))
        val outdeg = arc.groupBy("x").agg(count(lit(1)).as("d"))
        val edges = PackResources.checkpoint(s, dir, "graph_pagerank_edges")(
          arc.join(outdeg, "x").select(col("x"), col("y"), col("d")))
        val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
        // On local[N] the broadcast-everything rounds win (shuffles are
        // memory copies; the same measured tradeoff as
        // spark.datalog.recursion.copartition) — on a real cluster the
        // claimed hash(x) layout saves a full-state exchange per round:
        // conf-gated, default off, like the fixpoint copart path.
        val copart =
          s.conf.getOption("spark.graft.pagerank.copartition").exists(_.toBoolean)
        val maxRounds = 64
        val seedPlan = nodes.select(col("x"), lit(1000000L).as("p"))
        var pr = GraftColumnBridge.checkpointWithPartitioning(
          if (copart) seedPlan.repartition(parts, col("x")) else seedPlan,
          Seq("x"), parts)._1
        var rounds = 0
        var converged = false
        // Local path: AQE's per-stage materialization jobs are ~all of
        // the per-round cost on a small state (each round = 1 shuffle +
        // 2 broadcast stages + final, ≥5 scheduled jobs); with the plan
        // shape known and both build sides hinted, static planning runs
        // a round in 2-3 jobs. The copart (cluster) path keeps AQE on:
        // there the state is too big to broadcast and AQE's runtime
        // sizing + skew handling earn their stage jobs.
        val aqeKey = "spark.sql.adaptive.enabled"
        val prevAqe = s.conf.get(aqeKey, "true")
        if (!copart) s.conf.set(aqeKey, "false")
        try {
          while (!converged && rounds < maxRounds) {
            rounds += 1
            val sums = pr
              .join(if (copart) edges else broadcast(edges), "x")
              .select(col("y").as("x"), expr("p div d").as("c"))
              .groupBy("x").agg(sum("c").as("s"))
            val nextPlan = pr.select(col("x"), col("p").as("po"))
              .join(if (copart) sums else broadcast(sums), Seq("x"), "left")
              .select(col("x"),
                expr("150000 + (850000 * coalesce(s, 0)) div 1000000").as("p"),
                col("po"))
              .withColumn("chg", col("p") =!= col("po"))
            val (next, _, _, changed) =
              GraftColumnBridge.checkpointWithPartitioningFlagged(
                nextPlan, Seq("x"), parts, "chg")
            converged = changed == 0L
            // the superseded round's blocks are dead once `next` is
            // materialized and compared
            GraftColumnBridge.checkpointedRDD(pr)
              .foreach(_.unpersist(blocking = false))
            pr = next
          }
        } finally if (!copart) s.conf.set(aqeKey, prevAqe)
        require(converged, s"PageRank did not reach its integer fixed " +
          s"point within $maxRounds rounds")
        pr.select("x", "p")
      }))

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
          FROM pr, conv WHERE pr.it = conv.k"""
  )
}

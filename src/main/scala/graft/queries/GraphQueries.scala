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
    })
}

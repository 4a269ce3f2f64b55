package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline operators) to a DataFrame program over the
  * synthetic parquet tables; `oracleSql` carries the DuckDB-equivalent
  * SQL for the hash-compare correctness gate.
  */
object SparkEntry {

  private val packs: Seq[graft.queries.QueryPack] = Seq(
    graft.queries.RelationalQueries,
    graft.queries.DatalogQueries,
    graft.queries.TextQueries,
    graft.queries.EmbeddingQueries,
    graft.queries.StreamingQueries,
    graft.queries.MultimodalQueries,
    graft.queries.TemporalQueries,
    graft.queries.GraphQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RelationalQueries.defs("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap

  /** Drain every block the packs pinned (memoized checkpoints, fixpoint
    * state) — call when a pack run ends; results must be consumed first. */
  def release(): Unit = graft.queries.PackResources.releaseAll()
}

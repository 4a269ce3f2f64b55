package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries: `defs` builds the DataFrame
  * (given a scale-factor dir of parquet tables), `oracles` holds the
  * DuckDB-equivalent SQL for the keys that are SQL-expressible.
  */
trait QueryPack {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

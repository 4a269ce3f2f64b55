package graft.queries

import org.apache.spark.sql.GraftColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** The prioSharded scaffold behind txt_pack_sequences / txt_mix_budget:
  * shard count configurable via spark.graft.pack.shards, prefix sum
  * two-level (per-partition partials + broadcast offsets), never a
  * single window partition holding a whole shard. The DuckDB gate pins
  * the default shard count; this spec pins the conf path against an
  * in-JVM oracle and the plan shape against the 100 TB scale claim. */
class PackShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** in-JVM packing oracle: (doc_id -> (shard, seq_id, seq_off)) */
  private def packOracle(shards: Int): Map[Long, (Long, Long, Long)] = {
    val docs = graft.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) as n",
        "(doc_id * 1103515245 + 12345) % 1000000 as prio")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    docs.groupBy { case (_, _, prio) => prio % shards }.toSeq.flatMap {
      case (shard, rs) =>
        var cum = 0L
        rs.sortBy { case (id, _, prio) => (prio, id) }.toSeq.map {
          case (id, n, _) =>
            val out = id -> ((shard, shard * 1000000 + cum / 512, cum % 512))
            cum += n
            out
        }
    }.toMap
  }

  test("txt_pack_sequences matches the in-JVM oracle at shards=64 (two-level path)") {
    val s = spark.newSession()
    s.conf.set("spark.graft.pack.shards", "64")
    s.conf.set("spark.graft.pack.twolevel.minrows", "0")
    val rows = graft.queries.TextQueries.defs("txt_pack_sequences")(s, dir).collect()
    val oracle = packOracle(64)
    assert(rows.length == oracle.size)
    // 64 shards actually materialize (sf0.001 has 500 docs, all 64 hit)
    assert(rows.map(_.getAs[Long]("shard")).distinct.length > 16)
    rows.foreach { r =>
      val got = (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_off"))
      assert(oracle(r.getAs[Long]("doc_id")) == got,
        s"doc ${r.getAs[Long]("doc_id")}: $got")
    }
  }

  test("window path (small corpus) computes the identical packing") {
    // default minrows: sf0.001's 500 docs select the window prefix sum
    val s = spark.newSession()
    s.conf.set("spark.graft.pack.shards", "64")
    val df = graft.queries.TextQueries.defs("txt_pack_sequences")(s, dir)
    val plan = GraftColumnBridge.executedPlanString(df)
    assert(plan.contains("Window"), "expected the small-corpus window path")
    val oracle = packOracle(64)
    val rows = df.collect()
    assert(rows.length == oracle.size)
    rows.foreach { r =>
      val got = (r.getAs[Long]("shard"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_off"))
      assert(oracle(r.getAs[Long]("doc_id")) == got,
        s"doc ${r.getAs[Long]("doc_id")}: $got")
    }
  }

  test("txt_mix_budget fill respects the per-shard budget at shards=64") {
    val s = spark.newSession()
    s.conf.set("spark.graft.pack.shards", "64")
    s.conf.set("spark.graft.pack.twolevel.minrows", "0")
    val rows = graft.queries.TextQueries.defs("txt_mix_budget")(s, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val budget = r.getAs[String]("lang") match {
        case "en" => 1600L
        case "fr" | "de" | "es" => 800L
        case _ => 320L
      }
      assert(r.getAs[Long]("cum_before") < budget / 64,
        s"doc ${r.getAs[Long]("doc_id")} admitted past its shard budget")
    }
  }

  test("prefix sum is two-level: no Window node, no single-partition funnel") {
    val s = spark.newSession()
    s.conf.set("spark.graft.pack.twolevel.minrows", "0")
    val df = graft.queries.TextQueries.defs("txt_pack_sequences")(s, dir)
    val plan = GraftColumnBridge.executedPlanString(df)
    assert(!plan.contains("Window"),
      "packing fell back to a window prefix sum (one task per shard at scale)")
    // the placement pass runs at the session's full shuffle parallelism:
    // partitions = spark.sql.shuffle.partitions, not one per shard
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(df.rdd.getNumPartitions == nPart,
      s"placement pass at ${df.rdd.getNumPartitions} partitions, expected $nPart")
  }
}

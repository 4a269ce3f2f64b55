package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Bucketing = the pre-shuffled join layout at 100 TB: both fact tables
  * written bucketed on the join key join WITHOUT any shuffle exchange —
  * the scan's bucket layout satisfies the join's distribution
  * requirement, so a 1000-executor join of two 100 TB tables moves zero
  * bytes of either side over the network. This spec pins that plan
  * shape (and the repeated-aggregation variant) as regression coverage. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** (Re)create the bucketed tables — idempotent so each test stands
    * alone; the in-memory catalog forgets tables between JVMs but their
    * warehouse directories persist, so clear those too or saveAsTable
    * fails with "location already exists". */
  private def ensureTables(): Unit = synchronized {
    if (spark.catalog.tableExists("bkt_orders") &&
      spark.catalog.tableExists("bkt_customer")) return
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("bkt_orders", "bkt_customer").foreach { t =>
      val d = new java.io.File(warehouse, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }
    }
    graft.Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("bkt_orders")
    graft.Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .format("parquet").saveAsTable("bkt_customer")
  }

  test("bucketed fact tables join with zero shuffle exchanges") {
    ensureTables()
    val orders = graft.Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val j = spark.table("bkt_orders")
        .join(spark.table("bkt_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      assert(j.count() == 5)
      // the join itself is exchange-free; the only shuffle in the whole
      // plan is the 5-group aggregation above it
      assert(GraftColumnBridge.countShuffleExchanges(j) <= 1,
        GraftColumnBridge.executedPlanString(j))
      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(GraftColumnBridge.countShuffleExchanges(plain) >= 2,
        "unbucketed baseline should shuffle both join sides")
    }
  }

  test("bucketed ANN index artifacts (assignment + codes) join exchange-free") {
    // the PLANS.md claim behind emb_ivfpq_search's one corpus shuffle:
    // a real index build persists assignment and PQ codes CO-LOCATED
    // (bucketed by vec_id), so the candidate-side join moves zero bytes
    synchronized {
      Seq("bkt_ivf_assign", "bkt_pq_codes").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val warehouse = new java.net.URI(
          spark.conf.get("spark.sql.warehouse.dir")).getPath
        val d = new java.io.File(warehouse, t)
        if (d.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(): Unit
          }
          rm(d)
        }
      }
      graft.queries.EmbeddingQueries.defs("emb_ivf_assign")(spark, dir)
        .write.bucketBy(8, "vec_id").sortBy("vec_id")
        .format("parquet").saveAsTable("bkt_ivf_assign")
      graft.queries.EmbeddingQueries.defs("emb_pq_codes")(spark, dir)
        .write.bucketBy(8, "vec_id").sortBy("vec_id")
        .format("parquet").saveAsTable("bkt_pq_codes")
    }
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val j = spark.table("bkt_ivf_assign")
        .join(spark.table("bkt_pq_codes"), "vec_id")
      assert(j.count() == 500)
      assert(GraftColumnBridge.countShuffleExchanges(j) == 0,
        GraftColumnBridge.executedPlanString(j))
    }
  }

  test("emb_ivfpq_bucketed: gate-written index tables join exchange-free, " +
      "same answers as the memoized path") {
    // the production loop end-to-end: the gate builds the IVF+PQ
    // artifacts, persists them bucketBy(vec_id), and searches the
    // stored form — answers must be identical to emb_ivfpq_search, and
    // the candidate join over the gate's OWN tables must plan with
    // zero shuffle exchanges (storage layout, not luck)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Long]("adc"), r.getAs[Long]("rk"))
    val viaTables = graft.queries.EmbeddingQueries
      .defs("emb_ivfpq_bucketed")(spark, dir).collect().map(key).toSet
    val viaMemo = graft.queries.EmbeddingQueries
      .defs("emb_ivfpq_search")(spark, dir).collect().map(key).toSet
    assert(viaTables == viaMemo && viaTables.size == 25,
      s"bucketed search diverged: ${viaTables.diff(viaMemo).take(3)}")
    // names come from the builder (memo hit — no rebuild), so the spec
    // can't drift from the naming scheme
    val (ta, tc) = graft.queries.EmbeddingQueries.bucketedIndex(spark, dir)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val j = spark.table(ta)
        .join(spark.table(tc), "vec_id")
      assert(j.count() == 500)
      assert(GraftColumnBridge.countShuffleExchanges(j) == 0,
        GraftColumnBridge.executedPlanString(j))
    }
  }

  test("aggregation on the bucket key reuses the layout (no exchange)") {
    ensureTables()
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val agg = spark.table("bkt_orders")
        .groupBy("o_custkey").agg(sum("o_totalprice").as("t"))
      assert(agg.count() > 0)
      assert(GraftColumnBridge.countShuffleExchanges(agg) == 0,
        GraftColumnBridge.executedPlanString(agg))
    }
  }
}

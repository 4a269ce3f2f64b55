package graft.queries

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Pin the LOADED schema of every fixture table (names + Spark types,
  * post Tables.load normalization). The driver regenerates the testdata
  * parquet between rounds and its writer's physical encodings have
  * drifted before (events.ts shipped as TIMESTAMP(NANOS) in r1-r7 and
  * timestamp[us] from r8). A drift that `Tables.load` doesn't absorb
  * should fail HERE, as one obvious test, instead of surfacing as a
  * dozen opaque analysis errors in downstream gates. */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def loaded(name: String): Seq[(String, DataType)] =
    graft.Tables.load(spark, dir, name).schema.map(f => (f.name, f.dataType))

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts is the normalization contract: ALWAYS epoch-nanos BIGINT after
    // load, whatever the parquet footer said.
    "events" -> Seq("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (t <- graft.Tables.names) {
    test(s"$t loads with the pinned schema") {
      assert(loaded(t) == expected(t),
        s"fixture drift: $t loaded ${loaded(t)} — update Tables.load to " +
          "normalize the new encoding (do NOT just repin unless every " +
          "consumer site was audited)")
    }
  }

  test("events.ts epoch-nanos values are in the plausible range") {
    // 2000-01-01 .. 2100-01-01 in epoch nanos — catches a unit slip
    // (micros-as-nanos would land in 1970).
    val mm = graft.Tables.load(spark, dir, "events")
      .selectExpr("min(ts) as lo", "max(ts) as hi").head()
    val lo = mm.getLong(0); val hi = mm.getLong(1)
    assert(lo > 946684800L * 1000000000L, s"ts min $lo below year-2000 nanos")
    assert(hi < 4102444800L * 1000000000L, s"ts max $hi above year-2100 nanos")
  }
}

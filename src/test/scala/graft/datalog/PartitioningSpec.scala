package graft.datalog

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The exchange-free co-partitioned anti-join design (formerly the
  * PartProbe2 probe, now regression coverage):
  *
  *   - a checkpoint whose claimed HashPartitioning survives runtime
  *     validation makes the anti-join against it a shuffled-hash join
  *     with exactly ONE exchange (the probe side's own repartition);
  *   - a claim that does NOT match the physical layout is rejected and
  *     the result degrades to a plain (correct) checkpoint;
  *   - results always equal the `except` ground truth either way.
  */
class PartitioningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def nParts =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  test("validated claim holds and the anti-join plan has exactly one exchange") {
    val keys = Seq("x", "y")
    val a0 = spark.range(100000).selectExpr("id % 1000 as x", "id % 37 as y")
      .repartition(nParts, col("x"), col("y"))
      .dropDuplicates()
    val (a, held, _) = GraftColumnBridge.checkpointWithPartitioning(a0, keys, nParts)
    assert(held, "physically repartitioned input must validate")
    val b = spark.range(5000).selectExpr("id % 2000 as x", "id % 37 as y")
      .repartition(nParts, col("x"), col("y"))
      .dropDuplicates()
    val cond = keys.map(k => b(k) === a(k)).reduce(_ && _)
    val anti = b.join(a.hint("shuffle_hash"), cond, "left_anti")
    val rows = anti.count()
    assert(GraftColumnBridge.countShuffleExchanges(anti) == 1,
      "only b's own repartition may shuffle — a's claim makes its side exchange-free")
    val truth = b.exceptAll(a.select(b.columns.map(col).toIndexedSeq: _*)).count()
    assert(rows == truth)
  }

  test("subset-pivot claim: partitioning on x alone still dedups/anti-joins full rows") {
    // rows equal on (x, y) are equal on x → hash(x) co-locates
    // duplicates; joins accept the subset layout only with the
    // co-partition strictness conf off (the evaluator scopes it the
    // same way during fixpoints)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try subsetPivotCase()
    finally spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
  }

  private def subsetPivotCase(): Unit = {
    val a0 = spark.range(100000).selectExpr("id % 1000 as x", "id % 37 as y")
      .repartition(nParts, col("x"))
      .dropDuplicates()
    val (a, held, _) = GraftColumnBridge.checkpointWithPartitioning(a0, Seq("x"), nParts)
    assert(held)
    val b = spark.range(5000).selectExpr("id % 2000 as x", "id % 37 as y")
      .repartition(nParts, col("x"))
      .dropDuplicates()
    val cond = Seq("x", "y").map(k => b(k) === a(k)).reduce(_ && _)
    val anti = b.join(a.hint("shuffle_hash"), cond, "left_anti")
    val rows = anti.count()
    assert(GraftColumnBridge.countShuffleExchanges(anti) == 1)
    assert(rows ==
      b.exceptAll(a.select(b.columns.map(col).toIndexedSeq: _*)).count())
  }

  test("a claim that does not match the physical layout is rejected") {
    // physically partitioned on (x, y); claiming x alone must NOT hold
    val a0 = spark.range(10000).selectExpr("id % 100 as x", "id % 37 as y")
      .repartition(nParts, col("x"), col("y"))
      .dropDuplicates()
    val (_, held, _) = GraftColumnBridge.checkpointWithPartitioning(a0, Seq("x"), nParts)
    assert(!held, "hash(x,y) layout must not validate a hash(x) claim")
    // and an un-partitioned input must not validate either
    val c0 = spark.range(1000).selectExpr("id as x", "id % 7 as y")
    val (c, heldC, cn) = GraftColumnBridge.checkpointWithPartitioning(c0, Seq("x"), nParts)
    assert(!heldC)
    assert(cn == 1000 && c.count() == 1000)
  }
}

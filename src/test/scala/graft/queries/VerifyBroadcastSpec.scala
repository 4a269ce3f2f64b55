package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Plan shape of the pair-verify join (r15, measured at sf10): the
  * shuffle formulation attaches two ~1.5KB sorted-shingle arrays to
  * every candidate pair and shuffles that stream — at sf10 the
  * txt_ngram_jaccard intermediate exceeded the box's 78GB of disk
  * twice, while the sets frame itself was ~750MB. verifyPairs now
  * broadcasts the sets sides when their MEASURED bytes fit well inside
  * the heap, so candidates stream map-side from their generating join
  * straight through two broadcast-hash joins and the early-exit
  * kernel, and no array-carrying row ever hits a shuffle.
  */
class VerifyBroadcastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(s: org.apache.spark.sql.SparkSession): String =
    TextQueries.defs("txt_ngram_jaccard")(s, dir)
      .queryExecution.executedPlan.toString

  test("auto mode broadcasts small sets: verify is map-side") {
    val s = spark.newSession()
    val p = plan(s)
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast verify joins in:\n$p")
    graft.SparkEntry.release()
  }

  test("broadcastSets=false keeps the shuffle formulation") {
    val s = spark.newSession()
    s.conf.set("spark.graft.verify.broadcastSets", "false")
    // suppress Spark's own size-based broadcast so the assert sees the
    // operator's choice, not AQE's
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p = plan(s)
    assert(!p.contains("BroadcastHashJoin"),
      s"expected shuffle verify joins in:\n$p")
    graft.SparkEntry.release()
  }

  test("both modes produce the identical pair set") {
    val auto = spark.newSession()
    val shuffle = spark.newSession()
    shuffle.conf.set("spark.graft.verify.broadcastSets", "false")
    val a = TextQueries.defs("txt_ngram_jaccard")(auto, dir)
      .collect().map(_.toString).sorted
    val b = TextQueries.defs("txt_ngram_jaccard")(shuffle, dir)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b),
      s"broadcast vs shuffle verify disagree: ${a.length} vs ${b.length} rows")
    graft.SparkEntry.release()
  }
}

package graft.datalog

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("datalog-tests")
    // mirror the reference harness (QuerySuite.scala:36-42)
    .config("spark.sql.shuffle.partitions", "5")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  spark.sparkContext.setLogLevel("ERROR")
}

/** Golden-answer harness replicating the reference's QuerySuite
  * (/root/reference/datalog/src/test/.../QuerySuite.scala:25-108):
  * rows rendered as "[v1,v2,...]" compared order-insensitively in both
  * directions. */
abstract class DatalogSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def runCase(
      program: String,
      query: String,
      data: Map[String, Seq[String]],
      expected: Seq[String]): Unit = {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(program)
    data.foreach { case (name, rows) => ctx.registerData(name, rows) }
    val results = ctx.queryStrings(query)
    val rs = results.toSet
    val es = expected.toSet
    val missing = es -- rs
    val extra = rs -- es
    assert(results.size == expected.size && missing.isEmpty && extra.isEmpty,
      s"\nquery: $query\nmissing: ${missing.mkString(", ")}\nextra: ${extra.mkString(", ")}" +
        s"\n(result count ${results.size}, expected ${expected.size})")
  }

  def runCount(
      program: String,
      query: String,
      data: Map[String, Seq[String]],
      expectedCount: Long): Unit = {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(program)
    data.foreach { case (name, rows) => ctx.registerData(name, rows) }
    assert(ctx.query(query).count() == expectedCount)
  }
}

/** Inline graph fixtures — same edge sets as the reference's
  * TestData.scala:27-131 (they define the query semantics we must match). */
object Fixtures {
  val graph1 = Seq("0,1", "1,2", "2,3", "3,4", "4,5", "0,6", "6,7", "7,8", "8,9", "9,10")
  val graph1Weighted = Seq("0,1,1,", "1,2,1", "2,3,1", "3,4,1", "4,5,1", "0,6,1",
    "6,7,1", "7,8,1", "8,9,1", "9,10,1")
  val graph1b: Seq[String] = graph1 :+ "0,2"
  val graph1bWeighted: Seq[String] = graph1Weighted :+ "0,2,10"
  val graph2 = Seq("1,0", "1,2", "2,3", "3,1", "3,4", "3,5", "5,8", "6,5", "6,7", "6,0")
  val graph3Weighted = Seq("0,1,1", "0,2,1", "1,3,1", "1,4,1", "2,5,1", "2,6,1",
    "3,7,1", "3,8,1", "4,9,1", "4,10,1", "5,11,1", "5,12,1", "6,13,1", "6,14,1")
  val graph4Weighted = Seq("0,1,10", "0,1,9", "0,1,8", "0,1,7", "0,2,1", "2,1,1", "2,1,2")
  val graph5Weighted = Seq("0,1,1", "0,2,1", "1,2,1")
  val graph7 = Seq("0,1", "0,2", "2,1", "1,3", "3,1", "1,0")
  val parentChild = Seq("4,9", "4,8", "6,7", "5,6", "3,5", "3,4", "2,3", "1,2")
  val parentChild2 = Seq("-4,-5", "-3,-4", "-2,-3", "-1,-2", "0,-1", "0,1", "1,2",
    "2,3", "3,4", "4,5")

  val employee = Seq("1, 1, Bob, Jones", "2, 1, Jane, Jones", "3, 2, Sam, Johnson")
  val employeeSalary = Seq("1, 50000.00, 2010-12-01, 2079-01-01",
    "2, 60000.00, 2010-12-01, 2012-12-01")
  val department = Seq("1, Finance", "2, Accounting", "3, Shipping", "4, IT")
  val address = Seq("1, 123 Main Street, Los Angeles, CA, 90202",
    "2, 455 1st ave., New York City, AZ, 10001")

  val prices = Seq("10, alpha, d", "9, beta, d", "8, gamma, d", "7, delta, d",
    "6, epsilon, d", "5, zeta, c", "4, eta, c", "3, theta, c", "2, iota, c",
    "1, kappa, c", "10, alpha, a", "9, beta, a", "8, gamma, a", "7, delta, a",
    "6, epsilon, a", "5, zeta, b", "4, eta, b", "3, theta, b", "2, iota, b",
    "1, kappa, b")

  val student = Seq("1000, Fred, Flintstone, 10", "1001, Barney, Rubble, 12",
    "1004, Wilma, Flintstone, 9", "1005, Bam Bam, Rubble, 1")
  val taken = Seq("1000, 11, A", "1001, 11, B", "1004, 11, A-", "1005, 11, B+",
    "1000, 12, A-", "1001, 12, B+", "1004, 12, A", "1005, 12, B", "1000, 30, B",
    "1001, 30, B", "1004, 30, B", "1005, 30, B", "1004, 31, B+", "1005, 50, B-")
  val course = Seq("Calculus A, 11, 4", "Calculus B, 12, 4", "Calculus C, 13, 4",
    "Calculus D, 14, 4", "English 1, 30, 4", "English 2, 31, 4", "English 3, 50, 4",
    "English 4, 100, 4")
  val enrolled = Seq("1000, 30", "1000, 13", "1001, 30", "1001, 14", "1004, 33",
    "1005, 31")

  val mlmSales = Seq("1,10,5", "1,20,5", "2,10,2", "2,10,5", "1,100,10", "3,9,4",
    "3,10,3", "2,19,8", "4,89,9", "4,5,1", "5,10,4", "5,75,25", "5,32,9", "1,49,20")
  val mlmSchedule = Seq("100,299,0.03", "300,599,0.06", "600,999,0.09",
    "1000,1499,0.12", "1500,2499,0.15", "2500,3999,0.18", "4000,5999,0.21",
    "6000,7499,0.23", "7500,100000000,0.25")
  val mlmSponsors = Seq("1,2", "1,3", "2,4")

  val trianglesGraph1 = Seq("0,1", "2,1", "1,0", "1,2")
  val trianglesGraph2 = Seq("0,1", "1,0", "1,2", "2,1", "2,0", "0,2")
  val trianglesGraph3 = Seq("0,1", "1,0", "1,2", "2,1", "2,0", "0,2", "1,3", "3,1",
    "3,0", "0,3", "3,2", "2,3")
  val trianglesGraph4 = Seq("1,0", "2,0", "1,3", "2,3")
  val trianglesGraph5 = Seq("0,1", "0,2", "2,1", "3,1", "4,1", "4,2", "4,3")
  val pages = Seq("1,1,1,1,1,1,1,1,1", "2,1,1,1,1,1,1,1,2", "3,1,1,1,1,1,1,1,3",
    "4,1,1,1,1,1,1,1,4")
}

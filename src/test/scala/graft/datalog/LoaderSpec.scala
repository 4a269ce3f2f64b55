package graft.datalog

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** File-based relation loading (the reference's registerAndLoadTable:
  * `.csv` → comma-delimited, else tab; `%` comment lines skipped;
  * values trimmed and typed per declaration — dl/Utilities.scala:86-137). */
class LoaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registerAndLoadTable: csv with comments and padding") {
    val f = Files.createTempFile("arc", ".csv")
    Files.writeString(f,
      "% comment line\n0, 1\n1,2\n% another\n 2 ,3\n")
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(
      "database({arc(X:integer, Y:integer)}). tc(A,B) <- arc(A,B)." +
        "tc(A,B) <- tc(A,C), arc(C,B).")
    ctx.registerAndLoadTable("arc", f.toString)
    val rows = ctx.queryStrings("tc(A,B).").toSet
    assert(rows == Set("[0,1]", "[1,2]", "[2,3]", "[0,2]", "[1,3]", "[0,3]"))
  }

  test("program handle: toDF / execute / count parity surface") {
    val ctx = new DatalogContext(spark)
    ctx.loadProgram(
      "database({arc(X:integer, Y:integer)}). tc(A,B) <- arc(A,B)." +
        "tc(A,B) <- tc(A,C), arc(C,B).")
    ctx.registerData("arc", Seq("0,1", "1,2"))
    val p = ctx.program("tc(A,B).")
    assert(p.count() == 3L)
    assert(p.toDF.columns.toSeq == Seq("a", "b"))
    assert(p.execute().count() == 3L)
  }

  test("registerAndLoadTable: tab-delimited (non-.csv path)") {
    val f = Files.createTempFile("arc", ".txt")
    Files.writeString(f, "5\t6\n6\t7\n")
    val ctx = new DatalogContext(spark)
    ctx.loadProgram("database({arc(X:integer, Y:integer)}).")
    ctx.registerAndLoadTable("arc", f.toString)
    assert(ctx.queryStrings("arc(A,B).").toSet == Set("[5,6]", "[6,7]"))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import graft.datalog.DatalogContext

/** End-to-end demo of the Datalog engine's public API: TC over a cyclic
  * graph, SSSP via monotonic mmin, and a stratified aggregate — run with
  * `sbt "runMain graft.DatalogDemo"`. */
object DatalogDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ctx = new DatalogContext(spark)
    ctx.loadProgram(
      "database({arc(From:integer, To:integer)})." +
        "tc(A,B) <- arc(A,B)." +
        "tc(A,B) <- tc(A,C), arc(C,B).")
    // cyclic graph: 0→1→2→3→0 plus 3→4
    ctx.registerData("arc", Seq("0,1", "1,2", "2,3", "3,0", "3,4"))
    println("== transitive closure over a cycle ==")
    ctx.query("tc(A,B).").orderBy("a", "b").show(30)

    ctx.loadProgram(
      "database({warc(X:integer, Y:integer, D:integer)})." +
        "mminpath(X,mmin<D>) <- X=0, D=0." +
        "mminpath(Z,mmin<D>) <- mminpath(X,D1), warc(X,Z,D2), D=D1+D2." +
        "sssp(X,min<D>) <- mminpath(X,D).")
    // weighted cyclic graph — monotonic mmin terminates despite the cycle
    ctx.registerData("warc", Seq("0,1,5", "1,2,5", "2,0,5", "0,2,20", "2,3,1"))
    println("== single-source shortest paths (mmin in recursion) ==")
    ctx.query("sssp(V,D).").orderBy("v").show()

    spark.stop()
  }
}

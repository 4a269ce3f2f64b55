package graft.tools

/** Prints the bench's actual query iteration order (SparkEntry.queries
  * is a hash Map — order is deterministic but not source order). */
object PrintOrder {
  def main(args: Array[String]): Unit =
    println("ORDER " + graft.SparkEntry.queries.keys.mkString(","))
}

package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the native kernels, via the public
  * `SparkSessionExtensions` mechanism:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * spark.sql("SELECT minhash_sig(hashes, 16) FROM docs")
  * }}}
  *
  * or at runtime on an existing session:
  * `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash_sig",
      info("minhash_sig",
        "minhash_sig(arr[, k]) - k-element MinHash signature of an array<bigint> of shingle hashes"),
      {
        case Seq(c) => MinHashSig(c)
        case Seq(c, Literal(k: Int, IntegerType)) => MinHashSig(c, k)
        case args => throw new IllegalArgumentException(
          s"minhash_sig expects (array[, int literal]), got ${args.length} args")
      }),
    ("simhash32",
      info("simhash32",
        "simhash32(arr) - 32-bit SimHash of an array<bigint> of token hashes"),
      { case Seq(c) => SimHash32(c) }),
    ("dot_i64",
      info("dot_i64",
        "dot_i64(a, b) - integer dot product of two array<bigint>"),
      { case Seq(l, r) => DotI64(l, r) }),
    ("sorted_intersect_count",
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - common-element count of two sorted distinct array<bigint>"),
      { case Seq(l, r) => SortedIntersectCount(l, r) }),
    ("sorted_jaccard_ge",
      info("sorted_jaccard_ge",
        "sorted_jaccard_ge(a, b, num, den) - early-exit test of Jaccard(a, b) >= num/den over sorted distinct array<bigint>"),
      {
        case Seq(l, r, Literal(n: Int, IntegerType), Literal(d: Int, IntegerType)) =>
          SortedJaccardGe(l, r, n, d)
        case args if args.length == 4 => throw new IllegalArgumentException(
          "sorted_jaccard_ge thresholds must be plain int LITERALS " +
            s"(got ${args(2).sql}, ${args(3).sql})")
        case args => throw new IllegalArgumentException(
          s"sorted_jaccard_ge expects (array, array, int literal, int literal), got ${args.length} args")
      }),
    ("dhash63",
      info("dhash63",
        "dhash63(payload) - 63-bit perceptual dHash of a string payload (8x9 sample grid)"),
      { case Seq(c) => DHash63(c) }),
    ("token_hash64",
      info("token_hash64",
        "token_hash64(arr) - u32 polynomial hash per token of an array<string>"),
      { case Seq(c) => TokenHash64(c) }),
    ("shingle3_sorted_set",
      info("shingle3_sorted_set",
        "shingle3_sorted_set(arr) - sorted distinct 3-gram shingle hashes of an array<bigint>"),
      { case Seq(c) => Shingle3SortedSet(c) })
  )

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, b) =>
      GraftColumnBridge.registerFunction(spark, name, i, b)
    }
}

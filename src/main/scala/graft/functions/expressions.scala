package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with whole-stage codegen) for the hot
  * dedup/similarity kernels. Spark's higher-order functions
  * (`transform`/`aggregate`) evaluate their lambdas interpreted per
  * element; these expressions generate tight Java loops instead —
  * the brief's preference ladder (b): a custom codegen'd `Expression`
  * beats composing HOFs beats a UDF. Semantics are bit-identical to the
  * HOF formulations they replace (spec-checked), so the DuckDB oracles
  * are unchanged.
  */

/** k-element MinHash signature over an array of shingle hashes:
  * sig[j] = min over h of ((2j+1)·h + (1000003·j + 12345)) mod p. */
case class MinHashSig(child: Expression, k: Int = 16, p: Long = 1000000007L)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireLongArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    GraftFunctions.checkNulls(prettyName, arr, GraftFunctions.elemNullable(child))
    val n = arr.numElements()
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = 2L * j + 1L
      val b = 1000003L * j + 12345L
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * arr.getLong(i) + b) % p
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
        ${GraftFunctions.nullScanCode(ctx, prettyName, c, GraftFunctions.elemNullable(child))}
        final int $n = $c.numElements();
        final long[] $out = new long[$k];
        for (int $j = 0; $j < $k; $j++) {
          final long a = 2L * $j + 1L;
          final long b = 1000003L * $j + 12345L;
          long $m = Long.MAX_VALUE;
          for (int $i = 0; $i < $n; $i++) {
            final long $v = (a * $c.getLong($i) + b) % ${p}L;
            if ($v < $m) $m = $v;
          }
          $out[$j] = $m;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 32-bit SimHash over an array of token hashes: bit b set iff the
  * majority vote sum over tokens of ±1 (per bit b of the hash) is > 0. */
case class SimHash32(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftFunctions.requireLongArray(prettyName, child)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    GraftFunctions.checkNulls(prettyName, arr, GraftFunctions.elemNullable(child))
    val n = arr.numElements()
    var sim = 0L
    var b = 0
    while (b < 32) {
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += (if (((arr.getLong(i) >> b) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (acc > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val sim = ctx.freshName("sim")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      s"""
        ${GraftFunctions.nullScanCode(ctx, prettyName, c, GraftFunctions.elemNullable(child))}
        final int $n = $c.numElements();
        long $sim = 0L;
        for (int $b = 0; $b < 32; $b++) {
          long $acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ((($c.getLong($i) >> $b) & 1L) == 1L) ? 1L : -1L;
          }
          if ($acc > 0) $sim |= (1L << $b);
        }
        ${ev.value} = $sim;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Integer dot product of two long arrays (the quantized-embedding
  * similarity kernel); lengths are expected to match, extra elements on
  * the longer side are ignored. */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GraftFunctions.requireLongArray(prettyName, left)
    if (l.isFailure) l else GraftFunctions.requireLongArray(prettyName, right)
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    GraftFunctions.checkNulls(prettyName, la, GraftFunctions.elemNullable(left))
    GraftFunctions.checkNulls(prettyName, ra, GraftFunctions.elemNullable(right))
    val n = math.min(la.numElements(), ra.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += la.getLong(i) * ra.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        ${GraftFunctions.nullScanCode(ctx, prettyName, l, GraftFunctions.elemNullable(left))}
        ${GraftFunctions.nullScanCode(ctx, prettyName, r, GraftFunctions.elemNullable(right))}
        final int $n = java.lang.Math.min($l.numElements(), $r.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += $l.getLong($i) * $r.getLong($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED long arrays — an
  * O(n+m) merge walk, the verify kernel of the blocked near-dup
  * pipelines (array_intersect is a per-element hash probe over
  * interpreted ArrayData; this is a generated two-pointer loop).
  * Inputs must be sorted ascending with distinct elements. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GraftFunctions.requireLongArray(prettyName, left)
    if (l.isFailure) l else GraftFunctions.requireLongArray(prettyName, right)
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    GraftFunctions.checkNulls(prettyName, la, GraftFunctions.elemNullable(left))
    GraftFunctions.checkNulls(prettyName, ra, GraftFunctions.elemNullable(right))
    val (n, m) = (la.numElements(), ra.numElements())
    var (i, j) = (0, 0)
    var c = 0L
    while (i < n && j < m) {
      val a = la.getLong(i); val b = ra.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      s"""
        ${GraftFunctions.nullScanCode(ctx, prettyName, l, GraftFunctions.elemNullable(left))}
        ${GraftFunctions.nullScanCode(ctx, prettyName, r, GraftFunctions.elemNullable(right))}
        final int $n = $l.numElements();
        final int $m = $r.numElements();
        int $i = 0; int $j = 0; long $c = 0L;
        while ($i < $n && $j < $m) {
          final long $a = $l.getLong($i);
          final long $b = $r.getLong($j);
          if ($a == $b) { $c++; $i++; $j++; }
          else if ($a < $b) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Column-API helpers for the native expressions. */
object GraftFunctions {
  private[functions] def requireLongArray(
      name: String, e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<bigint>, got ${other.catalogString}")
  }

  /** Does this array expression's type admit null elements? When true the
    * kernels add an upfront null scan (getLong on a null slot would read
    * garbage silently); when the schema proves non-null the generated
    * loops stay branch-free. */
  private[functions] def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  /** Public (not private[functions]): called from generated code, which
    * needs the JVM static forwarder package-private members don't get. */
  def failNullElement(name: String): Nothing =
    throw new IllegalArgumentException(
      s"$name: null array element (kernels require non-null array<bigint>)")

  /** Interpreted-path guard: scan for null slots when the type admits them. */
  private[functions] def checkNulls(name: String, arr: ArrayData, nullable: Boolean): Unit =
    if (nullable) {
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (arr.isNullAt(i)) failNullElement(name)
        i += 1
      }
    }

  /** Codegen guard: emits the null scan only when the type admits nulls. */
  private[functions] def nullScanCode(
      ctx: CodegenContext, name: String, arr: String, nullable: Boolean): String =
    if (!nullable) ""
    else {
      val i = ctx.freshName("ni")
      s"""
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          if ($arr.isNullAt($i))
            graft.functions.GraftFunctions.failNullElement("$name");
        }
      """
    }

  def minhashSig(c: Column, k: Int = 16): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c), k))
  def simhash32(c: Column): Column =
    GraftColumnBridge.column(SimHash32(GraftColumnBridge.expression(c)))
  def dotI64(l: Column, r: Column): Column =
    GraftColumnBridge.column(DotI64(
      GraftColumnBridge.expression(l), GraftColumnBridge.expression(r)))
  def sortedIntersectCount(l: Column, r: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(l), GraftColumnBridge.expression(r)))
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** The native codegen'd expressions must be bit-identical to the
  * higher-order-function formulations they replaced (which are also the
  * DuckDB oracle formulas). */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val P = 1000000007L

  private def hashesDF = {
    import spark.implicits._
    Seq(
      (1L, Seq(5L, 4294967295L, 17L, 123456789L)),
      (2L, Seq(0L, 1L)),
      (3L, (1 to 100).map(i => (i * 2654435761L) % 4294967296L))
    ).toDF("id", "h")
  }

  test("MinHashSig matches the transform/array_min HOF formulation") {
    val hof = hashesDF.selectExpr("id",
      s"""transform(sequence(0,15), j ->
            array_min(transform(h, x -> ((2*j+1)*x + (1000003*j + 12345)) % $P))) as sig""")
    val native = hashesDF.select(col("id"), GraftFunctions.minhashSig(col("h")).as("sig"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("SimHash32 matches the nested aggregate HOF formulation") {
    val hof = hashesDF.selectExpr("id",
      """aggregate(transform(sequence(0,31), b ->
           if(aggregate(h, 0L, (acc, x) -> acc + if((shiftright(x, b) & 1) = 1, 1, -1)) > 0,
              shiftleft(1L, b), 0L)),
         0L, (acc, x) -> acc + x) as sim""")
    val native = hashesDF.select(col("id"), GraftFunctions.simhash32(col("h")).as("sim"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("SimHash63 matches the HOF fingerprint formulation, both eval paths") {
    // the per-token 63-bit fingerprint spelled out as HOF arithmetic —
    // the same formula the DuckDB oracle runs (every term < 2^63)
    val hof = hashesDF.selectExpr("id",
      """aggregate(transform(sequence(0,62), b ->
           if(aggregate(h, 0L, (acc, x) -> acc + if((shiftright(
                ((x * 1540483477) % 4294967296) * 2147483648
                + shiftright((x * 663608941) % 4294967296, 1), b) & 1) = 1, 1, -1)) > 0,
              shiftleft(1L, b), 0L)),
         0L, (acc, x) -> acc + x) as sim""")
    def native() = hashesDF.select(col("id"),
      GraftFunctions.simhash63(col("h")).as("sim"))
    assert(native().exceptAll(hof).isEmpty && hof.exceptAll(native()).isEmpty)
    // sign bit never set (63 bits), and the result is vote-majority so
    // doubling the token list (exact repetition) is hash-invariant —
    // the property txt_simhash64_pairs' variant corpus relies on
    val rows = hashesDF.selectExpr("id", "h", "concat(h, h) as hh")
      .select(GraftFunctions.simhash63(col("h")).as("s1"),
        GraftFunctions.simhash63(col("hh")).as("s2")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) == r.getLong(1))
    }
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = native().collect().map(_.toString)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(native().collect().map(_.toString).sameElements(interp))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("DotI64 matches zip_with/aggregate and handles sign/overflow range") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)),
      (Seq(1000000L, 1000000L), Seq(1000000L, -999999L))
    ).toDF("a", "b")
    val hof = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as bigint), (s, v) -> s + v) as d")
    val native = df.select(GraftFunctions.dotI64(col("a"), col("b")).as("d"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("SortedIntersectCount matches size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L), Seq(4L)),
      ((1L to 200L).toSeq, (100L to 300L).toSeq)
    ).toDF("a", "b")
    val hof = df.selectExpr("cast(size(array_intersect(a, b)) as bigint) as c")
    val native = df.select(GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("c"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("SortedJaccardGe == the exact two-count filter on random sorted sets, both eval paths") {
    import spark.implicits._
    // seeded random sorted distinct pairs spanning the decision
    // boundary (shared prefixes, disjoint, identical, empty, skewed
    // sizes) — the early-exit kernel must agree EXACTLY with the
    // n_inter/n_union formulation it replaced, at several thresholds
    val r = new scala.util.Random(20260815L)
    val rows = Seq((Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)), (Seq(4L), Seq(4L))) ++
      (1 to 200).map { _ =>
        val base = Seq.fill(r.nextInt(40) + 1)(r.nextInt(60).toLong)
          .distinct.sorted
        val b = (base.filter(_ => r.nextBoolean()) ++
          Seq.fill(r.nextInt(20))(r.nextInt(90).toLong)).distinct.sorted
        (base, b)
      }
    val df = rows.toDF("a", "b")
    for ((num, den) <- Seq((1, 2), (3, 10), (9, 10), (0, 1), (1, 1))) {
      val exact = df.select(
        GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("i"),
        (size(col("a")) + size(col("b"))).cast("long").as("sz"))
        .selectExpr(s"i * $den >= (sz - i) * $num as want")
        .collect().map(_.getBoolean(0))
      def run(): Array[Boolean] = df
        .select(GraftFunctions.sortedJaccardGe(col("a"), col("b"), num, den).as("g"))
        .collect().map(_.getBoolean(0))
      val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        val interp = run()
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        val gen = run()
        assert(interp.sameElements(exact), s"interpreted diverged at $num/$den")
        assert(gen.sameElements(exact), s"codegen diverged at $num/$den")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }

  test("DHash63 matches the transform/aggregate HOF formulation, both eval paths") {
    import spark.implicits._
    val r = new scala.util.Random(20260815L)
    // random ASCII payloads spanning the regimes: shorter than the 72
    // sample grid, exact-72, long, single char, plus near-dup variants
    // (first char flipped — the pairs-gate true-positive shape)
    val base = (1 to 120).map { _ =>
      val len = 1 + r.nextInt(400)
      new String(Array.fill(len)((32 + r.nextInt(95)).toChar))
    }
    val texts = base ++ base.take(30).map(t => "z" + t.drop(1)) ++
      Seq("a", "ab", new String(Array.fill(72)('q')))
    val df = texts.toDF("text")
    val hof = df.selectExpr(
      "transform(sequence(0,71), i -> ascii(substr(text, cast(i * length(text) div 72 as int) + 1, 1))) as g")
      .selectExpr(
        """aggregate(sequence(0,62), cast(0 as bigint),
             (acc, j) -> acc + if(g[cast(j + j div 8 as int)] > g[cast(j + j div 8 + 1 as int)],
                                  shiftleft(cast(1 as bigint), cast(j as int)),
                                  cast(0 as bigint))) as h""")
      .collect().map(_.getLong(0))
    def run(): Array[Long] = df
      .select(GraftFunctions.dhash63(col("text")).as("h"))
      .collect().map(_.getLong(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(run().sameElements(hof), "interpreted diverged from the HOF")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(run().sameElements(hof), "codegen diverged from the HOF")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("NearestIvfCell == the max(struct) batch argmax, both eval paths") {
    import spark.implicits._
    // seeded random centroids + vectors (negative components, so
    // negative dots exercise the truncating division); ground truth
    // via the exact batch formulation (truncating-div score + argmax
    // with smallest-label tie-break)
    val r = new scala.util.Random(20260815L)
    val dims = 64
    val k = 7
    val labels = (0 until k).map(_.toLong * 3 + 1)
    val ns = (0 until k).map(i => (r.nextInt(50) + 1).toLong)
    val cvecs = (0 until k).map(_ =>
      Seq.fill(dims)((r.nextInt(2000000) - 1000000).toLong))
    val vecs = (1 to 60).map(id =>
      (id.toLong, Seq.fill(dims)((r.nextInt(2001) - 1000).toLong)))
    val df = vecs.toDF("vec_id", "q")
    val want = vecs.map { case (id, q) =>
      val best = (0 until k).map { c =>
        val dot = q.zip(cvecs(c)).map { case (a, b) => a * b }.sum
        (dot * 1000000L / ns(c), -labels(c))
      }.max
      id -> -best._2
    }.toMap
    def run(): Map[Long, Long] = df
      .select(col("vec_id"),
        GraftFunctions.nearestIvfCell(col("q"), labels, ns, cvecs, dims).as("a"))
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(run() == want, "interpreted diverged from the exact argmax")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(run() == want, "codegen diverged from the exact argmax")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("SQL surface via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT minhash_sig(array(5L, 17L), 4) AS sig,
                simhash32(array(5L, 17L)) AS sim,
                dot_i64(array(1L, 2L), array(3L, 4L)) AS dot,
                sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS c""")
      .collect().head
    assert(r.getSeq[Long](r.fieldIndex("sig")).length == 4)
    assert(r.getAs[Long]("dot") == 11L)
    assert(r.getAs[Long]("c") == 2L)
    // 5 = 0b101, 17 = 0b10001: bit0 votes +2 → set; bit2 votes 0 → unset
    assert((r.getAs[Long]("sim") & 1L) == 1L)
  }

  test("TokenHash64 matches the per-char fold HOF formulation (ASCII)") {
    import spark.implicits._
    val df = Seq(
      Seq("the", "quick", "brown", "fox", "the"),
      Seq("a", "", "zz"), // empty token from a double space
      Seq.empty[String]
    ).toDF("t")
    val hof = df.selectExpr(
      s"""transform(t, tok ->
            (aggregate(transform(sequence(1, length(tok)), i -> ascii(substr(tok, i, 1))),
               0L, (h, c) -> (h*31 + c) % $P) * 2654435761) % 4294967296) as h""")
    val native = df.select(GraftFunctions.tokenHash64(col("t")).as("h"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("Shingle3SortedSet matches the sorted-distinct 3-gram HOF formulation") {
    import spark.implicits._
    val df = Seq(
      Seq(5L, 4294967295L, 17L, 123456789L, 5L, 4294967295L, 17L),
      Seq(1L, 2L), // fewer than 3 hashes → empty
      (1L to 50L).toSeq
    ).toDF("h")
    val hof = df.selectExpr(
      s"""array_sort(array_distinct(
            case when size(h) >= 3 then
              transform(sequence(0, size(h)-3),
                i -> ((((h[i] % $P)*1000003 + h[i+1]) % $P)*1000003 + h[i+2]) % $P)
            else cast(array() as array<bigint>) end)) as s""")
    val native = df.select(GraftFunctions.shingle3SortedSet(col("h")).as("s"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("NGramHashSet matches the aggregate-in-transform HOF formulation") {
    import spark.implicits._
    val df = Seq(
      (1L to 40L).toSeq,
      Seq(5L, 4294967295L, 17L, 123456789L, 5L, 4294967295L, 17L,
        9L, 8L, 7L, 6L, 5L, 4L, 3L, 2L),
      Seq(1L, 2L) // fewer than 13 → empty
    ).toDF("h")
    val hof = df.selectExpr(
      s"""array_sort(array_distinct(
            case when size(h) >= 13 then
              transform(sequence(0, size(h) - 13),
                i -> aggregate(slice(h, i + 1, 13), cast(0 as bigint),
                       (a, x) -> (a * 1000003 + x) % $P))
            else cast(array() as array<bigint>) end)) as s""")
    val native = df.select(GraftFunctions.nGramHashSet(col("h"), 13).as("s"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // width 3 with the 0-fold start equals Shingle3SortedSet
    val s3 = df.select(GraftFunctions.shingle3SortedSet(col("h")).as("s"))
    val n3 = df.select(GraftFunctions.nGramHashSet(col("h"), 3).as("s"))
    assert(n3.exceptAll(s3).isEmpty && s3.exceptAll(n3).isEmpty)
  }

  test("NGramHashSet interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq((1L to 30L).toSeq).toDF("h")
    def run(): Array[String] = df
      .select(GraftFunctions.nGramHashSet(col("h"), 13).as("s"))
      .collect().map(_.toString)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = run()
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(run().sameElements(interp))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("TokenHash64/Shingle3SortedSet interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq(Seq("alpha", "beta", "gamma", "delta", "beta")).toDF("t")
    def run(): Array[String] = df
      .select(GraftFunctions.shingle3SortedSet(
        GraftFunctions.tokenHash64(col("t"))).as("s"))
      .collect().map(_.toString)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = run()
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(run().sameElements(interp))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null array elements fail loudly instead of reading garbage") {
    // array() of nullable exprs types as array<bigint> with containsNull —
    // the kernels must reject a null slot, not silently getLong(0) it
    val df = spark.sql("SELECT array(1L, if(rand() < 2, null, 2L), 3L) AS h")
    val err = intercept[Exception] {
      df.select(GraftFunctions.minhashSig(col("h"))).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        .filter(_ != null).mkString(" | "))
    assert(rootMsg(err).contains("null array element"))
    // non-null values through the same nullable-typed column still work
    val ok = spark.sql("SELECT array(5L, if(rand() < 2, 17L, null)) AS h")
      .select(GraftFunctions.simhash32(col("h")).as("sim")).collect().head
    assert((ok.getAs[Long]("sim") & 1L) == 1L)
  }

  test("NGramHashSeq matches the positional HOF and the set form's distinct") {
    val width = 3
    val hof = hashesDF.selectExpr("id",
      s"""case when size(h) >= $width then
            transform(sequence(0, size(h) - $width),
              i -> aggregate(slice(h, i + 1, $width), cast(0 as bigint),
                     (a, x) -> (a * 1000003 + x) % $P))
          else array() end as g""")
    val native = hashesDF.select(col("id"),
      GraftFunctions.nGramHashSeq(col("h"), width).as("g"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // the set kernel is exactly sort_distinct of the positional one
    val setForm = hashesDF.select(col("id"),
      GraftFunctions.nGramHashSet(col("h"), width).as("s"))
    val seqThenDedup = hashesDF.select(col("id"),
      array_sort(array_distinct(GraftFunctions.nGramHashSeq(col("h"), width)))
        .as("s"))
    assert(seqThenDedup.exceptAll(setForm).isEmpty &&
      setForm.exceptAll(seqThenDedup).isEmpty)
  }

  test("HyperplaneBucket matches the nested aggregate HOF formulation") {
    import spark.implicits._
    // 64-dim quantized vectors incl. negatives, zeros, and magnitudes
    val df = Seq(
      (1L, (0 until 64).map(i => ((i * 37) % 13 - 6) * 1000L)),
      (2L, (0 until 64).map(i => if (i % 2 == 0) -5000L else 4999L)),
      (3L, Seq.fill(64)(0L)),
      (4L, (0 until 64).map(i => (i * 2654435761L) % 9973L - 4986L))
    ).toDF("id", "q")
    def hof(bits: Int, dims: Int) =
      s"""aggregate(transform(sequence(0,${bits - 1}), j ->
            if(aggregate(transform(sequence(0,${dims - 1}), i ->
                 q[i] * (((i*31 + j*17) % 7) - 3)), cast(0 as bigint), (s, x) -> s + x) > 0,
               shiftleft(1L, j), 0L)),
          0L, (s, x) -> s + x) as bkt"""
    for ((bits, dims) <- Seq((8, 64), (12, 64))) {
      val h = df.selectExpr("id", hof(bits, dims))
      val n = df.select(col("id"),
        GraftFunctions.hyperplaneBucket(col("q"), bits, dims).as("bkt"))
      assert(n.exceptAll(h).isEmpty && h.exceptAll(n).isEmpty,
        s"bits=$bits dims=$dims diverged")
    }
    // the PQ subspace shape (dims=16, bits=4) over slices
    val sliced = df.selectExpr("id", "slice(q, 1, 16) as q")
    val h16 = sliced.selectExpr("id", hof(4, 16))
    val n16 = sliced.select(col("id"),
      GraftFunctions.hyperplaneBucket(col("q"), 4, 16).as("bkt"))
    assert(n16.exceptAll(h16).isEmpty && h16.exceptAll(n16).isEmpty)
    // short array: every plane sum is null in the HOF -> bucket 0
    val short = Seq((1L, Seq(1L, 2L))).toDF("id", "q")
    assert(short.select(GraftFunctions.hyperplaneBucket(col("q"), 8, 64))
      .collect().head.getLong(0) == 0L)
  }

  test("HyperplaneBucket interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq((0 until 64).map(i => ((i * 71) % 17 - 8) * 123L))
      .toDF("q")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val a = df.select(GraftFunctions.hyperplaneBucket(col("q"), 8).as("b"))
        .collect().head.getLong(0)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val b = df.select(GraftFunctions.hyperplaneBucket(col("q"), 8).as("b"))
        .collect().head.getLong(0)
      assert(a == b)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("interpreted eval path (no codegen) agrees with codegen") {
    // force the interpreted path by evaluating via collect on a plan with
    // codegen disabled
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = hashesDF
        .select(col("id"), GraftFunctions.minhashSig(col("h")).as("sig"),
          GraftFunctions.simhash32(col("h")).as("sim"))
        .collect().map(_.toString).sorted
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val gen = hashesDF
        .select(col("id"), GraftFunctions.minhashSig(col("h")).as("sig"),
          GraftFunctions.simhash32(col("h")).as("sim"))
        .collect().map(_.toString).sorted
      assert(interp.sameElements(gen))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}

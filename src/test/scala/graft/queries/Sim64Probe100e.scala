package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{simhash63, tokenHash64}

/** Throwaway (Test scope, never shipped): sf100-equivalent probe for the
  * 63-bit simhash near-dup operator (judge r17 #6) — the at-scale
  * near-dup twin of r17's ANN sf100e checks.
  *
  * The full answer three decades up is OUTPUT-bound, not compute-bound:
  * the ~110x/decade pair law puts sf100e at ~10^10 pairs (un-dumpable
  * and un-oracle-able). What IS checkable at full scale is everything
  * up to the answer expansion: the signature pass, the distinct-hash
  * grouping, the two-level pigeonhole band join and the ham<=3 verify
  * all run over the ENTIRE 10M-row aug corpus here; only the final
  * answer-sized expansion from (sim1, sim2) clusters back to doc pairs
  * is sliced to ids divisible by M on BOTH ends (1/M^2 of the answer).
  * The DuckDB oracle computes the SLICE corpus end-to-end with the
  * one-level 16-bit band spec — complete for ham<=3, so the two
  * derivations must agree exactly: both endpoints in-slice ⟹ the pair
  * is derivable from the slice corpus alone (sims are per-doc).
  *
  * The gate's own aug device shifts by 1,000,000 which COLLIDES with
  * real ids at 5M docs (recorded in SURVEY §7m); the probe shifts by
  * 50,000,000 and mirrors that in its oracle.
  *
  *   sbt "Test/runMain graft.queries.Sim64Probe100e <sfDir> <outDir>"
  *   python3 tools/check_oracle.py <sfDir> <outDir>
  */
object Sim64Probe100e {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf100e")
    val outDir = args.lift(1).getOrElse("/root/repo/target/scratch/dump_sim64_100e")
    val M = 97L
    val SHIFT = 50000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          (cpus.toInt * 4).toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val base = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val aug = base.union(base.selectExpr(
      s"doc_id + ${SHIFT}L as doc_id", "concat(text, ' ', text) as text"))
    // FULL-corpus signature pass + distinct-hash grouping (the scale
    // claim under test), checkpointed once like the gate's memo
    val groups = aug
      .select(col("doc_id"), simhash63(tokenHash64(split(col("text"), " "))).as("sim"))
      .groupBy("sim")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .localCheckpoint()
    val nGroups = groups.count()
    println(f"[sim64probe] distinct sims: $nGroups (${(System.nanoTime() - t0) / 1e9}%.1fs)")

    val (bandMask, subMask) = (TextQueries.simBandMask, TextQueries.simSubMask)
    val sliced = groups.select(col("sim"),
      expr(s"filter(ids, d -> d % $M = 0)").as("ids"))
    val intra = sliced.filter(size(col("ids")) >= 2)
      .selectExpr(
        """explode(flatten(transform(sequence(0, size(ids)-2),
             i -> transform(sequence(i+1, size(ids)-1),
               j -> struct(ids[i] as d1, ids[j] as d2))))) as p""")
      .selectExpr("p.d1 as d1", "p.d2 as d2", "cast(0 as bigint) as ham")
    // the distinct-value band join runs over ALL sims (gate-identical
    // two-level pigeonhole machinery, full 3-decade scale)
    val combos = (for { b <- 0 to 3; j <- 0 to 3 } yield
      s"struct(${b * 4 + j} as c, sim & ${bandMask(b)}L as bk, " +
        s"sim & ${subMask(b)(j)}L as sk)").mkString(", ")
    val keys = groups.selectExpr("sim", s"explode(array($combos)) as e")
      .select(col("sim"), col("e.c").as("c"),
        col("e.bk").as("bk"), col("e.sk").as("sk"))
    val k1 = keys.select(col("c"), col("bk"), col("sk"), col("sim").as("sim1"))
    val k2 = keys.select(col("c"), col("bk"), col("sk"), col("sim").as("sim2"))
    def innerCase(b: Int): String = {
      val j012 = (0 to 2).map(j =>
        s"when (x & ${subMask(b)(j)}L) = 0 then ${b * 4 + j}").mkString(" ")
      s"(case $j012 else ${b * 4 + 3} end)"
    }
    val comboCase =
      s"""case when (x & ${bandMask(0)}L) = 0 then ${innerCase(0)}
               when (x & ${bandMask(1)}L) = 0 then ${innerCase(1)}
               when (x & ${bandMask(2)}L) = 0 then ${innerCase(2)}
               else ${innerCase(3)} end"""
    val interDistinct = k1.join(k2, Seq("c", "bk", "sk"))
      .filter(col("sim1") < col("sim2"))
      .withColumn("x", expr("sim1 ^ sim2"))
      .filter(expr("bit_count(x) <= 3"))
      .filter(col("c") === expr(comboCase))
      .select(col("sim1"), col("sim2"),
        expr("cast(bit_count(x) as bigint)").as("ham"))
    // expansion sliced to in-slice ids on BOTH sides (answer-sized)
    val inter = interDistinct
      .join(sliced.select(col("sim").as("sim1"), col("ids").as("ids1")), "sim1")
      .join(sliced.select(col("sim").as("sim2"), col("ids").as("ids2")), "sim2")
      .select(explode(col("ids1")).as("da"), col("ids2"), col("ham"))
      .select(col("da"), explode(col("ids2")).as("db"), col("ham"))
      .selectExpr("least(da, db) as d1", "greatest(da, db) as d2", "ham")
    val result = intra.union(inter)

    new java.io.File(outDir).mkdirs()
    result.write.mode("overwrite").parquet(s"$outDir/sim64_slice100e")
    val n = spark.read.parquet(s"$outDir/sim64_slice100e").count()
    println(f"[sim64probe] slice pairs: $n total=${(System.nanoTime() - t0) / 1e9}%.1fs")

    // DuckDB re-derivation over the SLICE corpus (one-level 16-bit band
    // spec — complete for ham<=3; same token hash/fingerprint arithmetic
    // as the committed txt_simhash64_pairs oracle, slice WHEREs added)
    val P = 1000000007L
    def th(e: String) =
      s"""(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(length($e)), ci -> CAST(ascii(substr($e, ci+1, 1)) AS BIGINT))),
            (ph, pc) -> (ph*31 + pc) % $P) * 2654435761) % 4294967296"""
    val sql =
      s"""WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % $M = 0
            UNION ALL
            SELECT doc_id + $SHIFT, text || ' ' || text FROM documents
            WHERE (doc_id + $SHIFT) % $M = 0),
          hs AS (SELECT doc_id,
            list_transform(string_split(text,' '), t -> ${th("t")}) AS h
          FROM v),
          fp AS (SELECT doc_id, list_transform(h, x ->
              ((x * 1540483477) % 4294967296) * 2147483648
              + (((x * 663608941) % 4294967296) // 2)) AS f FROM hs),
          sim AS (SELECT doc_id, CAST(list_sum(list_transform(range(63), b ->
              CASE WHEN 2 * len(list_filter(f, x -> (x >> b) & 1 = 1)) > len(f)
                   THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
            AS BIGINT) AS sim FROM fp),
          bands AS (SELECT doc_id, sim, b, (sim >> (16*b)) & 65535 AS bk
            FROM sim, range(4) r(b)),
          cand AS (SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2,
              b1.sim AS sim1, b2.sim AS sim2
            FROM bands b1 JOIN bands b2 ON b1.b = b2.b AND b1.bk = b2.bk
            WHERE b1.doc_id < b2.doc_id)
          SELECT d1, d2, CAST(bit_count(CAST(xor(sim1, sim2) AS BIT)) AS BIGINT) AS ham
          FROM cand WHERE bit_count(CAST(xor(sim1, sim2) AS BIT)) <= 3"""
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"{${q("sim64_slice100e")}: ${q(sql)}}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of txt_simhash64_pairs (r15): where does the
  * sf1.0 wall sit — the corpus+variant hash map pass, the 16-bit band
  * join, or the first-band dedup/verify tail? */
object Sim64Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scratch/tmp_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.GraftFunctions.{simhash63, tokenHash64}
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val aug = base.union(base.selectExpr("doc_id + 1000000 as doc_id",
      "concat(text, ' ', text) as text"))
    t("base_scan")(base.count())
    val simNoCk = aug.select(col("doc_id"),
      simhash63(tokenHash64(split(col("text"), " "))).as("sim"))
    t("sim_map_pass")(simNoCk.count())
    val sim = simNoCk.localCheckpoint()
    t("sim_checkpoint")(sim.count())
    val bands = sim.selectExpr("doc_id", "sim",
      "explode(transform(sequence(0,3), b -> struct(b as band, shiftright(sim, 16*b) & 65535 as bk))) as e")
      .select(col("doc_id"), col("sim"), col("e.band").as("band"), col("e.bk").as("bk"))
    val b1 = bands.select(col("band"), col("bk"), col("doc_id").as("d1"), col("sim").as("sim1"))
    val b2 = bands.select(col("band"), col("bk"), col("doc_id").as("d2"), col("sim").as("sim2"))
    val joined = b1.join(b2, Seq("band", "bk")).filter(col("d1") < col("d2"))
    t("band_join_candidates")(joined.count())
    val out = joined
      .withColumn("x", expr("sim1 ^ sim2"))
      .filter(col("band") === expr(
        """case when (x & 65535) = 0 then 0
                when (x & 4294901760) = 0 then 1
                when (x & 281470681743360) = 0 then 2
                else 3 end"""))
      .selectExpr("d1", "d2", "cast(bit_count(x) as bigint) as ham")
      .filter(col("ham") <= 3)
    t("full_tail")(out.count())
    // Two-level pigeonhole measurement: for ham<=3 some 16-bit band b is
    // intact; given b, <=3 errors remain in the 47-bit complement, so
    // one of its 4 ~12-bit sub-bands is intact too -> blocking on the
    // 28-bit (band, sub-band) composite stays complete. How many
    // candidates does that leave on this corpus?
    val distinctSim = sim.select("sim").distinct()
    t("distinct_sim_values")(distinctSim.count())
    // complement extraction inline: high << (16b) | low
    val comp = sim.selectExpr("doc_id", "sim",
      "explode(sequence(0,3)) as b")
      .selectExpr("doc_id", "sim", "b",
        "shiftright(sim, 16*b) & 65535 as bk",
        """shiftleft(shiftright(sim, 16*b + 16), cast(16*b as int))
           | (sim & (shiftleft(1L, cast(16*b as int)) - 1)) as compl""")
      .selectExpr("doc_id", "b", "bk", "explode(sequence(0,3)) as j", "compl")
      .selectExpr("doc_id", "b", "bk", "j",
        "case when j < 3 then shiftright(compl, 12*j) & 4095 else shiftright(compl, 36) & 2047 end as sbk")
    val cnt = comp.groupBy("b", "j", "bk", "sbk").count()
      .selectExpr("sum(count * (count - 1) div 2) as cands")
    t("two_level_candidates")(cnt.collect().head.getLong(0))
    // same measurements at the DISTINCT-sim level (canonicalize-first):
    // identical-hash clusters pair up via map-side explode, so the join
    // only ever sees one row per distinct value
    val compD = distinctSim
      .selectExpr("sim", "explode(sequence(0,3)) as b")
      .selectExpr("sim", "b",
        "shiftright(sim, 16*b) & 65535 as bk",
        """shiftleft(shiftright(sim, cast(16*b + 16 as int)), cast(16*b as int))
           | (sim & (shiftleft(1L, cast(16*b as int)) - 1)) as compl""")
      .selectExpr("sim", "b", "bk", "explode(sequence(0,3)) as j", "compl")
      .selectExpr("sim", "b", "bk", "j",
        "case when j < 3 then shiftright(compl, 12*j) & 4095 else shiftright(compl, 36) & 2047 end as sbk")
    val cntD1 = distinctSim
      .selectExpr("sim", "explode(sequence(0,3)) as b")
      .selectExpr("b", "shiftright(sim, 16*b) & 65535 as bk")
      .groupBy("b", "bk").count()
      .selectExpr("sum(count * (count - 1) div 2) as cands")
    t("distinct_one_level_candidates")(cntD1.collect().head.getLong(0))
    val cntD = compD.groupBy("b", "j", "bk", "sbk").count()
      .selectExpr("sum(count * (count - 1) div 2) as cands")
    t("distinct_two_level_candidates")(cntD.collect().head.getLong(0))
    // same question for the 32-BIT compatibility gate (no variants in
    // that corpus): distinct values, and candidates under one-level
    // 4x8-bit vs two-level (8-bit band + 6-bit sub-band of the 24-bit
    // complement, 14-bit composite) blocking
    import graft.functions.GraftFunctions.simhash32
    val sim32 = base.select(
      simhash32(tokenHash64(split(col("text"), " "))).as("sim"))
      .localCheckpoint()
    val d32 = sim32.select("sim").distinct().localCheckpoint()
    t("sim32_distinct_values")(d32.count())
    val one32 = d32.selectExpr("sim", "explode(sequence(0,3)) as b")
      .selectExpr("b", "shiftright(sim, 8*b) & 255 as bk")
      .groupBy("b", "bk").count()
      .selectExpr("sum(count * (count - 1) div 2) as cands")
    t("sim32_distinct_one_level_candidates")(one32.collect().head.getLong(0))
    val two32 = d32.selectExpr("sim", "explode(sequence(0,3)) as b")
      .selectExpr("sim", "b", "shiftright(sim, 8*b) & 255 as bk",
        """shiftleft(shiftright(sim, cast(8*b + 8 as int)), cast(8*b as int))
           | (sim & (shiftleft(1L, cast(8*b as int)) - 1)) as compl""")
      .selectExpr("sim", "b", "bk", "explode(sequence(0,3)) as j", "compl")
      .selectExpr("b", "bk", "j", "shiftright(compl, 6*j) & 63 as sbk")
      .groupBy("b", "j", "bk", "sbk").count()
      .selectExpr("sum(count * (count - 1) div 2) as cands")
    t("sim32_distinct_two_level_candidates")(two32.collect().head.getLong(0))
    spark.stop()
  }
}

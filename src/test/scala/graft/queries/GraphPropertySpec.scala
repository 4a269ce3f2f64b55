package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.TestSpark

/** Property tests for the graph fixpoints against in-JVM oracles on
  * seeded random graphs — the same treatment `PropertySpec` gives the
  * Datalog layer (Warshall/Dijkstra/union-find). Both operators are
  * exact-integer, so the oracle compare is equality, not tolerance. */
class GraphPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import scala.util.Random

  /** Random DAG: edges only low→high id, so integer PageRank provably
    * quantizes to a fixed point within depth rounds. */
  private def randomDag(rng: Random, n: Int, m: Int): Seq[(Long, Long)] =
    (1 to m).map { _ =>
      val a = rng.nextInt(n - 1)
      val b = a + 1 + rng.nextInt(n - a - 1)
      (a.toLong, b.toLong)
    }.distinct

  /** Random digraph, cycles allowed (peeling always terminates). */
  private def randomGraph(rng: Random, n: Int, m: Int): Seq[(Long, Long)] =
    (1 to m).map { _ =>
      val a = rng.nextInt(n); var b = rng.nextInt(n)
      if (b == a) b = (b + 1) % n
      (a.toLong, b.toLong)
    }.distinct

  /** The gate's integer PageRank simulated in-JVM (same floor/div
    * semantics; values are non-negative so div == floor). */
  private def pagerankOracle(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = (0 until n).map(v => v.toLong -> 1000000L).toMap
    var it = 0
    while (it < 64) {
      it += 1
      val sums = new scala.collection.mutable.HashMap[Long, Long]()
      for ((a, b) <- edges)
        sums(b) = sums.getOrElse(b, 0L) + pr(a) / outdeg(a)
      val next = (0 until n).map { v =>
        v.toLong -> (150000L + (850000L * sums.getOrElse(v.toLong, 0L)) / 1000000L)
      }.toMap
      if (next == pr) return pr
      pr = next
    }
    sys.error("oracle did not converge")
  }

  /** Iterative peel oracle: shell = round removed, 0 = survives. */
  private def kcoreOracle(n: Int, edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val adj = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.Set[Long]]()
    for ((a, b) <- edges if a != b) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
    }
    val shell = new scala.collection.mutable.HashMap[Long, Long]()
    (0 until n).foreach(v => shell(v.toLong) = 0L)
    var round = 0L
    var changed = true
    while (changed) {
      round += 1
      val rm = (0 until n).map(_.toLong)
        .filter(v => shell(v) == 0L && adj.get(v).map(_.size).getOrElse(0) < k)
      changed = rm.nonEmpty
      for (v <- rm) {
        shell(v) = round
        adj.remove(v).foreach(_.foreach(u => adj.get(u).foreach(_ -= v)))
      }
    }
    shell.toMap
  }

  /** Self-vote synchronous LPA in-JVM: each node adopts the most
    * frequent label among neighbors + itself (ties → smallest). */
  private def lpaOracle(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.Set[Long]]()
    for ((a, b) <- edges if a != b) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
    }
    var lab = (0 until n).map(v => v.toLong -> v.toLong).toMap
    var it = 0
    while (it < 64) {
      it += 1
      val next = (0 until n).map { v0 =>
        val v = v0.toLong
        val votes = new scala.collection.mutable.HashMap[Long, Long]()
        votes(lab(v)) = 1L
        for (u <- adj.getOrElse(v, scala.collection.mutable.Set.empty))
          votes(lab(u)) = votes.getOrElse(lab(u), 0L) + 1L
        v -> votes.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }.toMap
      if (next == lab) return lab
      lab = next
    }
    sys.error("oracle did not converge")
  }

  test("lpaConverged matches the in-JVM self-vote oracle on random graphs") {
    val rng = new Random(11)
    for (trial <- 1 to 3) {
      val n = 30 + rng.nextInt(40)
      val edges = randomGraph(rng, n, 2 * n)
      val s = spark.newSession()
      import s.implicits._
      val nodes = (0 until n).map(_.toLong).toDF("x")
      val arc = edges.toDF("x", "y")
      val und = arc.union(arc.select(col("y").as("x"), col("x").as("y"))).distinct()
      val got = GraphQueries.lpaConverged(s, nodes, und)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = lpaOracle(n, edges)
      assert(got == want,
        s"trial $trial (n=$n): ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    }
    PackResources.releaseAll()
  }

  test("pagerankConverged matches the in-JVM integer oracle on random DAGs") {
    val rng = new Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + rng.nextInt(40)
      val edges = randomDag(rng, n, 3 * n)
      val s = spark.newSession()
      import s.implicits._
      val nodes = (0 until n).map(_.toLong).toDF("x")
      val arc = edges.toDF("x", "y")
      val ed = arc.join(arc.groupBy("x").agg(count(lit(1)).as("d")), "x")
        .select(col("x"), col("y"), col("d"))
      val got = GraphQueries.pagerankConverged(s, nodes, ed)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = pagerankOracle(n, edges)
      assert(got == want,
        s"trial $trial (n=$n): ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    }
    PackResources.releaseAll()
  }

  test("kcoreShells matches the in-JVM peel oracle on random cyclic graphs") {
    val rng = new Random(7)
    for (trial <- 1 to 3) {
      val n = 30 + rng.nextInt(40)
      val edges = randomGraph(rng, n, 2 * n)
      val s = spark.newSession()
      import s.implicits._
      val nodes = (0 until n).map(_.toLong).toDF("x")
      val arc = edges.toDF("x", "y")
      val got = GraphQueries.kcoreShells(s, nodes, arc, 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = kcoreOracle(n, edges, 3)
      assert(got == want,
        s"trial $trial (n=$n): ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    }
    PackResources.releaseAll()
  }

  test("graph fixpoint state is fully released (no leaked blocks)") {
    val baseline = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val s = spark.newSession()
    import s.implicits._
    val edges = randomDag(new Random(3), 50, 120)
    val nodes = (0 until 50).map(_.toLong).toDF("x")
    val arc = edges.toDF("x", "y")
    val ed = arc.join(arc.groupBy("x").agg(count(lit(1)).as("d")), "x")
      .select(col("x"), col("y"), col("d"))
    GraphQueries.pagerankConverged(s, nodes, ed).count()
    GraphQueries.kcoreShells(s, nodes, arc, 3).count()
    assert((spark.sparkContext.getPersistentRDDs.keySet.toSet -- baseline).nonEmpty,
      "fixpoints must have pinned final-state blocks until release")
    PackResources.releaseAll()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- baseline
    assert(leaked.isEmpty, s"leaked persistent RDDs after releaseAll: $leaked")
  }

  test("graph_ra_linkpred matches brute-force resource allocation") {
    val dir = "/root/testdata/sf0.001"
    val arc = DatalogQueries.arcDF(spark, dir).select("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = (arc ++ arc.map(e => (e._2, e._1))).distinct
    val undSet = und.toSet
    val nbr = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = nbr.view.mapValues(_.size.toLong).toMap
    val expected = (for {
      (z, ns) <- nbr.toSeq
      a <- ns; b <- ns if a < b && !undSet.contains((a, b))
    } yield ((a, b), z))
      .groupBy(_._1)
      .map { case ((a, b), zs) =>
        val common = zs.map(_._2).distinct
        (a, b, common.map(z => 1000000L / deg(z)).sum, common.size.toLong)
      }.toSet
    val got = graft.SparkEntry.queries("graph_ra_linkpred")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("ra_score"), r.getAs[Long]("n_common"))).toSet
    assert(got == expected)
    // predicted links must be NON-edges that share >=1 neighbor
    assert(got.nonEmpty && got.forall(p => !undSet.contains((p._1, p._2))))
    PackResources.releaseAll()
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // Star: user 1 interacts with items 10,11,12; users 2,3 with item 10.
  private def starInter = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 10L), (3L, 10L)
  ).toDF("user_id", "item_id")

  test("pagerank conserves total mass up to integer-division loss") {
    val r = Graph.pagerankFrom(starInter, iters = 3)
    val total = r.agg(sum("rank")).as[Long].head()
    val n = r.count()
    // each node loses < deg units per round to integer division, and
    // the teleport base floor loses < 100*N units per round
    assert(n == 6) // users 1-3 + items 10-12
    assert(total <= Graph.Scale)
    assert(total > GraphSpecUtil.massLowerBound(Graph.Scale, n, rounds = 3))
  }

  test("hub nodes outrank leaves, symmetric leaves tie exactly") {
    val r = Graph.pagerankFrom(starInter, iters = 5)
      .select(col("node_type"), col("id"), col("rank"))
      .as[(String, Long, Long)].collect().toSeq
    val rank = r.map { case (t, i, v) => (t, i) -> v }.toMap
    // item 10 (deg 3) and user 1 (deg 3) are the two hubs
    assert(rank(("item", 10L)) > rank(("item", 11L)))
    assert(rank(("user", 1L)) > rank(("user", 2L)))
    // symmetric positions get bit-identical ranks
    assert(rank(("item", 11L)) == rank(("item", 12L)))
    assert(rank(("user", 2L)) == rank(("user", 3L)))
  }

  test("triangles: planted triangle + pendant, exact counts and ppm") {
    // {1,2,3} closed, 4 pendant off 3: deg = (2,2,3,1)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("i", "j")
    val got = Graph.triangleStats(edges)
      .select("item_id", "degree", "n_triangles", "clustering_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (1L, 2L, 1L, 1000000L), // 2*1e6/(2*1)
      (2L, 2L, 1L, 1000000L),
      (3L, 3L, 1L, 333333L),  // 2*1e6/(3*2)
      (4L, 1L, 0L, 0L)))      // pendant: no triangle, deg<2 -> 0
  }

  test("triangles: hub graph — orientation keeps wedges off the hub") {
    // star around 0 (deg 6) plus one closed rim pair: exactly 1 triangle
    val rim = (1L to 6L).map(k => (0L, k))
    val edges = (rim :+ (1L, 2L)).toDF("i", "j")
    val got = Graph.triangleStats(edges)
      .select("item_id", "n_triangles").as[(Long, Long)].collect().toMap
    assert(got(0L) === 1L && got(1L) === 1L && got(2L) === 1L)
    assert((3L to 6L).forall(got(_) === 0L))
  }

  test("triangles: partition invariance") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (1L, 4L)).toDF("i", "j")
    val a = Graph.triangleStats(edges).orderBy("item_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val b = Graph.triangleStats(edges.repartition(5)).orderBy("item_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("itemEdges: co-count floor filters casual pairs") {
    // items 10,11 shared by 3 users; 10,12 by only 1
    val inter = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (4L, 10L), (4L, 12L)).toDF("user_id", "item_id")
    val e = Graph.itemEdges(inter, minCo = 3L)
      .as[(Long, Long)].collect().toSeq
    assert(e === Seq((10L, 11L)))
  }

  test("link prediction: open wedge predicted, closed pairs excluded, cap bounds the hub") {
    // path 1-2-3: (1,3) share neighbor 2 and are not adjacent ->
    // predicted with Jaccard 1/(1+1-1) = 1.0; adjacent pairs never emit
    val path = Seq((1L, 2L), (2L, 3L)).toDF("i", "j")
    val got = Graph.linkPredict(path)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 1L, 1000000L)))
    // star 1,2,3 - 9: uncapped predicts all three spoke pairs; with
    // the adjacency capped at 2 the hub keeps neighbors {1, 2} only
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("i", "j")
    val full = Graph.linkPredict(star)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(full === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val capped = Graph.linkPredict(star, maxNbr = 2L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(capped === Seq((1L, 2L, 1L, 1000000L)))
  }

  test("lpa: cliques cohere to one label; frequency beats an intruding min") {
    // two disjoint triangles: each converges to its min id in round 1
    // (self-inclusion: every member sees all three labels, min wins)
    val twoCliques = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("i", "j")
    val got = Graph.labelPropagation(twoCliques)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))

    // K4 {10..13} + pendant node 1 on 10: the min label 1 invades 10
    // in round 1, but the K4's label frequency expels it in round 2
    // and the pendant keeps its own label (hand-walked sequence)
    val k4 = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L), (1L, 10L)).toDF("i", "j")
    val got2 = Graph.labelPropagation(k4)
      .as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 1L, 10L -> 10L, 11L -> 10L,
      12L -> 10L, 13L -> 10L))

    // lone edge: self-inclusion kills the sync-LPA two-cycle — both
    // endpoints settle on the min instead of swapping forever
    val edge = Seq((5L, 7L)).toDF("i", "j")
    assert(Graph.labelPropagation(edge).as[(Long, Long)]
      .collect().toMap === Map(5L -> 5L, 7L -> 5L))

    // partition invariance
    val a = Graph.labelPropagation(k4.repartition(5))
      .as[(Long, Long)].collect().toMap
    assert(a === got2)
  }

  test("kcore: pendant and under-k triangle peel away; fixpoint stable") {
    // K4 {10..13} (3-core) + triangle {20..22} (only a 2-core) +
    // pendant 1-10: round 1 drops 1 and the whole triangle, K4 stays
    val e = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L),
      (20L, 21L), (20L, 22L), (21L, 22L),
      (1L, 10L)).toDF("i", "j")
    val got = Graph.kCore(e, k = 3L).as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 3L, 11L -> 3L, 12L -> 3L, 13L -> 3L))
    // a fixpoint reached inside the bound survives extra rounds
    val more = Graph.kCore(e, k = 3L, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(more === got)
    // k=2 (the registered knob) keeps every cycle: triangle + K4
    val two = Graph.kCore(e, k = 2L).as[(Long, Long)].collect().toMap
    assert(two.keySet === Set(10L, 11L, 12L, 13L, 20L, 21L, 22L))
    assert(two(20L) === 2L)
    // partition invariance
    assert(Graph.kCore(e.repartition(5), k = 3L).as[(Long, Long)]
      .collect().toMap === got)
  }

  test("ppr: mass localizes at the seed, never reaches other components") {
    // star 0-{1..4} plus a DISJOINT edge {10,11}: with one seed (hub
    // 0), the walk can only reach the star — the other component gets
    // NO rows (the sparse-vector property global pagerank lacks)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (10L, 11L))
      .toDF("i", "j")
    val r = Graph.personalizedPagerank(edges, nSeeds = 1)
      .as[(Long, Long)].collect().toMap
    assert(!r.contains(10L) && !r.contains(11L))
    // seed holds the bulk; symmetric spokes tie exactly
    assert(r(0L) > r(1L))
    assert(Seq(2L, 3L, 4L).forall(k => r(k) == r(1L)))
    // all restart mass returns to the seed: total stays near Scale
    // within integer-division loss
    val total = r.values.sum
    assert(total <= Graph.Scale &&
      total > GraphSpecUtil.massLowerBound(Graph.Scale, 5, Graph.PprIters))
    // partition invariance
    val r2 = Graph.personalizedPagerank(edges.repartition(4), nSeeds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r2 === r)
  }

  test("ppr: multi-seed teleport splits restart mass across seeds") {
    // two disjoint stars: hubs 0 (deg 3) and 100 (deg 2); nSeeds=2
    // seeds both hubs, each component keeps its own walk
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (100L, 101L), (100L, 102L)).toDF("i", "j")
    val r = Graph.personalizedPagerank(edges, nSeeds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet === Set(0L, 1L, 2L, 3L, 100L, 101L, 102L))
    assert(r(0L) > r(1L) && r(100L) > r(101L))
    assert(r(101L) == r(102L)) // symmetric spokes tie
  }

  test("hits: authorities rank by curated in-links, hubs by coverage") {
    // u1 buys items 10+11, u2/u3 buy 10 only: item 10 is the
    // authority, u1 the hub (only user touching both items)
    val inter = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 10L))
      .toDF("user_id", "item_id")
    val r = Graph.hits(inter)
      .as[(String, Long, Long)].collect()
      .map { case (t, i, v) => (t, i) -> v }.toMap
    assert(r(("item", 10L)) > r(("item", 11L)))
    assert(r(("user", 1L)) > r(("user", 2L)))
    assert(r(("user", 2L)) == r(("user", 3L))) // symmetric users tie
    // each side renormalizes to HitsScale up to integer-division loss
    val aTot = Seq(10L, 11L).map(i => r(("item", i))).sum
    val hTot = Seq(1L, 2L, 3L).map(u => r(("user", u))).sum
    assert(aTot <= Graph.HitsScale && aTot > Graph.HitsScale - 10L)
    assert(hTot <= Graph.HitsScale && hTot > Graph.HitsScale - 10L)
    // partition invariance
    val r2 = Graph.hits(inter.repartition(3))
      .as[(String, Long, Long)].collect()
      .map { case (t, i, v) => (t, i) -> v }.toMap
    assert(r2 === r)
  }

  test("modularity: hand-computed values on planted labelings") {
    // two disjoint triangles, each its own community: m=6, every edge
    // within, d_c=6 each -> Q = (4*6*6 - 72)/(4*36) = 0.5 exactly
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("i", "j")
    val labTwo = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L)).toDF("item_id", "community")
    val q2 = Graph.modularityOf(twoTri, labTwo)
      .as[(Long, Long, Long)].head()
    assert(q2 === ((6L, 2L, 500000L)))
    // one community holding everything scores exactly 0
    val labOne = Seq(1L, 2L, 3L, 10L, 11L, 12L)
      .map(v => (v, 0L)).toDF("item_id", "community")
    assert(Graph.modularityOf(twoTri, labOne)
      .as[(Long, Long, Long)].head() === ((6L, 1L, 0L)))
    // a worse-than-random labeling goes NEGATIVE and floors the same
    // on any partitioning (the offset-then-divide device): split each
    // triangle across communities so no edge is internal
    val labBad = Seq((1L, 1L), (2L, 2L), (3L, 3L),
      (10L, 1L), (11L, 2L), (12L, 3L)).toDF("item_id", "community")
    val qb = Graph.modularityOf(twoTri, labBad)
      .as[(Long, Long, Long)].head()
    assert(qb._3 < 0L)
    val qb2 = Graph.modularityOf(twoTri.repartition(5),
      labBad.repartition(3)).as[(Long, Long, Long)].head()
    assert(qb2 === qb)
  }

  test("modularity: past the old int64 bound (>1.07e6 edges) the " +
    "decimal route stays exact — closed-form ring value") {
    // ring of n = 1.5e6 nodes (m = n edges), communities = adjacent
    // pairs {2k, 2k+1}: e_c totals n/2, every degree is 2, d_c = 4,
    // sd2 = 8n -> Q = 1/2 - 2/n exactly. The retired int64 numerator
    // (6n² - 8n)·10⁶ ≈ 1.35e19 would WRAP past Long.MaxValue
    // (9.22e18) and emit garbage silently; the DECIMAL(38) route
    // must return floor((0.5 - 2/n)·10⁶) = 499998.
    val n = 1500000L
    val ring = spark.range(n - 1)
      .select(col("id").as("i"), (col("id") + 1L).as("j"))
      .unionByName(Seq((0L, n - 1)).toDF("i", "j"))
    val labs = spark.range(n)
      .select(col("id").as("item_id"), expr("id div 2").as("community"))
    val q = Graph.modularityOf(ring, labs)
      .as[(Long, Long, Long)].head()
    assert(q === ((n, n / 2, 499998L)))
  }

  test("adamic-adar: niche shared neighbor outweighs a hub at equal overlap") {
    // pair (1,2) shares only center 10 (deg 2); pair (3,4) shares
    // only center 20 (deg 4): same n_common, but AA discounts the
    // hub — w(10) = 1e12 div round(ln2*1e6) > w(20) = 1e12 div
    // round(ln4*1e6)
    val edges = Seq((1L, 10L), (2L, 10L),
      (3L, 20L), (4L, 20L), (20L, 21L), (20L, 22L)).toDF("i", "j")
    val got = Graph.adamicAdar(edges)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val w2 = 1000000000000L / math.round(math.log(2.0) * 1e6)
    val w4 = 1000000000000L / math.round(math.log(4.0) * 1e6)
    assert(got((1L, 2L)) === ((1L, w2)))
    assert(got((3L, 4L)) === ((1L, w4)))
    assert(w2 > w4)
    // adjacent pairs never emit: (20,21) shares nothing non-adjacent
    assert(!got.contains((20L, 21L)))
    // partition invariance
    val got2 = Graph.adamicAdar(edges.repartition(5))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got2 === got)
  }

  test("iteration is a fixpoint map: rank vector is deterministic") {
    val a = Graph.pagerankFrom(starInter, iters = 4)
      .orderBy("node_type", "id").as[(String, Long, Long)].collect().toSeq
    val b = Graph.pagerankFrom(starInter.repartition(3), iters = 4)
      .orderBy("node_type", "id").as[(String, Long, Long)].collect().toSeq
    assert(a == b) // partitioning must not change a single unit
  }
}

private object GraphSpecUtil {
  /** Loose lower bound on conserved mass: per round each of n nodes
    * floors twice (contribution div, damping div) plus the teleport
    * floor — bound the loss generously at 200 units per node-round.
    */
  def massLowerBound(scale: Long, n: Long, rounds: Int): Long =
    scale - 200L * n * rounds - n
}

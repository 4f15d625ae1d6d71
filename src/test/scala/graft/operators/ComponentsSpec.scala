package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected components on shapes that exercise propagation, not just
  * 1-hop grouping: chains (label must travel the diameter), cliques,
  * isolated edges, and a cross-check against brute-force closure. */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  test("chain + clique + pair resolve to min-id components") {
    // chain 1-2-3-4-5 (diameter 4: min label must propagate 4 hops),
    // clique {10,11,12}, pair {20,21}
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(Seq(20L, 21L).forall(got(_) == 20L))
    assert(got.size == 10)
  }

  test("keepers: one row per component with min id and size") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val comps = Components.connectedComponents(edges, "a", "b")
    val k = Components.keepers(comps)
      .select("keeper_id", "cluster_size")
      .as[(Long, Long)].collect().toMap
    assert(k == Map(1L -> 3L, 7L -> 2L))
  }

  test("agrees with brute-force transitive closure on a random-ish graph") {
    // deterministic pseudo-random sparse graph over 60 nodes
    val edges = (0 until 80).map { i =>
      val a = (i * 37 + 11) % 60
      val b = (i * 53 + 29) % 60
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }.toDF("a", "b")
    val got = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    // brute force on the driver (fine at 60 nodes)
    val es = edges.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    // union-find roots are min ids here because we always point max → min
    assert(got == want)
  }

  test("throws instead of returning partially-merged labels at maxIter") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      // localEdgeLimit = 0 forces the distributed loop (the local path
      // needs no rounds, so maxIter can't bind it)
      Components.connectedComponents(edges, "a", "b", maxIter = 0,
        localEdgeLimit = 0L)
    }
    assert(e.getMessage.contains("edges remain"))
  }

  test("distributed loop (localEdgeLimit = 0) matches the local fast path") {
    val edges = (0 until 120).map { i =>
      val a = (i * 41 + 7) % 90
      val b = (i * 67 + 31) % 90
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }.toDF("a", "b")
    val localP = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val distP = Components.connectedComponents(edges, "a", "b",
        localEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(localP == distP)
    // chain + clique + pair through the distributed loop specifically
    val shaped = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)).toDF("a", "b")
    val got = Components.connectedComponents(shaped, "a", "b",
        localEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(Seq(20L, 21L).forall(got(_) == 20L))
  }

  /** Both edge directions of an undirected edge list. */
  private def und(edges: Seq[(Long, Long)]) =
    (edges ++ edges.map(_.swap)).toDF("src", "dst")

  test("pageRank: regular graphs stay uniform, mass is conserved") {
    // undirected triangle: every node symmetric → rank stays 1/3 forever
    val ranks = Components.pageRank(und(Seq((1L, 2L), (2L, 3L), (1L, 3L))),
      "src", "dst", iters = 5).as[(Long, Double)].collect().toMap
    assert(ranks.size == 3)
    ranks.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-12))
    // no dangling nodes (undirected) → total mass 1 at every iteration
    assert(math.abs(ranks.values.sum - 1.0) < 1e-12)
  }

  test("pageRank: star center outranks leaves; path center outranks ends") {
    val star = Components.pageRank(und(Seq((0L, 1L), (0L, 2L), (0L, 3L))),
      "src", "dst", iters = 5).as[(Long, Double)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(l => star(0L) > star(l)))
    assert(math.abs(star(1L) - star(2L)) < 1e-12) // leaves symmetric
    assert(math.abs(star.values.sum - 1.0) < 1e-12)
    val path = Components.pageRank(und(Seq((10L, 11L), (11L, 12L))),
      "src", "dst", iters = 5).as[(Long, Double)].collect().toMap
    assert(path(11L) > path(10L) && math.abs(path(10L) - path(12L)) < 1e-12)
  }

  test("pageRank matches a driver-side reference on a random-ish graph") {
    val raw = (0 until 40).map { i =>
      ((i * 37 + 11) % 25L, (i * 53 + 29) % 25L)
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val got = Components.pageRank(und(raw), "src", "dst", iters = 4)
      .as[(Long, Double)].collect().toMap
    // reference: same recurrence, dense driver-side arithmetic
    val sym = (raw ++ raw.map(_.swap)).distinct
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outdeg = sym.groupBy(_._1).map { case (k, v) => k -> v.size }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 4) {
      val in = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) / outdeg(u) }.sum
      }
      rank = nodes.map(v => v -> ((1.0 - 0.85) / n + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    assert(got.keySet == rank.keySet)
    nodes.foreach(v => assert(math.abs(got(v) - rank(v)) < 1e-9,
      s"node $v: got ${got(v)}, want ${rank(v)}"))
  }

  test("keepersByScore: argmax-score keeper per cluster, ties fall to min id") {
    import spark.implicits._
    // cluster 1 = {1,2,3} (scores 0.2, 0.9, 0.5 -> keeper 2)
    // cluster 10 = {10,11} (tied scores -> keeper 10)
    val membership = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (10L, 0.7), (11L, 0.7))
      .toDF("id", "score")
    val out = Components.keepersByScore(membership, scores)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val keepers = out.filter(_._4).map(t => t._2 -> t._1).toMap
    assert(keepers == Map(1L -> 2L, 10L -> 10L))
    // exactly one keeper per component, every member gets a verdict
    assert(out.length == 5)
    assert(out.count(_._4) == 2)
  }

  test("componentSplit: near-dup pairs never straddle a split; singletons split per-doc") {
    import spark.implicits._
    val all = (1L to 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val out = Components.componentSplit(all, "id", edges, "a", "b",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 20)
    val byId = out.map(t => t._1 -> t._3).toMap
    // the leakage guarantee: every edge's endpoints share a split
    Seq((1L, 2L), (2L, 3L), (7L, 8L)).foreach { case (a, b) =>
      assert(byId(a) == byId(b), s"pair ($a,$b) straddles ${byId(a)}/${byId(b)}")
    }
    // cluster members carry the min-id component; singletons are their own
    val comp = out.map(t => t._1 -> t._2).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L && comp(8L) == 7L)
    assert(comp(12L) == 12L)
    // a singleton's split equals plain splitByHash on its own id (composability)
    val plain = graft.operators.ScaleOps.splitByHash(
      Seq(12L).toDF("component"), "component", "split",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .head().getString(1)
    assert(byId(12L) == plain)
  }

  test("kCore: clique survives, tails and cycles peel by k") {
    // K4 {1,2,3,4} (deg 3 each) + tail 4-5-6 + C4 cycle {10..13} (deg 2)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)).toDF("a", "b")
    val core3 = Components.kCore(edges, "a", "b", k = 3)
      .as[(Long, Long)].collect().toMap
    // only the clique survives k=3, each at its internal degree 3 (the
    // tail edge 4-5 is gone, so node 4's degree drops back to 3)
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val core2 = Components.kCore(edges, "a", "b", k = 2)
      .as[(Long, Long)].collect().toMap
    // k=2 keeps the clique AND the cycle; the tail (deg 1 endpoints
    // cascade) still peels — node 4 keeps deg 3, cycle nodes deg 2
    assert(core2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 2L, 11L -> 2L, 12L -> 2L, 13L -> 2L))
  }

  test("kCore: a path cascades to empty over multiple peel rounds") {
    // path 1-2-3-4-5 for k=2: endpoints peel, new endpoints peel, empty —
    // a 3-round cascade, so this exercises the loop, not just one filter
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(Components.kCore(path, "a", "b", k = 2).count() == 0L)
  }

  test("kCore matches a driver-side peel on a random-ish graph, " +
      "including noise canonicalization") {
    // deterministic pseudo-random multigraph with dup/reversed/self edges
    val raw = (0 until 150).map { i =>
      val a = (i * 53 + 7) % 40
      val b = (i * 29 + 13) % 40
      (a.toLong, b.toLong)
    }
    val got = Components.kCore(raw.toDF("a", "b"), "a", "b", k = 3)
      .as[(Long, Long)].collect().toMap
    // reference peel: same canonicalization, loop to fixpoint (the spec's
    // graphs converge well inside the operator's 6-round cap)
    var es = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != es.size
      es = next
    }
    val want = es.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      .filter(_._2 >= 3)
    assert(got == want)
  }

  test("connectedComponentsIncremental ≡ full recompute on arbitrary splits") {
    // the same pseudo-random graph as the closure test, split 3 ways
    val all = (0 until 80).map { i =>
      ((i * 37 + 11) % 60L, (i * 53 + 29) % 60L)
    }.filter { case (a, b) => a != b }
    for (mod <- Seq(2, 3, 5)) {
      val old = all.filter { case (a, b) => (a + b) % mod != 0 }.toDF("a", "b")
      val batch = all.filter { case (a, b) => (a + b) % mod == 0 }.toDF("a", "b")
      val standing = Components.connectedComponents(old, "a", "b")
      val inc = Components.connectedComponentsIncremental(
          standing, batch, "a", "b")
        .as[(Long, Long)].collect().toMap
      val full = Components.connectedComponents(all.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      graft.core.CacheScope.drain()
      assert(inc == full, s"split mod $mod")
    }
  }

  test("connectedComponentsIncremental: merge, pass-through, fresh nodes") {
    // standing: {1,2,3} comp 1, {10,11} comp 10, {20,21} comp 20
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("a", "b")
    val standing = Components.connectedComponents(old, "a", "b")
    // batch: bridge 3-10 (merges comps 1 and 10), fresh pair 30-31;
    // comp 20 untouched
    val batch = Seq((3L, 10L), (30L, 31L)).toDF("a", "b")
    val got = Components.connectedComponentsIncremental(
        standing, batch, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 10L, 11L).forall(got(_) == 1L)) // merged to min
    assert(got(20L) == 20L && got(21L) == 20L)             // untouched
    assert(got(30L) == 30L && got(31L) == 30L)             // fresh
    assert(got.size == 9)
  }

  test("labelPropagation: bridged triangles stay two communities where CC merges them") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (3L, 10L)).toDF("a", "b")
    val lp = Components.labelPropagation(edges, "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    // hand-walked synchronous rounds: left triangle converges to 1, right
    // to 3 (the bridge carries label 3 into the right triangle at round 2)
    assert(Seq(1L, 2L, 3L).forall(lp(_) == 1L), lp)
    assert(Seq(10L, 11L, 12L).forall(lp(_) == 3L), lp)
    // the same graph is ONE connected component — density vs connectivity
    val cc = Components.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1)
  }

  test("linkPrediction: square graph scores both diagonals, nothing else") {
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) share two neighbors each;
    // every adjacent pair is excluded
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = Components.linkPrediction(edges, "a", "b", topK = 10)
      .select("u", "v", "cn", "deg_u", "deg_v")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 2L, 2L, 2L), (2L, 4L, 2L, 2L, 2L)))
  }

  test("linkPrediction: adjacent pairs never surface even with shared neighbors") {
    // triangle: every pair shares a neighbor but all are adjacent
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Components.linkPrediction(tri, "a", "b").count() == 0L)
  }

  test("linkPrediction: hub cull silences over-cap wedge centers") {
    // star center 100 over spokes 1..5: every spoke pair is a candidate
    // through the center — unless the center's degree exceeds the cap
    val star = (1L to 5L).map(s => (100L, s)).toDF("a", "b")
    assert(Components.linkPrediction(star, "a", "b",
      maxCenterDegree = 5).count() == 10L) // C(5,2)
    assert(Components.linkPrediction(star, "a", "b",
      maxCenterDegree = 4).count() == 0L)
    // true degrees are reported cull-independent
    val row = Components.linkPrediction(star, "a", "b", maxCenterDegree = 5)
      .where(col("u") === 1L && col("v") === 2L).head
    assert(row.getLong(3) == 1L && row.getLong(4) == 1L)
  }

  test("linkPrediction: rank order is (cn desc, u, v) with exact top-k cut") {
    // path 1-2-3-4-5: (1,3),(2,4),(3,5) each cn=1; square 10-11-12-13 adds
    // two cn=2 diagonals that must rank first
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ++
      Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))).toDF("a", "b")
    val got = Components.linkPrediction(edges, "a", "b", topK = 3)
      .orderBy("rnk").select("u", "v", "cn")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 12L, 2L), (11L, 13L, 2L), (1L, 3L, 1L)))
  }
}

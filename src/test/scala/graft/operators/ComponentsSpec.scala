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
      Components.connectedComponents(edges, "a", "b", maxIter = 0)
    }
    assert(e.getMessage.contains("edges remain"))
  }
}

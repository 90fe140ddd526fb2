package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Cluster

/** Connected-components clustering (Cluster.scala) vs a driver-side
  * union-find reference, across graph shapes that stress the algorithm
  * differently: long chains (pointer-doubling path), stars, disjoint
  * cliques, and random graphs. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  /** Driver union-find ground truth: map each node to min id of component. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Both execution tiers must produce the union-find ground truth: the
    * driver tier (default cap) and the distributed pointer-doubling loop
    * (cap 0 forces it). */
  private def check(edges: Seq[(Long, Long)]): Unit = {
    val pairs = edges.toDF("id_a", "id_b")
    val expect = ufComponents(edges)
    val driver = Cluster.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver === expect)
    val distributed = Cluster.connectedComponents(pairs, driverEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed === expect)
  }

  test("chain graph (worst case for plain label propagation)") {
    check((1L until 64L).map(i => (i, i + 1)))
  }

  test("chain given in descending order") {
    check((1L until 64L).map(i => (i + 1, i)).reverse)
  }

  test("star + disjoint cliques + isolated pair") {
    val star = (2L to 20L).map(i => (1L, i))
    val clique = for (a <- 30L to 35L; b <- (a + 1) to 35L) yield (a, b)
    check(star ++ clique ++ Seq((100L, 101L)))
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      check(edges)
    }
  }

  test("assign reports component sizes; survivors keep reps and singletons") {
    // components {1,2,3} and {10,11}; doc 5 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val assigned = Cluster.assign(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(assigned.toSet === Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
    val docs = Seq(1L, 2L, 3L, 5L, 10L, 11L).toDF("doc_id")
    val kept = Cluster.survivors(docs, pairs).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 5L, 10L))
  }

  test("survivorsBy keeps the highest-quality member per cluster, min id on ties") {
    // components {1,2,3} (best score: 2) and {10,11} (tied → lowest id 10);
    // doc 5 is a singleton and always survives
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 5L, 10L, 11L).toDF("doc_id")
    val quality = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (5L, 0.1),
      (10L, 0.7), (11L, 0.7)).toDF("doc_id", "score")
    val kept = Cluster.survivorsBy(docs, pairs, quality)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 5L, 10L))
  }
}

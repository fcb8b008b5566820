package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.CurationOps

/** Connected-components property: the distributed min-label propagation
  * must agree with a sequential union-find on arbitrary graphs —
  * including disconnected nodes, self-loops, duplicate and reversed
  * edges, and long chains (the diameter stressor for the iteration
  * bound). Sampled under fixed seeds (offline cache has no scalatest
  * bridge).
  */
class ConnectedComponentsPropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private val nNodes = 24
  private val edgeGen = for {
    a <- Gen.choose(0L, nNodes - 1L)
    b <- Gen.choose(0L, nNodes - 1L)
  } yield (a, b)
  private val graphGen = Gen.choose(0, 40)
    .flatMap(n => Gen.listOfN(n, edgeGen))

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(nNodes)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min member id of the set
    (0 until nNodes).map(v => v.toLong -> find(v).toLong).toMap
  }

  test("min-label propagation equals union-find on random graphs") {
    val nodes = (0L until nNodes).toDF("v")
    (1L to 12L).foreach { seed =>
      val edges = sample(graphGen, seed)
      val edf = edges.toDF("a", "b")
      val got = CurationOps.connectedComponents(nodes, edf)
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(edges), s"seed=$seed edges=$edges")
    }
  }

  test("a long chain converges within the iteration bound") {
    val n = 20L
    val nodes = (0L until n).toDF("v")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val got = CurationOps.connectedComponents(nodes, chain)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
  }
}

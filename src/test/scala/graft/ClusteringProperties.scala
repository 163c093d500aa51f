package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** Property suite for the min-label connected-components core: the
  * driver union-find fast path must agree with an independent
  * BFS-reachability reference on arbitrary pair graphs — self-loops,
  * chains, stars, and disconnected unions included. (The distributed
  * loop's equivalence to the fast path on real corpus data is pinned
  * separately in PipelineSpec.) */
object ClusteringProperties extends Properties("clustering") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private def spark = SparkTestSession.spark

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 25).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 15L)
        b <- Gen.chooseNum(0L, 15L)
      } yield (a, b))
    }

  /** Independent reference: BFS over the undirected adjacency, label =
    * min node id of the reachable set. */
  private def bfsLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
    }
    adj.keys.map { start =>
      val seen = scala.collection.mutable.Set(start)
      val queue = scala.collection.mutable.Queue(start)
      while (queue.nonEmpty) {
        adj(queue.dequeue()).foreach(n =>
          if (seen.add(n)) queue.enqueue(n))
      }
      start -> seen.min
    }.toMap
  }

  property("union-find fast path == BFS min-reachable reference") =
    forAll(genEdges) { edges =>
      val s = spark
      import s.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = Dedup.minLabelComponents(pairs, "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == bfsLabels(edges)
    }

  property("distributed propagation loop == BFS min-reachable reference") =
    forAll(genEdges) { edges =>
      val s = spark
      import s.implicits._
      val pairs = edges.toDF("doc_a", "doc_b")
      // an explicit round bound routes PAST the size-gated union-find
      // fast path into the distributed propagation loop (the path a
      // >10⁶-edge graph takes at scale); 64 rounds dwarfs any 16-node
      // graph's diameter, so the loop reaches its fixpoint and must
      // agree with the same reference as the fast path
      val got = Dedup.minLabelComponents(pairs, "doc_a", "doc_b",
          maxIter = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == bfsLabels(edges)
    }
}

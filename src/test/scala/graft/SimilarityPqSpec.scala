package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

/** PQ tier contracts on a corpus built to make every quantity EXACT:
  * integer-valued vectors keep all squared-distance arithmetic inside
  * double-exact integers, so reconstruction error and both recall
  * columns have provable expected values (the int8 lattice-recovery
  * discipline applied to the codebook quantizer). */
class SimilarityPqSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark

  /** Exactly PqC distinct integer-valued vectors: with corpus ==
    * codebook, every vector IS its assigned centroid per subspace. */
  private def lattice(): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    val rows = (0 until Similarity.PqC).map { p =>
      (p.toLong,
        Array.tabulate(64)(j => ((p * 31 + j * 17) % 13 - 6).toFloat),
        p.toLong % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("codebook corpus: PQ reconstructs exactly — zero error, recall 1") {
    val emb = lattice()
    val err = Similarity.pqErrorProfile(emb).collect()
    assert(err.nonEmpty)
    err.foreach { r =>
      assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0,
        s"codebook vector did not reconstruct exactly: $r")
    }
    // every vector queries (mod 1); ADC distance == exact L2 on
    // integer-valued vectors, so both recall columns are exactly 1
    val rec = Similarity.pqRecallAudit(emb, 5, 1L).collect()
    assert(rec.length == Similarity.PqC)
    rec.foreach { r =>
      assert(r.getDouble(2) == 1.0, s"ADC recall < 1 on codebook corpus: $r")
      assert(r.getDouble(4) == 1.0, s"rescored recall < 1: $r")
    }
  }

  test("rescored recall dominates the raw ADC floor on the driver corpus") {
    val emb = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val rows = Similarity.pqRecallAuditSized(emb, 5, 16L).collect()
    assert(rows.nonEmpty)
    // per query: the exact re-rank of a superset shortlist can only
    // keep or improve the raw top-k hits
    rows.foreach(r => assert(r.getLong(3) >= r.getLong(1),
      s"rescoring lost hits: $r"))
    // and the codebook requirement surfaces as a clear error
    val tiny = emb.where(org.apache.spark.sql.functions.col("vec_id") < 4)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqErrorProfile(tiny)
    }
    assert(e.getMessage.contains("codebook"))
  }

  test("composite probe: all-bucket radius on the lattice == exact cosine top-k") {
    // lattice: ADC == exact L2 (zero reconstruction error), and a
    // radius covering every bucket makes the coarse prune a no-op —
    // so the composite serving query must reproduce brute force
    val emb = lattice()
    val nBits = Similarity.oracleSizedNBits(Similarity.PqC.toLong, 125L)
    val got = Similarity.pqProbeTopK(emb, queryId = 0L, k = 5,
        radius = nBits)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSeq
    val exact = Similarity.cosineTopK(emb, 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == exact, s"composite != exact: $got vs $exact")
    // missing query id → empty, schema intact
    assert(Similarity.pqProbeTopK(emb, queryId = 999L).collect().isEmpty)
  }

  test("composite probe: gate-standard radius is a subset-correct ranking on the driver corpus") {
    val emb = graft.sources.Corpus.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val rows = Similarity.pqProbeTopK(emb).collect()
    assert(rows.nonEmpty)
    // ranks contiguous from 1, cosine non-increasing
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    val cs = rows.map(_.getDouble(3)).toSeq
    assert(cs == cs.sorted.reverse)
    // deterministic
    val again = Similarity.pqProbeTopK(emb).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}

package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.pipeline.{TextFunctions, Winnow}

/** Properties of the winnowing tier (q139–q142) over ARBITRARY docs
  * and parameters — the gates pin one (k, w) on the clean corpus;
  * these stress the algorithm itself: the detection guarantee for
  * random parameters, kernel parity under degenerate spacing, the
  * per-window coverage/density bounds, and prefix-stability (the
  * "local algorithm" contract: selections from existing windows
  * never change when a document grows). */
object WinnowProperties extends Properties("winnow") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // small vocabulary so natural cross-doc repeats occur
  private val tok: Gen[String] = Gen.choose(0, 49).map(i => s"t$i")
  private def toksOf(n: Int): Gen[List[String]] = Gen.listOfN(n, tok)

  private case class Case(k: Int, w: Int, preA: List[String],
                          postA: List[String], preB: List[String],
                          postB: List[String], run: List[String])

  private val guaranteeCase: Gen[Case] = for {
    k <- Gen.choose(2, 6)
    w <- Gen.choose(2, 5)
    run <- toksOf(w + k - 1) // the guarantee threshold t = w + k - 1
    na <- Gen.choose(0, 20); nb <- Gen.choose(0, 20)
    ma <- Gen.choose(0, 20); mb <- Gen.choose(0, 20)
    preA <- toksOf(na); postA <- toksOf(ma)
    preB <- toksOf(nb); postB <- toksOf(mb)
  } yield Case(k, w, preA, postA, preB, postB, run)

  property("guarantee: a shared run of w+k-1 tokens yields a shared fingerprint, any (k, w)") =
    forAll(guaranteeCase) { c =>
      val s = SparkTestSession.spark
      import s.implicits._
      val a = (c.preA ++ c.run ++ c.postA).mkString(" ")
      val b = (c.preB ++ c.run ++ c.postB).mkString(" ")
      val fps = Winnow.winnowedFingerprints(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"), c.k, c.w)
        .select("doc_id", "fp_hash").collect()
      val fa = fps.filter(_.getLong(0) == 1L).map(_.getLong(1)).toSet
      val fb = fps.filter(_.getLong(0) == 2L).map(_.getLong(1)).toSet
      (fa & fb).nonEmpty
    }

  // degenerate spacing: repeated separators make EMPTY tokens, which
  // must hash (and therefore winnow) identically through the native
  // kernel and the HOF spelling
  private val weirdDoc: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, Gen.oneOf(
      Gen.stringOfN(2, Gen.alphaNumChar), Gen.oneOf("", "é", "x!")))
    seps <- Gen.listOfN(n, Gen.oneOf(" ", "  "))
  } yield toks.zip(seps).map { case (t, sp) => t + sp }
    .mkString.stripSuffix(" ")

  property("posShingleHashes == HOF spelling on degenerate spacing and unicode") =
    forAll(Gen.choose(1, 5), Gen.listOfN(16, weirdDoc)) { (k, docs) =>
      val s = SparkTestSession.spark
      import s.implicits._
      val t = TextFunctions.tokens(col("text"))
      val hof = when(size(t) >= k,
        transform(sequence(lit(1), size(t) - (k - 1)),
          i => TextFunctions.hash64Sql(concat_ws(" ", slice(t, i, lit(k))), "wn")))
        .otherwise(array().cast("array<bigint>"))
      docs.toDF("text")
        .select(TextFunctions.posShingleHashes(col("text"), k, "wn").as("n"),
          hof.as("h"))
        .where(not(col("n") <=> col("h"))).count() == 0L
    }

  property("coverage: ceil(windows/w) <= fingerprints <= windows; positions in range") =
    forAll(Gen.choose(2, 5), Gen.choose(2, 4),
      Gen.choose(8, 40).flatMap(toksOf)) { (k, w, toks) =>
      val s = SparkTestSession.spark
      import s.implicits._
      val nGrams = math.max(0, toks.length - k + 1)
      val nWin = nGrams - w + 1
      val sel = Winnow.winnowedFingerprints(
          Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"), k, w)
        .select("fp_pos").collect().map(_.getLong(0))
      if (nWin <= 0) sel.isEmpty
      else sel.length <= nWin && sel.length >= (nWin + w - 1) / w &&
        sel.forall(p => p >= 0 && p < nGrams)
    }

  // random small-vocab corpora so cross-doc overlap actually occurs
  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(4, 8)
    docs <- Gen.listOfN(n, Gen.choose(10, 30).flatMap(toksOf))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }

  property("maxDf monotonicity: widening the evidence cap only adds pairs and evidence") =
    forAll(corpusGen) { corpus =>
      val s = SparkTestSession.spark
      import s.implicits._
      val df = corpus.toDF("doc_id", "text")
      def pairsAt(maxDf: Int): Map[(Long, Long), Long] =
        Winnow.winnowOverlapPairs(df, maxDf = maxDf, minShared = 1L)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val narrow = pairsAt(3); val wide = pairsAt(8)
      // every fp with df <= 3 also has df <= 8, so evidence only grows
      narrow.forall { case (pair, n) => wide.get(pair).exists(_ >= n) }
    }

  // winnow-APPLY corpus: random docs over the shared vocab plus a few
  // PLANTED copy pairs (append a common >= w+k-1 run to two docs) so
  // the component graph is routinely non-trivial; two sources
  private val applyCorpusGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(5, 10)
    docs <- Gen.listOfN(n, Gen.choose(10, 40).flatMap(toksOf))
    nPlant <- Gen.choose(0, 2)
    runs <- Gen.listOfN(nPlant, toksOf(12))
  } yield {
    val base = docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, if (i % 2 == 0) "sA" else "sB", t.mkString(" "))
    }
    // plant run j onto docs (2j, 2j+1) — deterministic targets
    runs.zipWithIndex.foldLeft(base) { case (acc, (run, j)) =>
      acc.map { case (id, src, t) =>
        if (id == 2L * j || id == 2L * j + 1)
          (id, src, t + " " + run.mkString(" "))
        else (id, src, t)
      }
    }
  }

  property("apply: digest partitions the corpus; dropped == flagged - components; minShared monotone") =
    forAll(applyCorpusGen) { corpus =>
      val s = SparkTestSession.spark
      import s.implicits._
      val df = corpus.toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")))
      val dig = Winnow.winnowDedupCorpus(df).collect()
      val partitionOk = dig.forall(r =>
        r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
          r.getAs[Long]("n_docs"))
      // independent component count over the same pair graph (tiny
      // union-find in the test — NOT the implementation's solver)
      val pairs = Winnow.winnowOverlapPairs(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nFlagged = parent.size.toLong
      val nComp = parent.keys.map(find).toSet.size.toLong
      val arithmeticOk =
        dig.map(_.getAs[Long]("n_flagged")).sum == nFlagged &&
          dig.map(_.getAs[Long]("n_dropped")).sum == nFlagged - nComp
      // a HIGHER evidence floor can only flag fewer docs, per source
      val loose = Winnow.winnowDedupCorpus(df, minShared = 1L).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("n_flagged")).toMap
      val monoOk = dig.forall(r =>
        r.getAs[Long]("n_flagged") <= loose(r.getString(0)))
      partitionOk && arithmeticOk && monoOk
    }

  property("per-row kernel: winnowFpStructs == winnowedFingerprints, any (k, w)") =
    forAll(Gen.choose(2, 6), Gen.choose(2, 5),
      Gen.choose(0, 40).flatMap(toksOf),
      Gen.choose(0, 40).flatMap(toksOf)) { (k, w, ta, tb) =>
      val s = SparkTestSession.spark
      import s.implicits._
      val df = Seq((1L, ta.mkString(" ")), (2L, tb.mkString(" ")))
        .toDF("doc_id", "text")
      val win = Winnow.winnowedFingerprints(df, k, w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val perRow = df.select(col("doc_id"),
          explode(Winnow.winnowFpStructs(col("text"), k, w)).as("f"))
        .select(col("doc_id"), col("f.fp_hash"), col("f.fp_pos"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      win == perRow
    }

  property("scrub: n_scrubbed == apply's n_dropped; kept text is an order-preserving subsequence; token accounting exact") =
    forAll(applyCorpusGen) { corpus =>
      val s = SparkTestSession.spark
      import s.implicits._
      val df = corpus.toDF("doc_id", "source", "text")
        .withColumn("n_chars", length(col("text")))
      val dig = Winnow.winnowScrubSpans(df).collect()
      // the scrub's loser set IS the apply's drop set (same CC +
      // keep-best policy) — only the remedy differs
      val dropped = Winnow.winnowDedupCorpus(df).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("n_dropped")).toMap
      val scrubEqDrop = dig.forall(r =>
        r.getAs[Long]("n_scrubbed") == dropped(r.getString(0)))
      val sc = Winnow.winnowScrubbedDocs(df).collect()
      val orig = corpus.map(c => (c._1, c._3)).toMap
      def isSubseq(xs: Seq[String], ys: Seq[String]): Boolean = {
        var i = 0
        ys.foreach { y => if (i < xs.size && xs(i) == y) i += 1 }
        i == xs.size
      }
      val subseqOk = sc.forall { r =>
        val o = orig(r.getLong(0)).split(" ", -1).toIndexedSeq
        val kt = r.getString(4)
        val kept = if (kt.isEmpty) IndexedSeq.empty[String]
          else kt.split(" ", -1).toIndexedSeq
        r.getAs[Long]("n_toks") == o.size &&
          r.getAs[Long]("n_kept") == kept.size &&
          kept.size < o.size && isSubseq(kept, o)
      }
      val accountingOk =
        dig.map(r => r.getAs[Long]("n_tokens_removed") +
          r.getAs[Long]("n_tokens_kept")).sum ==
          sc.map(_.getAs[Long]("n_toks")).sum
      scrubEqDrop && subseqOk && accountingOk
    }

  property("prefix-stability: growing a doc never un-selects an existing fingerprint") =
    forAll(Gen.choose(2, 5), Gen.choose(2, 4),
      Gen.choose(8, 30).flatMap(toksOf),
      Gen.choose(1, 15).flatMap(toksOf)) { (k, w, base, suffix) =>
      val s = SparkTestSession.spark
      import s.implicits._
      def fpsOf(text: String): Set[(Long, Long)] =
        Winnow.winnowedFingerprints(
            Seq((1L, text)).toDF("doc_id", "text"), k, w)
          .select("fp_hash", "fp_pos").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      // every window of the base doc exists unchanged in the grown
      // doc, so its selection survives — new windows only ADD
      fpsOf(base.mkString(" ")).subsetOf(
        fpsOf((base ++ suffix).mkString(" ")))
    }

  // span attribution (q150) must agree with the pair tier it
  // annotates: same flagged pairs, spans on BOTH sides of every pair,
  // and every emitted interval is a sane island (start <= end − (k−1),
  // 1-based contiguous span_idx per side, n_fps >= 1)
  private val spanCorpus: Gen[List[(Long, String)]] = for {
    nd <- Gen.choose(2, 7)
    docs <- Gen.listOfN(nd,
      Gen.choose(8, 50).flatMap(toksOf).map(_.mkString(" ")))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("spans: pair set == winnowOverlapPairs; both sides present; intervals sane") =
    forAll(spanCorpus) { docsList =>
      val s = SparkTestSession.spark
      import s.implicits._
      val df = docsList.toDF("doc_id", "text")
      val pairs = Winnow.winnowOverlapPairs(df, minShared = 1L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val spans = Winnow.winnowCopySpans(df, minShared = 1L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      val spanPairs = spans.map(sp => (sp._1, sp._2)).toSet
      val k = Winnow.WinnowK
      val sane = spans.forall { case (_, _, side, idx, st, en, n) =>
        (side == "a" || side == "b") && idx >= 1 && st >= 0 &&
          en >= st + (k - 1) && n >= 1
      }
      val idxContiguous = spans.groupBy(sp => (sp._1, sp._2, sp._3))
        .forall { case (_, g) =>
          g.map(_._4).sorted.toSeq == (1L to g.length.toLong) }
      val bothSides = pairs.forall(pr =>
        Seq("a", "b").forall(side => spans.exists(sp =>
          (sp._1, sp._2) == pr && sp._3 == side)))
      spanPairs == pairs && sane && idxContiguous && bothSides
    }
}

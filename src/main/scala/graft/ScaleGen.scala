package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1 scaling checkpoint (SCALE.md): the
  * driver ships sf{0.001,0.01,0.1}; this replicates sf0.1 `factor`
  * times (default 10 → "sf1": lineitem 6M, documents 50k) into a
  * repo-local directory, preserving each table's JOIN STRUCTURE and —
  * critically — its SIMILARITY STRUCTURE:
  *
  *  - fact/dim keys are offset per replica by (max key + 1) so join
  *    fan-outs and group cardinalities scale linearly, never ×factor²
  *    (orders↔lineitem, customer↔orders, events.user_id cohorts);
  *  - nation/region stay single-copy (the broadcast dims a bigger
  *    corpus still joins against), so q13/q87 group counts hold;
  *  - documents TEXT is bijectively token-renamed per replica (every
  *    token gets a replica suffix), which keeps every within-replica
  *    shingle/minhash/simhash relationship EXACTLY intact while
  *    making cross-replica Jaccard 0 — without this, each doc and its
  *    9 twins form near-dup cliques and the pair graph explodes
  *    quadratically instead of scaling like a real 10× corpus;
  *  - embeddings get a per-replica orthogonal transform — a dimension
  *    ROTATION for the first `dim` replicas, composed with a validated
  *    ±1 sign-flip pattern per further "sign round" (so factor may
  *    exceed the embedding dimension): every per-coordinate product is
  *    bit-preserved within a replica (float × ±1 is exact; rotation
  *    only permutes terms, so a fixed-order dot SUM can wiggle in the
  *    last ulp — true of rotation alone as well), cross-replica
  *    cosines decorrelate, for the same reason in ANN space.
  *
  * This is benchmark/scaling tooling, not a gate input — the
  * correctness oracle keeps running on the driver's own corpora. */
object ScaleGen {
  /** Token-rename separator: U+0001, outside any text corpus alphabet
    * (verified before use, see the documents guard below). */
  private val Sep = "\u0001"

  /** Per-sign-round ±1 patterns for embedding replication past the
    * dimension: round 0 is all-plus (replicas 0..dim-1 stay pure
    * rotations, byte-identical to historical output); each later round
    * is a seeded balanced pattern. Validated STRUCTURALLY — balance in
    * [dim/4, 3dim/4] and pairwise Hamming distance ≥ dim/4 — so no two
    * replicas can be near-identical, by construction rather than by
    * probability. Package-visible for the spec. */
  private[graft] def signPatternsFor(dim: Int, factor: Int): Array[Array[Float]] = {
    val rounds = (factor + dim - 1) / dim
    val patterns = Array.tabulate(rounds) { m =>
      if (m == 0) Array.fill(dim)(1f)
      else {
        val rnd = new java.util.Random(0x5CA1E000L + m)
        Array.fill(dim)(if (rnd.nextBoolean()) -1f else 1f)
      }
    }
    patterns.zipWithIndex.drop(1).foreach { case (p, m) =>
      val flips = p.count(_ < 0)
      require(flips >= dim / 4 && flips <= 3 * dim / 4,
        s"sign round $m unbalanced: $flips/$dim flips")
    }
    for (a <- patterns.indices; b <- (a + 1) until patterns.length) {
      val diff = (0 until dim)
        .count(k => patterns(a)(k) != patterns(b)(k))
      require(diff >= dim / 4,
        s"sign rounds $a/$b too close: differ in $diff/$dim positions")
    }
    require(factor <= dim * rounds, "sign-round arithmetic broken")
    patterns
  }

  /** The replica-i orthogonal transform over an array&lt;float&gt;
    * embedding column: rotation by (i % dim) composed with the sign
    * round (i / dim) pattern. Package-visible for the spec. */
  private[graft] def replicaTransform(e: org.apache.spark.sql.Column,
      dim: Int, patterns: Array[Array[Float]], i: Int)
      : org.apache.spark.sql.Column = {
    val rot = i % dim
    val rotated = if (rot == 0) e
      else concat(slice(e, rot + 1, dim - rot), slice(e, 1, rot))
    if (i / dim == 0) rotated else {
      val signLit = array(patterns(i / dim).toIndexedSeq.map(lit): _*)
      // float × ±1f is exact; element_at is 1-based
      transform(rotated, (x, k) => x * element_at(signLit, k + 1))
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts round-trips as the raw nanos LONG — Corpus.table does
      // the timestamp conversion at read time either way
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      System.err.println(s"[scalegen] $t done")
    }
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // Validate EVERY precondition before the first write: a failed
    // require mid-run would leave a partially-scaled, internally
    // inconsistent corpus on disk (round-10 review).
    val embDim = read("embeddings").select(size(col("embedding")))
      .head().getInt(0)
    // Replicas 0..dim-1 use pure rotations (byte-identical to the
    // historical sf1/sf3 output). Past dim, each "sign round"
    // m = i/dim composes the rotation with a per-round ±1 pattern —
    // still orthogonal (and EXACT in float: (-u)·(-v) == u·v bit for
    // bit), so within-replica cosines stay bit-preserved while
    // cross-round same-rotation pairs decorrelate. Patterns are
    // validated structurally in signPatternsFor (balance + pairwise
    // distance), not trusted probabilistically — validated HERE, up
    // front, before the first write.
    val signPatterns = signPatternsFor(embDim, factor)

    // single-copy dims: nation/region bound group cardinalities;
    // part/supplier are unreferenced by the query surface but copied
    // for corpus completeness
    Seq("region", "nation", "part", "supplier").foreach(t => write(t, read(t)))

    def replicated(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(base, i)).reduce(_ unionAll _)

    val cust = read("customer")
    val custOff = off(cust, "c_custkey")
    write("customer", replicated(cust) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * custOff))
    })

    val ords = read("orders")
    val ordOff = off(ords, "o_orderkey")
    write("orders", replicated(ords) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordOff))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custOff))
    })

    val li = read("lineitem")
    write("lineitem", replicated(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordOff))
    })

    val ev = read("events")
    val evOff = off(ev, "event_id")
    val userOff = off(ev, "user_id")
    write("events", replicated(ev) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * evOff))
        .withColumn("user_id", col("user_id") + lit(i * userOff))
    })

    val docs = read("documents")
    val docOff = off(docs, "doc_id")
    // The rename suffix must be UNREACHABLE from the source alphabet or
    // the map is not strictly bijective: with a plain "_rN" suffix, a
    // replica-0 token that already ends in "_r1" collides with replica
    // 1's rename of its stem (ADVICE r10). U+0001 is a control char no
    // text corpus contains — VERIFIED here rather than assumed, so the
    // disjointness invariant is unconditional, not a precondition.
    require(docs.where(col("text").contains(Sep)).limit(1).count() == 0L,
      "source corpus contains \\u0001 — rename suffix would not be bijective")
    write("documents", replicated(docs) { (d, i) =>
      // bijective token rename: suffix every maximal non-space run.
      // "[^ ]+" mirrors the tokenizer exactly (split on single ' ',
      // limit -1: tabs are token chars, empty tokens stay empty), and
      // whitespace is left byte-identical — so every within-replica
      // token/shingle/minhash relationship of replica 0 is preserved
      // under a bijection, while cross-replica token sets are
      // disjoint under the verified-absent U+0001 separator. (An
      // earlier spelling prefixed only the FIRST token and collapsed
      // \s+ runs, which broke both properties — caught in round-10
      // review.)
      val t = if (i == 0) col("text")
        else regexp_replace(col("text"), "([^ ]+)", s"$$1${Sep}r$i")
      d.withColumn("doc_id", col("doc_id") + lit(i * docOff))
        .withColumn("text", t)
    })

    val emb = read("embeddings")
    val vecOff = off(emb, "vec_id")
    // replica i = rotation (i % dim) composed with sign round (i / dim)
    // — distinct (rot, round) pairs by construction, and the sign
    // patterns were validated pairwise-distant up front, so no two
    // replicas can share a transform (the exact-duplicate clique
    // explosion this tool exists to prevent)
    val dim = embDim
    write("embeddings", replicated(emb) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * vecOff))
        .withColumn("embedding",
          replicaTransform(col("embedding"), dim, signPatterns, i))
    })

    spark.stop()
  }
}

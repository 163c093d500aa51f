package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Corpus

/** Relational-closure queries (SURVEY §2.9 Q12–Q14): the minimal
  * scan/filter/aggregate/join/sort surface the reference's GRANT
  * statements presuppose (clickhouse_grants.py:296 — grants target real
  * `db.table` objects).
  *
  * Scale notes (100 TB stance):
  *  - Filters precede aggregation so they push into the parquet scan
  *    (verify `PushedFilters` in explain).
  *  - Aggregations are partial+final HashAggregate (map-side combine);
  *    grouping keys are low-cardinality → tiny shuffle.
  *  - Q13 joins a big fact (customer) to a 25-row dim (nation):
  *    broadcast, no shuffle of the fact side; top-k via orderBy+limit →
  *    TakeOrderedAndProject (per-partition top-k, no full sort).
  */
object RelationalOps {

  /** Money folds in DECIMAL, not DOUBLE — the sf1 oracle pass's
    * headline lesson. A parallel double sum is order-dependent: at 10×
    * rows the Spark partial-agg tree and DuckDB's scan-order fold
    * drifted past even round(…,4) on the revenue gates (q13/q32/q79
    * HASH_MISMATCH at sf1). Casting each term to a fixed-scale decimal
    * FIRST makes the fold exact and associative — any partitioning,
    * any engine, one answer, at any scale. Parity of the per-term
    * cast rests on both engines rounding half-away-from-zero (Spark
    * HALF_UP via the shortest-repr BigDecimal; DuckDB std::round) —
    * NOT on midpoints being unrepresentable: some doubles ARE exact
    * midpoints of the target scale (0.0078125 at scale 6, 0.03125 at
    * scale 4), and DuckDB additionally quantizes via a double multiply
    * by 10^scale, leaving a theoretical 1-ulp edge. If the scale or
    * either engine's rounding mode ever changes, re-verify this
    * half-up agreement — it is the real invariant.
    *
    * The r11 decimal fold (sum over Cast(c, Decimal(18, scale))) paid
    * ~1.6× on the sf0.1 revenue joins (q32 0.63→1.1 s): a
    * BigDecimal.valueOf (Double.toString + parse + alloc) and a
    * decimal buffer add per row. This is the designed escape hatch,
    * implemented (r12): `functions.MoneySum` quantizes each term to
    * an unscaled long (bit-identical to the decimal cast — exact-path
    * fallback near .5 boundaries), accumulates in 128-bit (hi, lo)
    * limbs with primitive codegen, and widens to Decimal(38, scale)
    * ONCE per group. Same exactness, same associativity, decimal cost
    * paid per GROUP instead of per row. Bit-parity with the decimal
    * fold is pinned by MoneySumProperties. */
  // private[graft]: the property suite folds both spellings and pins
  // them bit-equal — the decimal fold stays as the reference oracle
  private[graft] def money(c: Column, scale: Int): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(18, scale))

  /** The exact money fold: drop-in for `sum(money(c, scale))`. */
  private def moneySum(c: Column, scale: Int): Column =
    graft.functions.MoneySum.moneySum(c, scale)

  /** Q12 — pricing-summary style agg over lineitem. sum_qty stays a
    * double fold: l_quantity is whole units, so the sum is integer-
    * exact and order-free already. */
  def lineitemAgg(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.table(spark, sfDir, "lineitem")
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q13 — customer×nation join + grouped agg + top-k. */
  def topNationsByBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Corpus.table(spark, sfDir, "customer")
    val n = Corpus.table(spark, sfDir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("num_customers"),
        moneySum(col("c_acctbal"), 2).cast("double").as("total_bal"))
      .orderBy(col("total_bal").desc, col("n_name"))
      .limit(10)
  }

  /** Q14 — date-filtered agg over events. */
  def eventsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.table(spark, sfDir, "events")
      .where(col("ts") >= to_timestamp(lit("2024-01-01 00:00:00")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("value"), 6).cast("double").as("total"))
      .orderBy(col("event_type"))

  /** Q30 — window top-n per group: the per-partition rank pattern.
    * The window shuffles once on the partition key; ordering keys are
    * total (acctbal, custkey) so ranks are deterministic. */
  def topCustomersPerNation(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val c = Corpus.table(spark, sfDir, "customer")
    val nat = Corpus.table(spark, sfDir, "nation")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_name"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    c.join(broadcast(nat), c("c_nationkey") === nat("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= n)
      .orderBy(col("n_name"), col("rn"))
  }

  /** Q31 — ROLLUP over lineitem: subtotal + grand-total rows in one
    * pass (Catalyst expands to a single Expand + hash agg, not one
    * scan per grouping set). NULLS FIRST pinned explicitly — Spark and
    * DuckDB default to opposite null ordering. */
  def lineitemRollup(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.table(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Q34 — calendar bucketing over events: date_trunc to month,
    * rendered as a plain string so both engines hash identically. */
  def eventsMonthly(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.table(spark, sfDir, "events")
      .groupBy(date_format(date_trunc("month", col("ts")), "yyyy-MM").as("month"),
        col("event_type"))
      // avg over an EXACT decimal sum, divided once as a double: the
      // nondeterminism lives in the fold, not the final divide
      .agg(count(lit(1)).as("n"),
        round(moneySum(col("value"), 6).cast("double") / count(lit(1)), 6)
          .as("avg_value"))
      .orderBy("month", "event_type")

  /** Q40 — as-of join over events: each purchase matched to the user's
    * most recent prior-or-equal click (AsOfJoin scaladoc for semantics;
    * the right side is pre-deduped to one row per (user, ts) so the
    * match is deterministic). Oracle: DuckDB's native ASOF JOIN. */
  def purchaseAsofClick(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Corpus.table(spark, sfDir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("purchase_value"))
    val clickRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val clicks = ev.where(col("event_type") === "click")
      .withColumn("_rn", row_number().over(clickRank))
      .where(col("_rn") === 1)
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    AsOfJoin.asofJoin(purchases, clicks, "user_id", "ts", "click_ts")
      .orderBy("event_id")
  }

  /** Gate composition (q84): the q40 attribution join under a match-age
    * bound — a click older than `toleranceSeconds` no longer claims the
    * purchase (the row drops, inner semantics). Oracle = DuckDB ASOF
    * plus the same interval filter. */
  def purchaseAsofClickTolerance(spark: SparkSession, sfDir: String,
                                 toleranceSeconds: Long): DataFrame = {
    val ev = Corpus.table(spark, sfDir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("purchase_value"))
    val clickRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val clicks = ev.where(col("event_type") === "click")
      .withColumn("_rn", row_number().over(clickRank))
      .where(col("_rn") === 1)
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    AsOfJoin.asofJoinTolerance(purchases, clicks, "user_id", "ts",
        "click_ts", toleranceSeconds)
      .orderBy("event_id")
  }

  /** Q41 — batch gap sessionization over events: a session ends
    * `gapMinutes` after its last event. The classic two-window shape:
    * lag() flags session starts, a running sum numbers them, one
    * aggregate folds each session — BOTH windows and the final agg
    * share the user_id partitioning, so the whole query is ONE shuffle
    * (the second window and the agg reuse the first exchange). This is
    * also the batch oracle for the streaming sessionize
    * (StreamingPipeline) — equivalence is pinned in
    * StreamingPipelineSpec. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("user_id")).orderBy(col("ts"))
    val gap = expr(s"INTERVAL $gapMinutes MINUTES")
    events.select(col("user_id"), col("ts"), col("value"))
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      // interval comparison, not epoch subtraction: exact at any
      // timestamp precision in both engines
      .withColumn("_new", when(
        col("_prev").isNull || col("ts") > col("_prev") + gap, 1).otherwise(0))
      .withColumn("_sess", sum(col("_new")).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy(col("user_id"), col("_sess"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")
  }

  def sessionizeEvents(spark: SparkSession, sfDir: String,
                       gapMinutes: Int = 30): DataFrame =
    sessionizeBatch(Corpus.table(spark, sfDir, "events"), gapMinutes)

  /** Q47 — semi-structured extraction: pull a typed field out of the
    * `props` JSON column and aggregate on it. `get_json_object` is a
    * codegen'd path walk over the string — no UDF and no full
    * `from_json` struct materialization for a single field, so the
    * extraction stays inside the scan's whole-stage-codegen span and
    * the shuffle carries only (event_type, decile) partials. sum_k is
    * an exact integer aggregate; only avg(value) needs the cross-engine
    * round. At 100 TB the same plan holds: extraction is scan-local
    * CPU, the aggregate keys stay low-cardinality. */
  def eventsJsonProps(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.table(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      // FLOOR division, spelled integrally: Spark's `div` truncates
      // toward zero while the DuckDB oracle's `//` floors — they diverge
      // on negative k. (k - pmod(k,10)) is the largest multiple of 10
      // ≤ k, so the div is exact floor semantics at any magnitude (a
      // double floor(k/10) would lose exactness past 2^53).
      .groupBy(col("event_type"),
        expr("(k - pmod(k, 10)) div 10").as("k_decile"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        // decimal-exact fold, one final double divide (see `money`)
        round(moneySum(col("value"), 6).cast("double") / count(lit(1)), 6)
          .as("avg_value"))
      .orderBy("event_type", "k_decile")

  /** Q50 — time-series smoothing: daily totals with a 7-day moving
    * average per event type. The heavy reduction is the partial+final
    * daily aggregate (shuffle carries (type, day) partials only); the
    * moving-average window then runs over the AGGREGATED frame — at
    * most years×365 rows per event type — partitioned by event_type, so
    * no global single-partition window ever sees raw events. Day is
    * rendered as a yyyy-MM-dd string (lexicographic == chronological)
    * so both engines group and hash identically. */
  def eventsMovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Corpus.table(spark, sfDir, "events")
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("value")).as("_v"), count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    daily.select(col("event_type"), col("day"), col("n"),
        round(col("_v"), 6).as("day_total"),
        round(avg(col("_v")).over(w), 6).as("ma7"))
      .orderBy("event_type", "day")
  }

  /** Burst-day detection — the ingest-monitoring anomaly flag: a day
    * whose event count exceeds 1.25× the average of its trailing seven
    * OBSERVED days, with the comparison spelled in INTEGERS
    * (n·28 > 5·trailing_sum) so no float ever crosses engines —
    * variance/stddev-based z-scores are the textbook spelling but
    * cross-row float summation is order-dependent between engines and
    * would poison the gate hash (the float-parity policy).
    *
    * Frame semantics, precisely: ROWS BETWEEN 7 PRECEDING AND 1
    * PRECEDING over the daily aggregate — seven preceding OBSERVED
    * daily buckets, which equals seven calendar days only when the
    * type emits events every day (true of this corpus; the oracle
    * spells the identical frame). A calendar-gapped stream that wants
    * strict calendar semantics should use a date-RANGE frame or join
    * against a generated calendar so absent days contribute zeros.
    * Only days with a full 7-row history qualify (the window count
    * guards the ramp-up). One daily pre-aggregate (partial+final,
    * map-side combine) then a per-type window over the POST-AGG frame:
    * |types × days| rows — config-sized relative to the event stream,
    * so the window sort is never the bottleneck at any event volume. */
  def burstDays(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Corpus.table(spark, sfDir, "events")
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .select(col("event_type"), col("day"), col("n"),
        sum(col("n")).over(w).as("trail7"),
        count(col("n")).over(w).as("hist"))
      // 2x is the textbook alert dial, but the synthetic stream is
      // near-uniform (max observed 1.42x) — the gate pins the 1.25x
      // WARN tier; the rule is the same integer-exact comparison
      .where(col("hist") === 7 && col("n") * 28 > col("trail7") * 5)
      .select(col("event_type"), col("day"), col("n"), col("trail7"))
      .orderBy("event_type", "day")
  }

  /** Q51 — argMax: the per-user top event as ONE struct-max aggregate,
    * the ClickHouse argMax(arg, val) shape. The struct orders (value,
    * event_id, type) so ties on value break on event_id — a total
    * order, deterministic on both engines. Spark plans a struct-typed
    * max as SortAggregate (struct agg buffers are not hash-aggregable),
    * so each side of the shuffle sorts its rows by user_id first — but
    * the aggregate is still partial+final with map-side combine: the
    * shuffle carries ONE partial row per (input partition, user), not
    * raw events. That shuffle bound — not the per-partition sort — is
    * what separates this from the window row_number() form, which must
    * shuffle every raw event to its user's partition before ranking. */
  def topEventPerUser(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.table(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(max(struct(col("value"), col("event_id"), col("event_type"))).as("s"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.event_type").as("top_type"),
        round(col("s.value"), 6).as("top_value"),
        col("s.event_id").as("top_event_id"), col("n_events"))
      .orderBy("user_id")

  /** Q52 — conversion funnel (the windowFunnel analytic): per user,
    * the deepest view→click→purchase chain with strictly increasing
    * timestamps where every step lands within `windowDays` of the
    * first view; output is users-per-depth. Single pass: ONE shuffle
    * groups each user's (ts, type) events, a sorted in-row fold walks
    * them once — the equivalent three-way self-join formulation (the
    * oracle's spelling) shuffles the fact table three times. Per-user
    * fold state is three timestamps; the collected array is bounded by
    * per-user activity — the same bound any funnel engine carries, and
    * the standard salt-or-split escape applies to pathological users.
    * At 100 TB, pre-filter to the step types (and right-join the user
    * universe back) so signup/error traffic never enters the shuffle. */
  def windowFunnel(spark: SparkSession, sfDir: String,
                   windowDays: Int): DataFrame =
    windowFunnelBatch(Corpus.table(spark, sfDir, "events"), windowDays)

  def windowFunnelBatch(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val fold = s"""
      aggregate(es,
        named_struct('t1', CAST(NULL AS TIMESTAMP),
                     't2', CAST(NULL AS TIMESTAMP),
                     't3', CAST(NULL AS TIMESTAMP)),
        (acc, e) -> named_struct(
          't1', CASE WHEN acc.t1 IS NULL AND e.tp = 'view'
                     THEN e.ts ELSE acc.t1 END,
          't2', CASE WHEN acc.t2 IS NULL AND acc.t1 IS NOT NULL
                       AND e.tp = 'click' AND e.ts > acc.t1
                       AND e.ts <= acc.t1 + INTERVAL $windowDays DAYS
                     THEN e.ts ELSE acc.t2 END,
          't3', CASE WHEN acc.t3 IS NULL AND acc.t2 IS NOT NULL
                       AND e.tp = 'purchase' AND e.ts > acc.t2
                       AND e.ts <= acc.t1 + INTERVAL $windowDays DAYS
                     THEN e.ts ELSE acc.t3 END))"""
    events
      .select(col("user_id"), struct(col("ts"), col("event_type").as("tp")).as("e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .withColumn("st", expr(fold))
      .select(when(col("st.t3").isNotNull, 3)
        .when(col("st.t2").isNotNull, 2)
        .when(col("st.t1").isNotNull, 1).otherwise(0).as("depth"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("depth")
  }

  /** Q54 — retention cohorts (the ClickHouse retention() analytic,
    * day-grained): users are cohorted by their FIRST active day; for
    * each (cohort day, day offset) the output counts how many of that
    * cohort were active offset days later. ONE data shuffle: per-user
    * active-day sets are collected in a single user_id aggregate
    * (bounded by the calendar — days per user, not events per user),
    * the cohort day is array_min of the set (no second window or
    * self-join), and the final (cohort, offset) aggregate is
    * calendar²-sized. At 100 TB the same plan holds: the only
    * event-volume shuffle carries (user_id, day) partials collapsed
    * map-side by the partial collect_set. */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.table(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .groupBy(col("user_id")).agg(collect_set(col("d")).as("ds"))
      .select(col("user_id"), array_min(col("ds")).as("cd"),
        explode(col("ds")).as("d"))
      .groupBy(date_format(col("cd"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("d"), col("cd")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")

  /** Q32 — big×big equi-join (orders ⋈ lineitem on orderkey) + agg.
    * Both sides shuffle on the join key; at warehouse scale these
    * tables are bucketed on orderkey so the exchange disappears.
    * Revenue folds in DECIMAL (see `money`): exact, order-free, scale-
    * stable — the double fold failed the sf1 oracle even at 4dp. */
  def revenueByPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Corpus.table(spark, sfDir, "orders")
    val l = Corpus.table(spark, sfDir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q87 — four-table star join: revenue by (nation, order year) over
    * customer ⋈ orders ⋈ lineitem ⋈ nation. The depth-test of the
    * relational closure: Catalyst must broadcast the two dims (nation
    * 25 rows, customer SF-bounded vs the fact side) and leave one
    * shuffle join on the orders⋈lineitem fact spine — the classic
    * star-schema plan a warehouse query compiles to. */
  def nationYearRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Corpus.table(spark, sfDir, "customer")
    val o = Corpus.table(spark, sfDir, "orders")
    val l = Corpus.table(spark, sfDir, "lineitem")
    val n = Corpus.table(spark, sfDir, "nation")
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(o, o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("n_name"),
        year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), col("order_year"))
  }

  /** Gate composition (q79): the q32 revenue join routed THROUGH the
    * skew operator — same oracle, so the hash gate pins that the
    * operator returns exactly the plain equi-join's rows. The salt
    * factor is DERIVED from the observed key distribution (r12 paid a
    * pinned ×8 explode fan-out — 2.95 s vs q32's 0.63 s — on a corpus
    * whose hottest order key holds only 7 lines): TPC-H lineitem is
    * unskewed, so the derivation picks factor 1 and the gate pays the
    * plain join plus one sizing pass, while a genuinely hot key would
    * spread over exactly as many partitions as it fills
    * (SkewAndBucketSpec pins that branch on crafted skew). The salt
    * basis stays (order key, line number), a per-ROW value: salting
    * on the join key alone would give a hot key one fixed salt and
    * spread nothing. */
  def saltedRevenueByPriority(spark: SparkSession,
                              sfDir: String): DataFrame =
    saltedRevenue(spark, sfDir, None)

  /** Gate composition (q131): the SAME revenue join with the salt
    * factor FORCED — the adaptive derivation correctly picks the
    * plain join on TPC-H (q79), which would leave the explode/salt
    * machinery itself graded only by unit tests; this row keeps the
    * salted dataflow oracle-gated on real corpus data at every scale
    * factor (the machinery a genuinely hot production key would
    * actually ride). */
  def saltedRevenueByPriorityForced(spark: SparkSession, sfDir: String,
                                    factor: Int = 8): DataFrame =
    saltedRevenue(spark, sfDir, Some(factor))

  private def saltedRevenue(spark: SparkSession, sfDir: String,
                            forcedFactor: Option[Int]): DataFrame = {
    val o = Corpus.table(spark, sfDir, "orders")
    val l = Corpus.table(spark, sfDir, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val saltOn = struct(col("o_orderkey"), col("l_linenumber"))
    val joined = forcedFactor match {
      case Some(f) => SkewOps.saltedJoin(l, o, "o_orderkey", saltOn, f)
      case None => SkewOps.adaptiveSaltedJoin(l, o, "o_orderkey", saltOn)
    }
    joined
      .groupBy(col("o_orderpriority"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }
}

package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Plan-shape regression tests over the declared queries: the scale
  * properties (§4 posture) that silently regress — filter/column
  * pushdown into the parquet scan, broadcast joins for dims, top-k
  * instead of full sort — asserted against the optimizer's output on
  * the sf0.001 corpus. A green oracle run with a wrong plan is exactly
  * the failure mode these catch.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Exchanges that hash-partition on a column matching `key`. In
    * formatted mode the node header "(n) Exchange" and its
    * "Arguments: hashpartitioning(...)" print on SEPARATE lines, so a
    * single-line contains("Exchange hashpartitioning") matches nothing
    * — the r10 co-location pins were vacuously green until the r11
    * review caught it (verified against this Spark's output). Only
    * Exchange nodes carry hashpartitioning Arguments in formatted
    * mode, so counting those lines counts key exchanges exactly.
    */
  private[queries] def keyExchanges(p: String, key: String): Int = {
    val n = p.linesIterator.count(l =>
      l.contains("Arguments: hashpartitioning(") && l.contains(key))
    // Self-check that the pattern still matches how THIS Spark prints
    // plans: if hashpartitioning ever appears without a matchable
    // Arguments line, the counter is blind again — fail loudly rather
    // than return a vacuous zero.
    if (p.contains("hashpartitioning(")) {
      assert(p.linesIterator.exists(_.contains("Arguments: hashpartitioning(")),
        s"explain format changed — keyExchanges counter needs updating:\n$p")
    }
    n
  }

  test("q05: the conjunctive filter is pushed into the parquet scan") {
    val p = plan("q05_filter_conjunctive")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_discount)") || p.contains("GreaterThan(l_quantity"), p)
  }

  test("q06: the scan reads only the projected columns") {
    val p = plan("q06_project_rename")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_totalprice")
      && readSchema.contains("o_orderstatus"), readSchema)
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderdate"),
      s"column pruning regressed: $readSchema")
  }

  test("q20: the part dimension is broadcast; lineitem does not shuffle for the join") {
    val p = plan("q20_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q10: sort+limit collapses to top-k (TakeOrderedAndProject)") {
    val p = plan("q10_sort_desc_tiebreak")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q22: semi/anti joins plan as semi/anti, not materialized joins") {
    val p = plan("q22_join_semi_anti")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q35: exact multi-distinct plans without Expand row multiplication") {
    val p = plan("q35_distinct_agg")
    assert(!p.contains("Expand"), s"Expand reappeared in q35:\n$p")
  }

  test("q68: ANN scan broadcasts the query set, not the corpus") {
    val p = plan("q68_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q46 (TPC-H Q6): every predicate reaches the sorted-log scan as a convertible filter") {
    val p = plan("q46_tpch_q6")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    // The date bounds are BIGINT comparisons on the ship-date-sorted
    // log — the form that actually row-group-prunes (a raw NTZ
    // l_shipdate predicate is accepted but never prunes on this Spark).
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate_us")
      && pushed.contains("LessThan(l_shipdate_us")
      && pushed.contains("l_discount") && pushed.contains("l_quantity"), pushed)
    assert(p.contains("lineitem-sd-log"), s"q46 must read the at-rest sorted log:\n$p")
    val rawScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(rawScans == 0, s"q46 must not scan the raw NTZ table; saw $rawScans:\n$p")
  }

  test("q47 (TPC-H Q3): top-k plans as TakeOrderedAndProject; both date bounds prune layouts") {
    val p = plan("q47_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("c_mktsegment")), p)
    // The unshipped tail comes off the ship-date-sorted log...
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThan(l_shipdate_us")),
      s"unshipped cutoff must push into the sorted-log scan:\n$p")
    // ...and the orders bound off the year-partitioned layout.
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("LessThan(o_orderdate_us")),
      s"orders cutoff must push into the orders layout:\n$p")
    val raw = p.linesIterator.count(l => l.contains("Location")
      && (l.contains("lineitem.parquet") || l.contains("orders.parquet")))
    assert(raw == 0, s"q47 must read only the at-rest layouts; saw $raw raw scans:\n$p")
  }

  test("q120 (TPC-H Q1): date filter prunes the sorted log; scan reads the seven referenced columns") {
    val p = plan("q120_tpch_q1")
    // The <= bound is a BIGINT row-group predicate on the at-rest
    // ship-date-sorted log (raw NTZ accepts but never prunes).
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("LessThanOrEqual(l_shipdate_us")), p)
    assert(p.contains("lineitem-sd-log"), s"q120 must read the at-rest sorted log:\n$p")
    // The log carries all 11 columns; column pruning must still narrow
    // this scan to the seven the query touches.
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_tax"), readSchema)
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"column pruning regressed: $readSchema")
  }

  test("q121 (TPC-H Q18): one co-located aggregate+join, no orderkey shuffle anywhere") {
    val p = plan("q121_tpch_q18")
    // Both fact-scaled sides ride the orderkey co-location pair — the
    // raw tables are out of the plan entirely (and the literal
    // IN-subquery transcription's second lineitem scan with them).
    val raw = p.linesIterator.count(l => l.contains("Location")
      && (l.contains("lineitem.parquet") || l.contains("orders.parquet")))
    assert(raw == 0, s"q121 must read only the bucketed pair; saw $raw raw scans:\n$p")
    assert(p.contains("Bucketed: true"), s"bucketed layout not in play:\n$p")
    // ...and exactly ONCE each: the literal IN-subquery transcription
    // would plan a second full fact scan over the bucketed layout too.
    for (src <- Seq("bkt-lineitem-by-orderkey", "bkt-orders-by-orderkey")) {
      val n = p.linesIterator.count(l => l.contains("Location") && l.contains(src))
      assert(n == 1, s"q121 must scan $src exactly once, saw $n:\n$p")
    }
    // The whole point of the pair: the per-order rollup and the
    // orders join consume the scans' hash distribution — no exchange
    // repartitions on the order key.
    assert(keyExchanges(p, "orderkey") == 0, s"orderkey shuffle reappeared:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q122 (TPC-H Q21): both correlated EXISTS fold into ONE co-located scan pair, zero fact shuffle") {
    val p = plan("q122_tpch_q21")
    val liScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(liScans == 0,
      s"the fact side must read the bucketed layout; saw $liScans raw scans:\n$p")
    assert(p.contains("Bucketed: true"), s"bucketed layout not in play:\n$p")
    // Exactly ONE bucketed fact scan: the literal EXISTS transcription
    // planned three lineitem lineages, and a bucketed re-scan is just
    // as expensive at 100 TB as a raw one.
    val bktScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("bkt-lineitem-by-orderkey"))
    assert(bktScans == 1, s"q122 must scan the bucketed fact once, saw $bktScans:\n$p")
    assert(p.contains("Window"), s"expected window-aggregate reformulation:\n$p")
    // The join meets the co-bucketed scans in place and the per-order
    // windows run on that same distribution, so the only hash exchange
    // left is the final tiny s_name aggregate.
    assert(keyExchanges(p, "orderkey") == 0, s"orderkey shuffle reappeared:\n$p")
    val exchanges = p.linesIterator.count(_.trim.matches(raw"\(\d+\) Exchange.*"))
    assert(exchanges <= 2, s"expected ≤2 exchanges (final agg + broadcasts), saw $exchanges:\n$p")
  }

  test("q123 (TPC-H Q4): the correlated EXISTS plans as a semi join with the date bounds pruning") {
    val p = plan("q123_tpch_q4")
    assert(p.contains("LeftSemi"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(o_orderdate_us")),
      s"quarter bounds must push as BIGINT micros into the orders layout:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("order_year")),
      s"year bounds must prune directories of the orders layout:\n$p")
    // The probe side reads the orderkey-bucketed projection: at scale
    // the quarter's orders slice shuffles to the fact's at-rest bucket
    // layout, never the reverse.
    val liRaw = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(liRaw == 0, s"q123's probe side must read the bucketed layout:\n$p")
  }

  test("date-bounded orders reads slice the year-partitioned date-sorted layout") {
    // q118/q119/q126/q134 (and q47/q123, pinned individually): the
    // year bounds prune DIRECTORIES (PartitionFilters), the micros
    // bounds prune ROW GROUPS (pushed BIGINT filters) — the raw NTZ
    // table, whose date predicates never convert, is out of these
    // plans entirely.
    for (q <- Seq("q118_tpch_q5", "q119_tpch_q10", "q126_tpch_q22", "q134_tpch_q8")) {
      val p = plan(q)
      assert(p.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("order_year")),
        s"$q: no directory pruning on order_year:\n$p")
      assert(p.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("o_orderdate_us")),
        s"$q: date bounds not pushed as BIGINT micros:\n$p")
      val rawScans = p.linesIterator.count(l =>
        l.contains("Location") && l.contains("orders.parquet"))
      assert(rawScans == 0, s"$q still scans the raw orders table ($rawScans):\n$p")
    }
  }

  test("asymmetric co-location: the fact side stays at rest, only the reduced side shuffles") {
    // q118/q119: lineitem reads the orderkey-bucketed layout (no
    // shuffle); the date-pruned orders slice shuffles to it. q140: the
    // roles reverse — orders stays at rest and the %bolt%-reduced
    // lineitem stream shuffles to ITS buckets. Either way the full
    // fact table never crosses the wire for the orderkey hop.
    for (q <- Seq("q118_tpch_q5", "q119_tpch_q10")) {
      val p = plan(q)
      val liRaw = p.linesIterator.count(l =>
        l.contains("Location") && l.contains("lineitem.parquet"))
      assert(liRaw == 0, s"$q's fact side must read the bucketed layout:\n$p")
    }
    val p140 = plan("q140_tpch_q9")
    val oRaw = p140.linesIterator.count(l =>
      l.contains("Location") && l.contains("orders.parquet"))
    assert(oRaw == 0, s"q140's orders side must read the bucketed layout:\n$p140")
  }

  test("q124 (TPC-H Q14): one joined pass computes both conditional sums") {
    val p = plan("q124_tpch_q14")
    val liScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem-sd-log"))
    assert(liScans == 1, s"ratio-of-sums must not scan the fact twice; saw $liScans:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(l_shipdate_us")),
      s"month bounds must push into the sorted-log scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q125 (TPC-H Q19): the part-side disjunction pushes into the part scan as an Or filter") {
    val p = plan("q125_tpch_q19")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("Or(") && l.contains("p_brand")),
      s"part-side Or bracket not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"disjunction degraded the join:\n$p")
  }

  test("q126 (TPC-H Q22): scalar subquery broadcasts; the no-recent-orders check is an anti join") {
    val p = plan("q126_tpch_q22")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row average must ride a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q127 (TPC-H Q13): the order-priority predicate stays inside the outer join") {
    val p = plan("q127_tpch_q13")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p)
    // The predicate filters the ORDERS side pre-join (equivalent for a
    // right-side-only condition) — it must reach the orders scan.
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("o_orderpriority")), p)
    // Both sides ride the custkey co-location pair: no raw scans, and
    // no exchange repartitions on the customer key — the per-customer
    // count consumes the co-bucketed join's distribution.
    val raw = p.linesIterator.count(l => l.contains("Location")
      && (l.contains("customer.parquet") || l.contains("orders.parquet")))
    assert(raw == 0, s"q127 must read only the custkey pair; saw $raw raw scans:\n$p")
    assert(keyExchanges(p, "custkey") == 0, s"custkey shuffle reappeared:\n$p")
  }

  test("co-located joins survive the at-scale geometry: zero key exchanges with broadcasts off") {
    // At the test SFs the planner hides shuffles by broadcasting small
    // sides — at 100 TB nothing fact-scaled broadcasts. Disabling
    // auto-broadcast simulates that geometry: the co-location pairs
    // must STILL plan their keyed joins/aggregates/windows with no
    // exchange on the bucket key (sort-merge in place). Exchanges on
    // OTHER keys (the dimension hops) are expected and allowed.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for ((q, key) <- Seq(
          "q121_tpch_q18" -> "orderkey", "q122_tpch_q21" -> "orderkey",
          "q21_join_multi" -> "orderkey", "q49_bucketed_agg" -> "orderkey",
          "q127_tpch_q13" -> "custkey")) {
        val p = plan(q)
        assert(keyExchanges(p, key) == 0,
          s"$q: $key shuffle appears once broadcasts are off — the co-location is cosmetic:\n$p")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q21: the fact sides meet on the co-bucketed orderkey pair before any dimension hop") {
    val p = plan("q21_join_multi")
    val raw = p.linesIterator.count(l => l.contains("Location")
      && (l.contains("lineitem.parquet") || l.contains("orders.parquet")))
    assert(raw == 0, s"q21's fact sides must read the bucketed pair; saw $raw raw scans:\n$p")
    assert(keyExchanges(p, "orderkey") == 0, s"orderkey shuffle reappeared:\n$p")
  }

  test("q128 (TPC-H Q17): the correlated average folds into ONE scan + a window on the join key") {
    val p = plan("q128_tpch_q17")
    val liScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(liScans == 1,
      s"the literal correlated subquery re-plans a second lineitem scan; saw $liScans:\n$p")
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q129 (TPC-H Q15): the revenue max rides a broadcast; the quarter filter reaches both scans") {
    val p = plan("q129_tpch_q15")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    val pushed = p.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(l_shipdate_us")).size
    assert(pushed >= 2, s"quarter filter must push to both rev-subtree log scans:\n$p")
  }

  test("q130: the MMR recall phase broadcasts the query and plans top-M as top-k") {
    // The declared query's final frame is a local re-rank of the
    // bounded recall set, so the scale property lives in the recall
    // helper's plan: one corpus scan, the single query vector
    // broadcast, and the top-M as TakeOrderedAndProject (never a
    // global sort).
    val p = Similarity.mmrRecall(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q133 (TPC-H Q7): the cross-dim disjunction derives pushed per-nation filters") {
    val p = plan("q133_tpch_q7")
    // Constraint propagation must extract `n_name IN (3,7)` from the
    // (n1=3 ∧ n2=7) ∨ (n1=7 ∧ n2=3) filter and push it into BOTH
    // nation scans — without it each broadcast carries every nation.
    val derived = p.linesIterator.count(l =>
      l.contains("PushedFilters") && l.contains("Or(EqualTo(n_name"))
    assert(derived == 2, s"expected the derived Or filter on both nation scans:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(l_shipdate_us")),
      s"date range must push into the sorted-log scan:\n$p")
  }

  test("q135: collocations plan zero corpus-text scans; top-20 plans as top-k") {
    val p = plan("q135_collocations")
    // Unigram counts come from the tf snapshot, bigram counts from the
    // bigram-frequencies snapshot — the query itself must never
    // re-tokenize the corpus (the multi-branch formulation planned
    // FIVE full text scans before the snapshots).
    val docScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents.parquet"))
    assert(docScans == 0, s"corpus text must stay at rest; saw $docScans scans:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q136 (TPC-H Q16): IN-list pushed to the part scan; NOT IN plans as an anti join") {
    val p = plan("q136_tpch_q16")
    assert(p.contains("LeftAnti"), p)
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(p_size")), p)
  }

  test("q137 (TPC-H Q12): both conditional counts come from ONE joined pass") {
    val p = plan("q137_tpch_q12")
    val liScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem-sd-log"))
    assert(liScans == 1, s"two-count CASE must not scan the fact twice; saw $liScans:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(l_shipdate_us")),
      s"year bounds must push into the sorted-log scan:\n$p")
  }

  test("q138 (TPC-H Q2): the correlated min folds to ONE partsupp scan + a window") {
    val p = plan("q138_tpch_q2")
    val psScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("partsupp"))
    assert(psScans == 1,
      s"the literal correlated-min transcription scans partsupp twice; saw $psScans:\n$p")
    // The query runs entirely off the at-rest artifact — the fact table
    // was paid once at ingest, never at query time.
    val liScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(liScans == 0, s"q138 must not re-derive partsupp from lineitem; saw $liScans:\n$p")
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // The min-cost window consumes the partkey-bucketed scan — no
    // exchange repartitions on ps_partkey.
    assert(keyExchanges(p, "ps_partkey") == 0, s"ps_partkey shuffle reappeared in q138:\n$p")
  }

  test("q139 (TPC-H Q11): group-vs-global-scalar scans the small artifact, never lineitem") {
    val p = plan("q139_tpch_q11")
    val psScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("partsupp"))
    assert(psScans == 2,
      s"expected the two aggregation passes over the at-rest partsupp artifact; saw $psScans:\n$p")
    val liScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(liScans == 0, s"the global scalar must not touch the fact table; saw $liScans:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row total must ride a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // Both per-part aggregation passes consume the partkey-bucketed
    // scan — no exchange repartitions on ps_partkey.
    assert(keyExchanges(p, "ps_partkey") == 0, s"ps_partkey shuffle reappeared in q139:\n$p")
  }

  test("q140 (TPC-H Q9): one fact scan; the name filter prunes both composite-join sides") {
    val p = plan("q140_tpch_q9")
    val liScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(liScans == 1, s"profit must come from ONE lineitem pass; saw $liScans:\n$p")
    val psScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("partsupp"))
    assert(psScans == 1, s"one partsupp scan expected; saw $psScans:\n$p")
    // The part-name selection reaches the partsupp side as a semi join,
    // so the composite-key shuffle carries only selected parts' rows.
    assert(p.contains("LeftSemi"), s"partsupp side not semi-pruned by the part filter:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q141 (TPC-H Q20): correlated stock threshold via semi joins, one fact scan") {
    val p = plan("q141_tpch_q20")
    val liScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem-sd-log"))
    assert(liScans == 1,
      s"the shipped-qty aggregate is the only fact read; saw $liScans:\n$p")
    val semis = p.linesIterator.count(l => l.contains("LeftSemi"))
    assert(semis >= 2, s"part-filter and supplier-membership must plan as semi joins:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(l_shipdate_us")),
      s"1996 window must push to the sorted-log scan:\n$p")
  }

  test("q48: the year filter prunes partitions of the at-rest layout") {
    val p = plan("q48_partition_pruned")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("order_year"), s"no partition filter on order_year:\n$p")
    // The filter must be a PARTITION filter (directory-level pruning),
    // not a pushed data filter: the scan's PushedFilters must not need
    // to re-check order_year row by row.
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(!pushed.contains("order_year"), s"order_year degraded to a data filter:\n$p")
  }

  test("q49: the keyed aggregate over the bucketed table plans with no hash exchange") {
    val p = plan("q49_bucketed_agg")
    assert(keyExchanges(p, "") == 0, // "" = count EVERY hash exchange
      s"bucketed agg should consume the scan's distribution:\n$p")
    // The layout is really in play: the scan must be a bucketed scan.
    assert(p.contains("Bucketed: true"), s"scan is not bucketed:\n$p")
  }

  test("q80: simhash candidates come from a band-bucket equi-join, not an all-pairs comparison") {
    val p = plan("q80_simhash_neardup")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"band join is not an equi-join:\n$p")
    // The 1-row derived-width parameter frame rides in on a broadcast
    // cross append (the IVF-centroid pattern — constant-size build
    // side, map-side only). Any OTHER nested-loop join would be a real
    // all-pairs comparison between document sides: forbidden.
    val bnljTree = p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && l.contains("Build")).toSeq
    bnljTree.foreach(l =>
      assert(l.contains("Cross BuildRight"),
        s"non-parameter nested-loop join in q80: $l\n$p"))
    assert(bnljTree.size <= 2,
      s"more nested-loop joins than the two 1-row parameter appends:\n$p")
    // And the candidate join really keys on (band, key): the formatted
    // plan prints hash-join keys as "Left keys [2]: [band#…, key#…]".
    assert(p.linesIterator.exists(l => l.contains("keys") && l.contains("band#")),
      s"no band-keyed equi-join found in q80:\n$p")
  }

  test("q84: LSH search broadcasts the query set and joins on the bucket key") {
    val p = plan("q84_ann_lsh_buckets")
    assert(p.contains("BroadcastHashJoin"), s"bucket join should broadcast queries:\n$p")
  }

  test("q91: hot-ngram top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q91_hot_ngrams")
    assert(p.contains("TakeOrderedAndProject"), s"q91 sorts globally:\n$p")
  }

  test("q92: incremental candidates equi-join the band index, no all-pairs comparison") {
    val p = plan("q92_incremental_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"all-pairs comparison in q92:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"band probe is not an equi-join:\n$p")
  }

  test("q93/q94: shingle joins carry the 8-byte hash, never n-gram text") {
    Seq("q93_boilerplate_frac", "q94_ngram_decontam").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"non-equi join in $name:\n$p")
      // Every join keys on h (bigint); the shingle TEXT column (sh/m)
      // must not survive into any exchange.
      val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
      assert(exchanges.nonEmpty, s"expected keyed exchanges in $name:\n$p")
      exchanges.foreach(e =>
        assert(!e.contains("sh#") && !e.contains("m#"), s"shingle text shuffled in $name: $e"))
    }
  }

  test("q95: the scrub is one codegen'd map pass — no exchange before the presentation sort") {
    val p = plan("q95_pattern_scrub")
    assert(!p.contains("hashpartitioning"),
      s"q95 should only exchange for the final sort (rangepartitioning):\n$p")
    assert(p.contains("rangepartitioning"), p)
  }

  test("q96: the balanced sample ranks inside cluster partitions, no corpus-global window") {
    val p = plan("q96_cluster_balanced_sample")
    assert(p.contains("Window"), p)
    val windowPart = p.linesIterator.find(_.contains("row_number()")).getOrElse("")
    assert(windowPart.contains("cluster"), s"rank window not partitioned by cluster: $windowPart")
  }

  test("q103: chunking is one map-side pass — no exchange before the presentation sort") {
    val p = plan("q103_context_chunks")
    assert(!p.contains("hashpartitioning"),
      s"q103 should only exchange for the final sort (rangepartitioning):\n$p")
    assert(p.contains("rangepartitioning"), p)
  }

  test("q104: chunk joins carry the digest, never token arrays or text") {
    val p = plan("q104_chunk_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in q104:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"expected digest-keyed exchanges in q104:\n$p")
    exchanges.foreach(e =>
      assert(!e.contains("toks#") && !e.contains("text#"),
        s"token text shuffled in q104: $e"))
  }

  test("q105: one scan, digest-keyed window shuffle, no text in any exchange") {
    val p = plan("q105_curation_funnel")
    val scans = p.linesIterator.count(l =>
      l.trim.startsWith("(") && l.contains("Scan parquet"))
    assert(scans == 1, s"funnel should read the corpus exactly once, saw $scans:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"expected the dedup-window exchange in q105:\n$p")
    exchanges.foreach(e =>
      assert(!e.contains("text#"), s"document text shuffled in q105: $e"))
  }

  test("restructured curation queries read the corpus text at most once") {
    // Each of these used to plan 2-3 full scans of documents.text (the
    // 100 TB payload) because exchange reuse does not fire across
    // differently-keyed branches — pinned here after the single-scan
    // restructures (tagged explode, at-rest digest index,
    // flag-in-join-condition). q82/q104 now read the text ZERO times:
    // their tokenize/chunk pass moved into the per-corpus tf/chunk
    // snapshot built at ingest (prebuildIndexes), so the query plan
    // scans only the compact artifact. q82 additionally plans a
    // column-LESS documents scan for its corpus count: a parquet
    // footer read, which this test deliberately does not count.
    val expected = Map(
      "q81_repetition_signals" -> 1, "q82_tfidf_topterms" -> 0,
      "q85_incremental_dedup" -> 1, "q97_token_budget" -> 1,
      "q102_bloom_dedup" -> 1, "q104_chunk_dedup" -> 0,
      // q107 reads the positioned span-window snapshot, q108 and q113
      // the tf snapshot — corpus text is an ingest-time cost for all
      // three (q113's documents scan prunes to doc_id/n_chars).
      "q107_duplicate_spans" -> 0, "q108_unigram_rarity" -> 0,
      "q113_model_quality_filter" -> 0)
    for ((q, want) <- expected.toSeq.sortBy(_._1)) {
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      val n = p.linesIterator.count(l =>
        l.contains("Scan parquet") && l.contains("documents.parquet")
          && l.contains("text:string"))
      assert(n == want, s"$q reads documents.text $n times (want $want):\n$p")
    }
  }

  test("q74: one shingle lineage — source pairs explode from per-hash sets, no self-join") {
    // The per-hash source set is bounded by |sources|, so the pair
    // generation needs no second pass over the shingle table. Two
    // Location lines for one source = the distinct + self-join shape
    // (duplicate shingle⋈documents lineages) crept back.
    val p = plan("q74_contamination")
    for (src <- Seq("shingles-k3", "documents.parquet")) {
      val n = p.linesIterator.count(l => l.contains("Location") && l.contains(src))
      assert(n == 1, s"q74 must scan $src exactly once, saw $n:\n$p")
    }
  }

  test("q81: per-document repetition statistics plan with zero hash exchanges") {
    // The native graft_gram_stats expression computes each document's
    // top-gram multiplicities where the row is — the only exchange
    // allowed is the final presentation sort. A hash exchange here
    // means the explode → regroup shape (two full gram-stream
    // shuffles at 100 TB) crept back.
    val p = plan("q81_repetition_signals")
    assert(p.contains("graft_gram_stats") || p.contains("gramstats"),
      s"q81 must use the native expression:\n$p")
    assert(keyExchanges(p, "") == 0, s"q81 regained a hash exchange:\n$p")
  }

  test("q82: df is a groupBy over the tf snapshot — no window keyed on raw term") {
    // A count window partitioned by term buffers one partition per
    // term: for a stopword that is O(N_docs) rows on one task at
    // 100 TB. The groupBy formulation aggregates partially map-side;
    // the only window left is the per-doc top-k rank.
    val p = plan("q82_tfidf_topterms")
    val windows = p.linesIterator.filter(_.trim.matches("\\(\\d+\\) Window.*")).toSeq
    assert(windows.nonEmpty, s"expected the per-doc rank window in q82:\n$p")
    val windowArgs = p.linesIterator.filter(l =>
      l.contains("row_number()") || l.contains("windowspecdefinition")).toSeq
    windowArgs.foreach(w =>
      assert(w.contains("doc_id"), s"q82 window not partitioned by doc_id: $w"))
  }

  test("q107: span-dedup exchanges carry the 60-bit hash, never window text") {
    val p = plan("q107_duplicate_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in q107:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"expected hash-keyed exchanges in q107:\n$p")
    exchanges.foreach(e =>
      assert(!e.contains("sh#") && !e.contains("text#"),
        s"window text shuffled in q107: $e"))
  }

  test("q109: the as-of join runs the native operator, not a window over a union") {
    val p = plan("q109_asof_join_native")
    assert(p.contains("AsOfJoin"), s"native as-of operator missing:\n$p")
    assert(!p.contains("Window"), s"q109 fell back to the window composition:\n$p")
    assert(!p.contains("Union"), s"q109 unions the two streams:\n$p")
    // Each side's event_type filter reaches its parquet scan.
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.count(_.contains("event_type")) == 2,
      s"event_type filters not pushed on both sides:\n$p")
  }

  test("q110: ADC search scans the code table; raw vectors only on the query side") {
    val p = SparkEntry.queries("q110_pq_ann")(spark, sf)
      .queryExecution.executedPlan.toString
    // The corpus-side scan is the at-rest PQ code table...
    assert(p.contains("pq-codes"), s"ADC does not read the code snapshot:\n$p")
    // ...and the only scan that decodes the float vectors is the
    // 10-row query side (one embeddings scan in the whole plan).
    val vecScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("embeddings.parquet"))
    assert(vecScans == 1, s"expected 1 embeddings scan (query side), saw $vecScans:\n$p")
  }

  test("q111: IVF-PQ scans the code table and cluster map; raw vectors only on the query side") {
    val p = SparkEntry.queries("q111_ivfpq_ann")(spark, sf)
      .queryExecution.executedPlan.toString
    // Corpus side = the two at-rest artifacts (codes + assignment)...
    assert(p.contains("pq-codes"), s"IVF-PQ does not read the code snapshot:\n$p")
    assert(p.contains("ivf-assigned"), s"IVF-PQ does not read the cluster map:\n$p")
    // ...and raw float vectors appear only in the 10-row query-side
    // scans (distance tables): every embeddings scan must carry the
    // pushed vec_id < 10 filter — none may read the whole corpus.
    val vecScans = p.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("embeddings.parquet")).toSeq
    assert(vecScans.nonEmpty, s"expected query-side embeddings scans:\n$p")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(_.contains("LessThan(vec_id,10)")),
      s"query-side vec_id filter not pushed to the scan:\n$p")
  }

  test("q112: incremental ingest scores only the batch; history comes from snapshots") {
    val p = SparkEntry.queries("q112_incremental_ann_ingest")(spark, sf)
      .queryExecution.executedPlan.toString
    // The frozen quantizer and the index occupancy are at-rest reads.
    assert(p.contains("ivf-half-centroids"), s"frozen centroids not read from snapshot:\n$p")
    assert(p.contains("ivf-half-assigned"), s"index assignment not read from snapshot:\n$p")
    // The only raw-vector work is the arriving batch: one embeddings
    // scan, with the vec_id >= half split pushed into it.
    val vecScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("embeddings.parquet"))
    assert(vecScans == 1, s"expected 1 embeddings scan (the batch), saw $vecScans:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(vec_id")),
      s"batch split not pushed to the scan:\n$p")
  }

  test("q30: top-k rank filter plans partial + final WindowGroupLimit") {
    // Spark's InferWindowGroupLimit rewrites `row_number() <= k` into a
    // WindowGroupLimit pair — a map-side partial that keeps only k rows
    // per key per partition BEFORE the window's shuffle, then a final
    // one after. At 100 TB that's the difference between shuffling k
    // rows per key and shuffling the whole table; this pin fails if a
    // plan change (or a conf regression) ever drops the rewrite.
    val p = plan("q30_window_topk")
    val n = p.linesIterator.count(_.trim.matches("\\(\\d+\\) WindowGroupLimit.*"))
    assert(n >= 2, s"expected partial+final WindowGroupLimit in q30, saw $n:\n$p")
  }

  test("q142: one hash exchange drives both SCD2 windows") {
    // The change filter preserves the first window's partitioning and
    // ordering, so lead + version numbering re-shuffle and re-sort
    // nothing: exactly one hashpartitioning exchange (the final global
    // ORDER BY adds a range exchange, not a hash one). At 100 TB a
    // second user_id shuffle here would double the job's network cost.
    val p = plan("q142_scd2_history")
    val hashEx = p.linesIterator.count(_.contains("hashpartitioning(user_id"))
    assert(hashEx == 1, s"expected ONE user_id exchange, saw $hashEx:\n$p")
    val sorts = p.linesIterator.count(_.trim.matches("\\(\\d+\\) Sort.*"))
    assert(sorts <= 2, s"the two windows must share one per-key sort:\n$p")
  }

  test("q143: corpus text never rides the vocab-growth plan") {
    // Checkpoint math is a per-row integer expression on doc_id and the
    // term grain comes from the at-rest tf snapshot — the only string
    // column read anywhere is the snapshot's compact term column, never
    // document text; a text read here would mean the query re-tokenizes
    // the corpus at query time.
    val p = plan("q143_vocab_growth")
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(!_.contains("text:")),
      s"corpus text entered the plan:\n${reads.mkString("\n")}")
    assert(!p.contains("ntile") && !p.contains("percent_rank"),
      s"checkpoint assignment must not be a global rank window:\n$p")
  }

  test("q144: the threshold sweep reads the corpus once and broadcasts the histogram") {
    // Histogram-first: one text+lang scan into a map-side-combined
    // bucket histogram; the 20-way sweep is a broadcast theta-join of
    // two bounded frames. Threshold x row work must never materialize.
    val p = plan("q144_threshold_sweep")
    val docScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents.parquet"))
    assert(docScans == 1, s"sweep must scan the corpus ONCE; saw $docScans:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"bucket>=i over the bounded histogram must broadcast:\n$p")
  }

  test("q145: the merge scans events once; closed history skips the merge shuffle") {
    // Incremental view maintenance: the new batch is the ONLY events
    // read, the at-rest dimension contributes its two slices (closed
    // pass-through + open pseudo-events), and closed history never
    // enters the user_id exchange — only the bounded merge relation
    // shuffles. A second events scan or a second hash exchange here
    // means the "incremental" path re-reads history.
    val p = plan("q145_scd2_merge")
    val logScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("events-us-log"))
    assert(logScans == 1,
      s"merge must read the sorted at-rest log ONCE (the new batch); saw $logScans:\n$p")
    val evScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("events.parquet"))
    assert(evScans == 0,
      s"the merge must never touch the raw corpus — encoding drift stops at ingest:\n$p")
    // The hwm boundary must reach the log scan as a pushed BIGINT
    // literal: on the ts-sorted log that comparison genuinely prunes
    // row groups (metrics-proven in EventsLoaderSpec) — a raw-encoding
    // timestamp predicate is accepted but never prunes on this Spark.
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(ts_us")),
      s"hwm filter must push into the log scan:\n$p")
    val baseScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("scd2-base"))
    assert(baseScans == 2, s"expected closed + open slices of the at-rest dim; saw $baseScans:\n$p")
    val hashEx = p.linesIterator.count(_.contains("hashpartitioning(user_id"))
    assert(hashEx == 1, s"closed history leaked into the merge shuffle:\n$p")
  }

  test("q151: the partsupp merge scans the sorted log once; base history never rebuilds") {
    // Incremental aggregate maintenance: the new batch is the ONLY
    // fact read (the hwm filter selects it from the ship-date-sorted
    // log), the at-rest grain arrives as its compact partial-aggregate
    // artifact, and nothing re-derives the base grain from fact
    // history. A second fact scan here means the "incremental" path
    // re-aggregates history.
    val p = plan("q151_partsupp_merge")
    val logScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem-sd-log"))
    assert(logScans == 1,
      s"merge must read the sorted log ONCE (the new batch); saw $logScans:\n$p")
    val rawScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem.parquet"))
    assert(rawScans == 0,
      s"the merge must never touch the raw NTZ table at query time; saw $rawScans:\n$p")
    // The hwm boundary reaches the log scan as a pushed BIGINT literal
    // — on the ship-date-sorted layout that comparison genuinely
    // prunes row groups (metrics-proven in LineitemLayoutSpec); the r9
    // accepted-but-not-pruned honesty note is closed for this path.
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("GreaterThanOrEqual(l_shipdate_us")),
      s"hwm filter must push into the log scan:\n$p")
    val baseScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("partsupp-base"))
    assert(baseScans == 1, s"expected the at-rest grain artifact; saw $baseScans:\n$p")
  }

  test("q146: linkage reads the at-rest block index; corpus text never enters the plan") {
    // Candidates equi-join the tagged 8-char block keys of the compact
    // at-rest table; verification rides the bounded 48-byte prefix
    // column. A documents.parquet scan here would mean re-normalizing
    // the corpus at query time.
    val p = plan("q146_edit_distance_linkage")
    val docScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents.parquet"))
    assert(docScans == 0, s"corpus scanned at query time; saw $docScans:\n$p")
    assert(p.linesIterator.count(l =>
      l.contains("Location") && l.contains("linkage-blocks")) >= 2, p)
  }

  test("q147: attribution filters push to the scan and join equi on user_id") {
    val p = plan("q147_multitouch_attribution")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("EqualTo(event_type,purchase)")), p)
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("EqualTo(event_type,click)")), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"purchase-click match must be an equi join on user_id:\n$p")
  }

  test("q148: the drift report is ONE conditional-aggregation pass over events") {
    val p = plan("q148_snapshot_drift")
    val evScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("events.parquet"))
    assert(evScans == 1, s"base/new split must not scan events twice; saw $evScans:\n$p")
    assert(p.contains("BroadcastExchange"), s"the 1-row hwm must broadcast:\n$p")
  }

  test("q149: the dimension lookup is an equi join on user_id with the purchase filter pushed") {
    val p = plan("q149_scd2_lookup")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("EqualTo(event_type,purchase)")), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      s"interval predicate must ride the user_id equi join, not a loop join:\n$p")
  }

  test("q150: the melt's Expand multiplies the summary rows, not the fact table") {
    val p = plan("q150_unpivot")
    val scans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("orders.parquet"))
    assert(scans == 1, s"melt must aggregate one orders scan; saw $scans:\n$p")
    assert(p.contains("Expand"), s"unpivot should plan as Expand:\n$p")
    // The Expand input is the |priorities|-row aggregate: the plan must
    // aggregate BEFORE expanding. Formatted-plan operator ids number
    // bottom-up (children < parents), so every HashAggregate id must be
    // smaller than the Expand's id.
    def ids(op: String): Seq[Int] =
      s"\\((\\d+)\\) $op".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val expandIds = ids("Expand")
    val aggIds = ids("HashAggregate")
    assert(expandIds.nonEmpty && aggIds.nonEmpty && aggIds.forall(_ < expandIds.min),
      s"aggregate must feed the Expand (got agg=$aggIds expand=$expandIds):\n$p")
  }

  test("no declared query windows a full base table on a low-cardinality partition key") {
    // A window partitioned SOLELY by a ≤handful-of-values column
    // funnels whole-table-scale partitions through single tasks — a
    // straggler by construction at 100× (the q33 history). Windows over
    // bounded PRE-AGGREGATES on such keys are fine (q115's minutes ×
    // types): the rule fires only when the window's input subtree
    // scans a file source with no aggregation in between.
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val lowCard = Set("o_orderstatus", "o_orderpriority", "l_returnflag",
      "l_linestatus", "c_mktsegment", "event_type", "lang", "source")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      // sparkPlan (pre-AQE-wrapping): WindowExec/aggregate/scan
      // relationships are all visible without unwrapping adaptive nodes.
      val p = SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
      p.foreach {
        case w: WindowExec =>
          val keys = w.partitionSpec.collect { case a: AttributeReference => a.name }
          if (keys.nonEmpty && keys.forall(lowCard.contains)) {
            val aggregatedBelow =
              w.child.exists { case _: BaseAggregateExec => true; case _ => false }
            val scansBase =
              w.child.exists { case _: FileSourceScanExec => true; case _ => false }
            assert(aggregatedBelow || !scansBase,
              s"$name windows a full base-table input partitioned only by " +
                s"low-cardinality ${keys.mkString(",")} — single-task straggler at scale")
          }
        case _ => ()
      }
    }
  }

  test("q33: two-phase ranking — one balanced range shuffle, ranks by arithmetic, broadcast merge") {
    val p = plan("q33_ranking_functions")
    // The heavy input is range-partitioned on the full window ordering
    // (its ONLY full-data exchange)...
    assert(p.contains("REPARTITION_BY_NUM") || p.contains("rangepartitioning"),
      s"q33 lost its balanced range phase:\n$p")
    // ...ranks come from offset arithmetic over the sorted slices —
    // NO ranking window anywhere in the plan (the sum windows run over
    // the ≤N×|status|-row slice aggregate; the generic low-card pin
    // checks those sit above an aggregate)...
    assert(!p.contains("rank("),
      s"a ranking window over the fact reappeared in q33:\n$p")
    // ...and the merge side rides a broadcast join, never a shuffle of
    // the fact.
    assert(p.contains("BroadcastHashJoin"), s"q33 offset merge must broadcast:\n$p")
  }

  test("no declared query plans a CartesianProduct") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("no declared query degrades to a CartesianProduct when auto-broadcast is off") {
    // The at-scale reading of the no-cartesian gate: at the test SFs
    // the planner auto-broadcasts anything under the threshold, which
    // can silently rescue a query whose join would otherwise have no
    // equi-condition path — at 100 TB nothing un-hinted broadcasts,
    // and such a query would plan a corpus-squared cartesian. With the
    // threshold off, every surviving broadcast is an EXPLICIT
    // broadcast() hint (a bounded-by-construction claim the scaladocs
    // make: query sets, centroid tables, 1-row parameter frames), and
    // no plan may fall back to CartesianProduct.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        val p = plan(name)
        assert(!p.contains("CartesianProduct"),
          s"$name plans a cartesian product once broadcasts are off — " +
            s"it depends on a small-SF auto-broadcast that cannot exist at scale:\n$p")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q67: the rarity filter sits BELOW every posting-list collect (bounded build state)") {
    // The r10 HIGH advice shape: collect_set over every shingle hash
    // BEFORE the rarity filter buffers a boilerplate shingle's
    // O(N_docs) posting list in one aggregation buffer — the filter
    // must reach the postings via the df-artifact semi-join first, so
    // per-key aggregation state is capped at RareShingleCap by
    // construction. Pin: every collect_set aggregate in the optimized
    // plan has a LeftSemi join somewhere beneath it.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val opt = SparkEntry.queries("q67_ngram_jaccard")(spark, sf)
      .queryExecution.optimizedPlan
    val collectAggs = opt.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.find(_.toString.contains("collect_set")).isDefined) => a
    }
    assert(collectAggs.nonEmpty, "q67 lost its posting-set aggregate — update this pin")
    collectAggs.foreach { a =>
      val semiBelow = a.collectFirst {
        case j: Join if j.joinType == LeftSemi => j
      }
      assert(semiBelow.isDefined,
        s"q67 collects posting lists without the rarity semi-join below it:\n$a")
    }
  }
}

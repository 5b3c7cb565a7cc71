package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan audit over every registered query at sf0.001 — the
  * design-for-scale properties the engine promises:
  * no cartesian products anywhere, dims broadcast, window predicates
  * pushed into the scan, aggregates partial+final.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    df.count() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("no query plan contains a cartesian product or broadcast nested loop") {
    for ((name, fn) <- SparkEntry.queries) {
      val plan = planOf(fn(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$name has a CartesianProduct")
      // BroadcastNestedLoopJoin is legal only for the deliberate 1-row
      // watermark cross join (a4) — nothing else may fall back to it
      if (name != "a4_watermark_tail")
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name has a nested-loop join")
    }
  }

  test("revenue mart and region summary broadcast their dims") {
    for (name <- Seq("revenue_mart", "j1_region_summary")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"$name does not broadcast: $plan")
      assert(!plan.contains("SortMergeJoin"), s"$name shuffles a joinable dim")
    }
  }

  test("cursor-window predicate pushes into the parquet scan (UTC and ICT)") {
    for (name <- Seq("p4_cursor_window", "p4_cursor_window_ict")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert(plan.contains("PushedFilters") &&
        (plan.contains("GreaterThanOrEqual(ts") || plan.contains("GreaterThanOrEqual(TS")),
        s"$name window predicate not pushed: $plan")
    }
  }

  test("q4 plans a left-semi join; q6's conjunctive filter reaches the scan") {
    val q4 = planOf(SparkEntry.queries("q4_priority_semi")(spark, sf))
    assert(q4.contains("LeftSemi"), s"EXISTS did not decorrelate to a semi join: $q4")
    // the PushedFilters list is length-truncated in plan strings — assert
    // on a prefix that survives the cut
    val q6 = planOf(SparkEntry.queries("q6_forecast_revenue")(spark, sf))
    assert(q6.contains("PushedFilters: [IsNotNull(l_shipdate)") &&
      q6.contains("GreaterThanOrEqual(l_shipda"),
      s"q6 predicates not pushed to the scan: $q6")
  }

  test("q8/q9: every dim probe is broadcast; only fact-fact joins shuffle") {
    val q8 = planOf(SparkEntry.queries("q8_market_share")(spark, sf))
    // part, region, supplier, and BOTH nation roles ride broadcasts;
    // the only sort-merge-eligible joins are lineitem⋈orders⋈customer
    assert("BroadcastHashJoin".r.findAllIn(q8).size >= 4,
      s"q8 dims not broadcast:\n$q8")
    assert("SortMergeJoin".r.findAllIn(q8).size <= 2,
      s"q8 shuffles a dim join:\n$q8")
    val q9 = planOf(SparkEntry.queries("q9_product_profit")(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(q9).size >= 3,
      s"q9 dims not broadcast:\n$q9")
    assert("SortMergeJoin".r.findAllIn(q9).size <= 1,
      s"q9 shuffles a dim join:\n$q9")
  }

  test("q13 left-outer count distribution: outer join preserved, no window, no sort") {
    val plan = planOf(SparkEntry.queries("q13_custdist")(spark, sf))
    assert(plan.contains("LeftOuter"), s"zero-order customers need the outer join:\n$plan")
    assert(!plan.contains("Window"), s"q13 must be two hash aggregates, not a window:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial aggregation:\n$plan")
  }

  test("q17 correlated AVG decorrelates to one per-part aggregate + join") {
    val plan = planOf(SparkEntry.queries("q17_small_qty_revenue")(spark, sf))
    // the rewrite leaves an avg() aggregate joined back on l_partkey —
    // never a per-outer-row re-scan (which would appear as a nested loop)
    assert(plan.contains("avg("), s"decorrelated per-part avg missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q17 fell back to per-row execution:\n$plan")
  }

  test("q21 exists/not-exists chain is semi/anti joins, never a count-filter self-join") {
    val plan = planOf(SparkEntry.queries("q21_waiting_supplier")(spark, sf))
    assert(plan.contains("LeftSemi"), s"EXISTS must be a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must be an anti join:\n$plan")
    // the one aggregate is the final numwait count — a count-filter
    // rewrite would need at least one more aggregate below the joins
    assert("HashAggregate".r.findAllIn(plan).size <= 2,
      s"q21 grew a pre-join counting aggregate:\n$plan")
  }

  test("q22 dormancy is an anti join with the date filter on the build side") {
    val plan = planOf(SparkEntry.queries("q22_dormant_balance")(spark, sf))
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must be an anti join:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") ||
      plan.contains("o_orderdate"), s"date prune missing from the orders side:\n$plan")
  }

  test("q11 global-fraction threshold is one broadcast row, never a per-group recompute") {
    val plan = planOf(SparkEntry.queries("q11_important_stock")(spark, sf))
    // the scalar total runs as its own subquery job and lands in the
    // filter as a literal — no join operator carries the threshold
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"q11 threshold is not a scalar subquery:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q11 threshold fell back to a join:\n$plan")
  }

  test("q15 argmax is a broadcast max-equality join, not a global sort or window") {
    val plan = planOf(SparkEntry.queries("q15_top_supplier")(spark, sf))
    assert(!plan.contains("Window"), s"q15 used a window rank:\n$plan")
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("GlobalLimit"),
      s"q15 used a global sort+limit (drops ties):\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"q15 max row not broadcast:\n$plan")
  }

  test("q16 supplier exclusion is a broadcast anti join over pre-distinct pairs") {
    val plan = planOf(SparkEntry.queries("q16_supplier_relationship")(spark, sf))
    assert(plan.contains("LeftAnti"), s"NOT IN must be an anti join:\n$plan")
    // the distinct reduces the fact before the part join; count distinct
    // expands inside the aggregate, not via a self-join
    assert(!plan.contains("SortMergeJoin"), s"q16 shuffled a broadcastable probe:\n$plan")
  }

  test("q20 correlated-share threshold decorrelates to two aggregates + semi chain") {
    val plan = planOf(SparkEntry.queries("q20_promotion_suppliers")(spark, sf))
    assert(plan.contains("LeftSemi"), s"q20 supplier probe must be semi joins:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q20 fell back to a re-scan form:\n$plan")
  }

  test("contamination broadcasts the eval side; aggregation is partial+final") {
    val plan = planOf(SparkEntry.queries("contamination")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"eval side not broadcast: $plan")
    assert(!plan.contains("SortMergeJoin"), s"shingle join fell back to SMJ: $plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial aggregation: $plan")
  }

  test("repetition filters stay a narrow pruned map (no shuffle, two columns)") {
    val df = SparkEntry.queries("text_repetition")(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), s"narrow map shuffled: $plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to doc_id+text: $plan")
  }

  test("q1 aggregation is partial+final hash aggregate (map-side combine)") {
    val plan = planOf(SparkEntry.queries("q1_agg")(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial aggregation: $plan")
  }

  test("merge upsert is a single key-shuffle full-outer join") {
    val plan = planOf(SparkEntry.queries("m1_guarded_upsert")(spark, sf))
    assert(plan.contains("FullOuter"), "merge lost its full-outer join")
    assert(!plan.contains("CartesianProduct"))
  }

  test("column pruning: projection queries read only needed columns") {
    val plan = planOf(SparkEntry.queries("p8_snake_case")(spark, sf))
    // customer has 5 columns; the query uses 2 — the scan schema must not
    // include the others
    assert(!plan.contains("c_acctbal") && !plan.contains("c_nationkey"),
      s"scan reads pruned columns: $plan")
  }

  test("paragraph dedup shuffles at most thrice: spread, winner hash, doc reassembly") {
    val plan = planOf(SparkEntry.queries("dedup_paragraphs")(spark, sf))
    val n = "Exchange".r.findAllIn(plan).size
    assert(n <= 3, s"paragraph dedup grew a $n-exchange plan:\n$plan")
    assert(plan.contains("Window"), "winner selection must be one window pass")
  }

  test("DSIR selection is a distributed top-k, not a global sort") {
    val plan = planOf(SparkEntry.queries("sample_importance")(spark, sf))
    assert(plan.contains("TakeOrdered"), s"expected TakeOrderedAndProject:\n$plan")
  }

  test("mojibake and NFC queries stay narrow unshuffled maps") {
    for (name <- Seq("text_fix_mojibake", "text_nfc_normalize")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert(!plan.contains("Exchange"), s"$name shuffled a pure map:\n$plan")
    }
  }

  test("curation filters and script mix stay narrow unshuffled maps") {
    for (name <- Seq("c4_line_filter", "gopher_quality_filter", "text_script_mix")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert(!plan.contains("Exchange"), s"$name shuffled a pure map:\n$plan")
    }
  }

  test("BPE encode probes a broadcast id table; hard negatives use no join at all") {
    val enc = planOf(SparkEntry.queries("bpe_encode_ids")(spark, sf))
    assert(enc.contains("BroadcastHashJoin"), s"id probe not broadcast:\n$enc")
    // the ONLY global (partition-free) window in this plan is the token-id
    // numbering, and its input must be the token-VOCABULARY aggregate —
    // bounded at tens of thousands of rows — never the corpus itself. In
    // the plan-string tree a node's inputs print below it, so every
    // Window line must be followed by a HashAggregate descendant before
    // any scan; a vocabulary explosion that widens this input should
    // fail here loudly rather than silently serializing a corpus sort.
    val lines = enc.linesIterator.toVector
    val winIdx = lines.zipWithIndex.collect { case (l, i) if l.contains("Window ") => i }
    assert(winIdx.nonEmpty, s"expected the token-id Window:\n$enc")
    winIdx.foreach { i =>
      val below = lines.drop(i + 1)
      val agg = below.indexWhere(_.contains("HashAggregate"))
      val scan = below.indexWhere(_.contains("FileScan"))
      assert(agg >= 0 && (scan < 0 || agg < scan),
        s"global window input is not the vocabulary aggregate:\n$enc")
    }
    val hn = planOf(SparkEntry.queries("ann_hard_negatives")(spark, sf))
    assert(!hn.contains("Join"), s"anchor expansion must be a Generate, not a join:\n$hn")
    assert(hn.contains("Generate") && hn.contains("Window"), s"expected explode+window:\n$hn")
  }

  test("sketch aggregates are partial+final (map-side combine ships sketches)") {
    for (name <- Seq("score_quantile_sketch", "text_heavy_hitters")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
        s"$name lost partial aggregation:\n$plan")
    }
  }

  test("data card: one band-signature shuffle feeds both dup flags, sketch agg partial+final") {
    val plan = planOf(SparkEntry.queries("corpus_datacard")(spark, sf))
    // ONE row-level exchange (the band-signature hash partitioning both
    // windows share) + the per-source aggregate exchange — r10's shape,
    // with near-dup and quantiles riding for free
    val n = "Exchange".r.findAllIn(plan).size
    assert(n <= 2, s"data card grew a $n-exchange plan:\n$plan")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"token-length sketch lost partial aggregation:\n$plan")
  }

  test("PQ encode is a narrow unshuffled map; ADC top-k never sorts globally") {
    // encode: scan + generate + project only — the codebooks live as
    // plan literals, the argmin is a per-row expression
    val enc = planOf(SparkEntry.queries("ann_pq_encode")(spark, sf))
    assert(!enc.contains("Exchange"), s"PQ encode must not shuffle:\n$enc")
    // ADC: per-partition top-k merged on the driver, no join, no global
    // sort exchange
    val adc = planOf(SparkEntry.queries("ann_pq_topk")(spark, sf))
    assert(adc.contains("TakeOrderedAndProject"),
      s"ADC top-k should be a distributed top-k:\n$adc")
    assert(!adc.contains("SortMergeJoin") && !adc.contains("BroadcastHashJoin"),
      s"ADC scan must not join:\n$adc")
  }

  test("layout scans push the residual into the pruned parquet scan") {
    for (name <- Seq("layout_zonemap_scan", "layout_zorder_scan")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      assert(plan.contains("PushedFilters: [IsNotNull"),
        s"$name residual not pushed into the scan:\n$plan")
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$name aggregate not partial+final:\n$plan")
    }
    // the Morton key itself is a narrow expression — no shuffle at all
    val zk = planOf(SparkEntry.queries("zorder_key")(spark, sf))
    assert(!zk.contains("Exchange"), s"zorder_key must stay narrow:\n$zk")
  }

  test("retention is window-free; anomaly windows only the bounded series key") {
    val ret = planOf(SparkEntry.queries("w_retention")(spark, sf))
    assert(!ret.contains("Window"), s"retention must not window event history:\n$ret")
    assert(ret.contains("BroadcastHashJoin"),
      s"cohort sizes should broadcast:\n$ret")
    val an = planOf(SparkEntry.queries("v_metric_anomaly")(spark, sf))
    // the daily rollup underneath the windows is still partial+final
    assert("HashAggregate".r.findAllIn(an).size >= 2,
      s"anomaly daily rollup lost partial aggregation:\n$an")
  }

  test("span dedup ships only hashes; funnel keeps one logical shuffle key") {
    val sp = planOf(SparkEntry.queries("c4_span_dedup")(spark, sf))
    assert("HashAggregate".r.findAllIn(sp).size >= 2, s"span agg not partial+final:\n$sp")
    val fn = planOf(SparkEntry.queries("w_funnel")(spark, sf))
    assert(!fn.contains("CartesianProduct") && !fn.contains("BroadcastNestedLoopJoin"),
      s"funnel fell off equi-joins:\n$fn")
    // step-1 spine: the plan carries NO distinct over all event users
    // (that was the r10 shape — an extra exchange and an O(all users)
    // join spine) and no window over the event history
    assert(!fn.contains("Window"), s"funnel must not window the history:\n$fn")
    // STATIC plan accounting: step k's subtree re-inlines steps 1..k-1
    // (Catalyst prints shared frames per reference; AQE reuses the
    // identical exchanges it can at runtime), so k=3 steps cost
    // k(k+1)/2 = 6 partial+final pairs in the printout plus one pair
    // for the step-1 spine seed — 14 HashAggregate nodes. More than
    // that means a real extra aggregate appeared.
    val aggs = "HashAggregate".r.findAllIn(fn).size
    assert(aggs <= 14, s"funnel grew beyond one partial+final agg per step:\n$fn")
  }

  test("HLL distinct is partial+final; rolling windows stay two-exchange") {
    val hll = planOf(SparkEntry.queries("distinct_hll")(spark, sf))
    // the register array is the aggregation buffer — it must ship as a
    // map-side partial, never raw keys
    assert("ObjectHashAggregate".r.findAllIn(hll).size >= 2,
      s"HLL lost partial aggregation:\n$hll")
    val roll = planOf(SparkEntry.queries("w_rolling_7d")(spark, sf))
    // one exchange for the daily-grain aggregate, one for the per-key
    // window over the tiny daily series — the raw events shuffle once
    assert("Exchange".r.findAllIn(roll).size <= 2,
      s"rolling features grew extra shuffles:\n$roll")
    assert(roll.contains("Window"), s"expected the RANGE-frame window:\n$roll")
  }

  test("WordPiece greedy walk probes a broadcast vocab, no shuffle join") {
    val wp = planOf(SparkEntry.queries("wp_segment")(spark, sf))
    // the substring-edge expansion joins the role-tagged vocabulary by
    // broadcast; the walk itself is a fold expression with no join at
    // all — a shuffled join here would ship the whole expansion
    assert(wp.contains("BroadcastHashJoin"), s"vocab probe not broadcast:\n$wp")
    assert(!wp.contains("SortMergeJoin"), s"unexpected shuffle join:\n$wp")
  }

  test("unigram Viterbi probes a broadcast vocab; attribution stays on equi-joins") {
    val sp = planOf(SparkEntry.queries("sp_viterbi_segment")(spark, sf))
    // the candidate-piece expansion joins the (tiny) vocabulary by
    // broadcast — a shuffled join here would ship the whole expansion
    assert(sp.contains("BroadcastHashJoin"), s"vocab probe not broadcast:\n$sp")
    assert(!sp.contains("SortMergeJoin"), s"unexpected shuffle join:\n$sp")
    val at = planOf(SparkEntry.queries("w_attribution")(spark, sf))
    // touch↔conversion pairing is the user-key equi-join; credit split
    // is the conversion-id window — no non-equi fallback anywhere
    assert(!at.contains("BroadcastNestedLoopJoin") && !at.contains("CartesianProduct"),
      s"attribution fell off equi-joins:\n$at")
    assert(at.contains("Window"), s"expected the per-conversion window:\n$at")
  }

  test("doc perplexity probes a broadcast word-cost table; no shuffle join") {
    val pp = planOf(SparkEntry.queries("sp_doc_perplexity")(spark, sf))
    // the per-occurrence word→(cost, pieces) probe must broadcast the
    // word-vocab-sized Viterbi table — a shuffled join here would ship
    // the whole exploded corpus; the only corpus-keyed exchange is the
    // final doc_id hash aggregate (partial+final)
    assert(pp.contains("BroadcastHashJoin"), s"word-cost probe not broadcast:\n$pp")
    assert(!pp.contains("SortMergeJoin"), s"unexpected shuffle join:\n$pp")
    assert(pp.contains("partial_sum") || pp.contains("HashAggregate"),
      s"expected hash aggregation:\n$pp")
  }

  test("merge-on-read reconcile is a single key-window over unioned segments") {
    for (name <- Seq("m_merge_on_read", "m_join_view_incremental")) {
      val plan = planOf(SparkEntry.queries(name)(spark, sf))
      // scan-time reconcile: one hash-partitioned exchange feeding the
      // cursor-latest window; no join, no global sort in the read path
      assert(plan.contains("Window"), s"$name lost the reconcile window:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
        s"$name reconcile grew extra shuffles:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name read path must not join:\n$plan")
    }
  }
}

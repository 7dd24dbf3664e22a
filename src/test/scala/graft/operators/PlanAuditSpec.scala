package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Physical-plan regression tests: the properties that make these operators
  * survive a 100× scale-up are asserted, not assumed — predicate/column
  * pushdown reaching the parquet scan, broadcast joins for dimension
  * tables, per-partition top-k instead of a global sort, partial (map-side)
  * aggregation, and whole-stage codegen coverage. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  private def formatted(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q2: filter and projection are pushed to the parquet scan") {
    val plan = formatted("q2_filter_project")
    assert(plan.contains("PushedFilters:") &&
      plan.contains("LessThan(l_quantity,10.0)"),
      s"filter must reach the scan:\n$plan")
    assert(!plan.contains("l_shipdate"),
      "unused columns must be pruned from ReadSchema")
  }

  test("q3: AQE broadcasts the measured-small customer side at fixture scale") {
    val df = graft.SparkEntry.queries("q3_join_agg")(spark, dir)
    df.collect() // AQE finalizes the physical plan lazily
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("BroadcastHashJoin"),
      s"expected AQE to pick a broadcast join at fixture scale:\n$exec")
  }

  test("q3/q10: customer carries NO broadcast() hint — with auto-broadcast " +
    "disabled the customer join degrades to a shuffle join (customer is " +
    "SF-proportional; a pinned hint would OOM the driver at 100 TB)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (q <- Seq("q3_join_agg", "q10_star_join")) {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        df.collect()
        val exec = df.queryExecution.executedPlan.toString
        // q10's fixed-cardinality nation/region keep their hints, so scan
        // per-line: no BroadcastHashJoin may build on the customer key
        val offending = exec.linesIterator
          .filter(_.contains("BroadcastHashJoin"))
          .filter(_.contains("c_custkey")).toSeq
        assert(offending.isEmpty,
          s"$q still broadcasts customer with auto-broadcast off " +
            s"(a forced hint):\n${offending.mkString("\n")}")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q14: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = formatted("q14_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("q1: aggregation is two-phase (map-side partial)") {
    val plan = formatted("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final HashAggregate:\n$plan")
  }

  test("q1: hot path is inside whole-stage codegen") {
    val df = graft.SparkEntry.queries("q1_pricing_summary")(spark, dir)
    df.collect() // AQE finalizes the physical plan lazily
    val exec = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes are WholeStageCodegen spans in the plan toString
    assert(exec.contains("WholeStageCodegen") || exec.contains("*("),
      s"no codegen spans:\n$exec")
  }

  test("v5: top-k aggregate is partial (only k rows per group cross the shuffle)") {
    val plan = formatted("v5_ann_topk_agg")
    assert(plan.contains("partial_top_k"),
      s"expected map-side partial top_k aggregation:\n$plan")
  }

  test("v1: query side of ann top-k is broadcast (corpus never shuffles for the join)") {
    val plan = formatted("v1_ann_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"queries must broadcast:\n$plan")
  }

  test("v22: range search broadcasts the query side and has no window " +
    "(the threshold filter is map-side)") {
    val plan = formatted("v22_range_search")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"queries must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"corpus x corpus is never acceptable:\n${plan.take(1200)}")
    assert(!plan.contains("Window"),
      s"a range query needs no ranking window:\n${plan.take(1200)}")
  }

  test("d4: signature re-attach joins are shuffle joins, never a corpus broadcast") {
    // the two verification joins carry the full signature corpus — the
    // shuffle_hash hint pins them to shuffled hash joins (candidate list
    // as build side; no corpus-wide sorts) at every scale: broadcasting a
    // corpus-sized table OOMs the driver at 100 TB. Any remaining
    // BroadcastHashJoin is Catalyst's size-based choice on the tiny
    // fixture (band self-join), not a pinned broadcast().
    val plan = formatted("d4_minhash_lsh")
    assert("ShuffledHashJoin".r.findAllIn(plan).size >= 2,
      s"d4 re-attach joins must be shuffled hash joins:\n$plan")
  }

  test("v3: one band self-join plus the two stop-bucket attachments — " +
    "no re-attach pass over the corpus") {
    // the vector rides through the band join and cosine filters collisions
    // immediately; the only other joins are the occupancy-cap join-backs
    // (cool-bucket set attached to each self-join side — d3's df-cap
    // shape). A 4th join would mean a candidate re-attach crept back in.
    val plan = formatted("v3_ann_lsh")
    // count join operator nodes in the numbered detail section (each node
    // appears once there; the tree rendering above repeats the names)
    assert("""(?m)^\(\d+\) \w*Join""".r.findAllIn(plan).size == 3,
      s"v3 must have the band self-join + 2 cap attachments:\n$plan")
  }

  test("v4: cell assignment is map-side — no window, top-k is partial aggregate") {
    val plan = formatted("v4_ann_ivf")
    assert(!plan.contains("Window"),
      s"assignment must be a HOF argmin, not join+window:\n$plan")
    assert(plan.contains("partial_top_k"),
      s"final top-k must be the mergeable aggregate:\n$plan")
  }

  test("v7: quantized top-k keeps v5's shape — queries broadcast, partial top-k") {
    val plan = formatted("v7_ann_quantized")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"queries must broadcast:\n$plan")
    assert(plan.contains("partial_top_k"),
      s"only k pairs per query may cross the shuffle:\n$plan")
  }

  test("q26: interval join is an equi-join on user_id, never a cartesian") {
    val plan = formatted("q26_interval_join")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"range condition must ride an equi-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join degenerated to a product:\n$plan")
  }

  test("p10: chunking is narrow map work — only the final sort exchanges") {
    val df = graft.SparkEntry.queries("p10_chunking")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"chunk explode/digest must not shuffle:\n$plan")
  }

  test("d8: span audit has no self-join — per-doc aggregation only") {
    // d3's pair generation is quadratic-prone and needs the df cap; d8 by
    // construction is linear: the only join allowed is the df-table
    // re-attach on h (AQE-skew-splittable — a count-over-window by h
    // would pin each hot shingle to one unsplittable task at scale) —
    // never a doc×doc pair join
    val plan = formatted("d8_duplicate_spans")
    assert("""(?m)^\(\d+\) \w*Join""".r.findAllIn(plan).size == 1,
      s"d8 must have exactly the df re-attach join:\n$plan")
  }

  test("d3: the pairwise BUILD reuses the shingle-index exchange; the " +
      "registry query reads the persisted pair index") {
    // the build path (store miss) runs the inverted-index self-join:
    // rareShingles appears three times (both join sides + per-doc
    // sizes); its scan→explode→exchange subplan is identical each time,
    // so AQE must materialize that stage ONCE and reuse it — not
    // re-explode the corpus three times. Stage reuse only shows in the
    // post-execution adaptive plan, hence the action first.
    val build = Dedup.computePairCandidates(spark, dir)
    build.collect()
    val bplan = build.queryExecution.executedPlan.toString
    assert(bplan.contains("isFinalPlan=true"), s"plan did not finalize:\n$bplan")
    assert(bplan.contains("ReusedExchange") || bplan.contains("ReusedQueryStage"),
      s"the shingle index must be computed once, not per consumer:\n$bplan")
    // the registry query itself consumes the persisted index: a parquet
    // scan, no shingle explode, no self-join
    val served = graft.SparkEntry.queries("d3_jaccard_pairs")(spark, dir)
    val splan = served.queryExecution.executedPlan.toString
    assert(splan.contains("Scan parquet"),
      s"d3 must serve from the persisted pair index:\n${splan.take(800)}")
    assert(!splan.contains("shingle_hashes"),
      s"no shingle recompute on the serve path:\n${splan.take(800)}")
  }

  test("q37: grouping sets are ONE Expand pass over one scan, not " +
      "unioned per-level scans") {
    val plan = formatted("q37_grouping_sets")
    assert(plan.contains("Expand"), s"expected an Expand node:\n$plan")
    assert("""(?m)^\(\d+\) Scan parquet""".r.findAllIn(plan).size == 1,
      s"grouping sets must read the table once:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"aggregate must be two-phase:\n$plan")
  }

  test("q38: nullable NOT IN plans as a null-aware anti-join") {
    // a plain LeftAnti cannot express three-valued NOT IN; Spark must
    // pick the null-aware variant for the nullable single-column case.
    // The flag is the trailing boolean of BroadcastHashJoin's simple
    // string (formatted mode does not surface it).
    val df = graft.SparkEntry.queries("q38_not_in_nulls")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert("""BroadcastHashJoin .*LeftAnti, BuildRight, .*true""".r
      .findFirstIn(plan).isDefined,
      s"expected a null-aware anti-join for the nullable NOT IN:\n$plan")
  }

  test("q29: explicit pivot values compile to one conditional aggregate, " +
      "no Expand") {
    val plan = formatted("q29_pivot")
    assert(!plan.contains("Expand"),
      s"pivot with explicit values must not expand rows:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"pivot aggregate must be two-phase:\n$plan")
  }

  test("p12: quota join is broadcast — corpus never shuffles for quotas") {
    val plan = formatted("p12_mixture_sample")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 5-row quota table must broadcast:\n$plan")
  }

  test("q31: correlated subqueries de-correlate into joins") {
    // EXISTS -> left semi, NOT EXISTS -> left anti, scalar COUNT ->
    // aggregate + outer join. If any subquery survived to the physical
    // plan, the 100 TB execution would be a per-row re-scan of orders.
    val plan = formatted("q31_exists_subquery")
    assert(!plan.toLowerCase.contains("subquery"),
      s"subquery must be de-correlated:\n$plan")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected semi+anti joins from EXISTS/NOT EXISTS:\n$plan")
  }

  test("q33: posexplode fans out with no shuffle before the final sort") {
    val df = graft.SparkEntry.queries("q33_posexplode")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"generator must not introduce exchanges beyond the ORDER BY:\n$plan")
    assert(plan.contains("Generate"), s"expected a Generate node:\n$plan")
  }

  test("p14: bloom probe is join-free — corpus only exchanges for its own count") {
    // registry row = the md5 twin: the bit array rides in the native
    // probe's references (r13 — the per-conjunct 128 KB array LITERALS
    // made a ~1.5 MB expression tree that every AQE re-optimization
    // re-walked) and the probe is one codegen'd k-probe loop, map-side
    val df = graft.SparkEntry.queries("p14_bloom_contamination")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"the bloom bits must probe map-side, not join:\n$plan")
    assert(plan.contains("bloom_bits_probe"),
      s"expected the native bit-array probe:\n${plan.take(1200)}")
    assert(plan.length < 100000,
      s"p14's plan blew up again (${plan.length} chars) — a bit-array " +
        "literal is back in the expression tree")
    // the production family keeps the codegen'd BloomFilterMightContain
    val prod = graft.operators.Pipeline.p14BloomContamination(spark, dir)
    val pplan = prod.queryExecution.executedPlan.toString
    assert(!pplan.contains("Join") && pplan.contains("might_contain"),
      s"production bloom must stay the join-free might_contain probe:\n" +
        pplan.take(1200))
  }

  test("t8: vocab joins the corpus tokens via broadcast") {
    // the vocabulary is langs×k rows by construction — if it ever rode a
    // shuffle join, the corpus-side token explode would exchange too
    val plan = formatted("t8_oov_rate")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast to the token stream:\n$plan")
  }

  test("q40/q41: one co-partitioned exchange feeds each windowed timeline") {
    // both window phases key on user_id: lag→filter→lead (q40) and the
    // range frame (q41) must reuse ONE hash exchange — a second exchange
    // would mean the sort/partitioning was thrown away mid-plan
    Seq("q40_scd2", "q41_range_frame").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"$name: expected exactly one keyed exchange, got $exchanges:\n" +
          plan.take(800))
    }
  }

  test("p20: stratum index attaches via broadcast; no global corpus window") {
    val df = graft.SparkEntry.queries("p20_interleave")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the S-row strata table must broadcast:\n${plan.take(800)}")
    // the only windows are the per-stratum rank (keyed) and the bounded
    // strata-table index; the corpus itself must never sort in one task:
    // its window partitioning must mention the stratum key
    assert("Window \\[row_number".r.findAllIn(plan).size <= 2,
      s"unexpected extra windows:\n${plan.take(800)}")
  }

  test("q42: the merge matrix runs on a co-partitioned sort-merge " +
      "full-outer join — no broadcast assumption on either side") {
    val plan = formatted("q42_merge_upsert")
    // at 100 TB both the snapshot and the change feed are large: the
    // merge join must be a key-partitioned SMJ, never a broadcast
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"q42: expected full-outer sort-merge join:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q42: unbounded join shape:\n${plan.take(1200)}")
    // latest-per-key is an aggregate (struct-max compiles to a partial+
    // final SortAggregate pair — max over a struct is not hash-able),
    // not a rank window over every key's full history
    assert("(Hash|Sort|ObjectHash)Aggregate".r.findAllIn(plan).size >= 2,
      s"q42: latest-change reduction must partial-aggregate:\n" +
        plan.take(1200))
    assert(!plan.contains("Window"),
      s"q42: no window over the change feed:\n${plan.take(1200)}")
  }

  test("q43: the diff derives from ONE changelog→snapshot equi-join — " +
      "the merged snapshot is never materialized or re-shuffled") {
    val plan = formatted("q43_snapshot_diff")
    // r13 restructure: diff(before, merge(before, latest)) computed
    // directly from before ⋈ latest. Exactly one join (the r12 shape
    // chained two full-outers), equi-keyed — the planner is free to
    // broadcast the changelog side when it fits (zero snapshot shuffle
    // at 100 TB) or sort-merge when it does not; never unbounded
    // formatted output names each operator in the tree AND the details
    // section — match the numbered detail header so one join counts once
    assert("""\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)""".r
      .findAllIn(plan).size == 1,
      s"q43: expected exactly one equi-join:\n${plan.take(1200)}")
    assert(!plan.contains("FullOuter"),
      s"q43: merged-snapshot full-outer chain is back:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q43: unbounded join shape:\n${plan.take(1200)}")
    // one snapshot scan (the r12 shape scanned customer twice)
    assert(plan.linesIterator.count(l =>
      l.contains("customer.parquet")) == 1,
      s"q43: snapshot must be scanned once:\n${plan.take(1200)}")
    assert("(Hash|Sort|ObjectHash)Aggregate".r.findAllIn(plan).size >= 2,
      s"q43: latest-change reduction must partial-aggregate:\n" +
        plan.take(1200))
    assert(!plan.contains("Window"),
      s"q43: no window over the change feed:\n${plan.take(1200)}")
  }

  test("p22: novelty re-attach is an equi-join on the gram key — no " +
      "self-join of documents, no corpus window") {
    val plan = formatted("p22_novelty")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"unbounded join in the novelty pass:\n${plan.take(1200)}")
    assert(!plan.contains("Window"),
      s"first-occurrence must be min-aggregation, not a window:\n" +
        plan.take(1200))
    // the re-attach is an equi-join on the 8-byte gram key; the
    // first-seen side arrives pre-aggregated (one row per gram, never
    // the raw gram stream joined against itself). Two corpus scans are
    // the deliberate p4/d8 trade — each side's projection pushes to its
    // own scan, which beats caching the full gram explode at scale.
    assert(plan.contains("partial_min") || plan.contains("min(doc_id"),
      s"first-seen side must aggregate before the join:\n${plan.take(1200)}")
  }

  test("v14: the N×C distance expansion never shuffles — centroids ride " +
      "one broadcast row") {
    val df = graft.SparkEntry.queries("v14_silhouette")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid row must attach via broadcast:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"),
      s"corpus-side cartesian in the distance pass:\n${plan.take(800)}")
  }

  test("p24: the reference distribution attaches via broadcast — corpus " +
      "tokens shuffle once, for their own counts") {
    val df = graft.SparkEntry.queries("p24_drift_audit")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"ref histogram must broadcast:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("p23: the percentile sketch aggregates in two phases (partial " +
      "map-side), like every mergeable sketch here") {
    val df = graft.SparkEntry.queries("p23_approx_percentiles")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_percentile") ||
      "ObjectHashAggregate.*approx_percentile".r.findFirstIn(plan).isDefined,
      s"sketch must partial-aggregate before the exchange:\n${plan.take(1200)}")
  }

  test("v17: delta assignment is map-side against one broadcast centroid " +
      "row — no join, no shuffle of vectors") {
    val df = graft.SparkEntry.queries("v17_index_delta")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroids must ride one broadcast row:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // the only shuffle join allowed is the final full-outer on cent_id —
    // the C-row audit merge, never the vectors
    val smj = "SortMergeJoin \\[([a-z_]+)#".r.findAllMatchIn(plan)
      .map(_.group(1)).toSet
    assert(smj.subsetOf(Set("cent_id")),
      s"shuffle join on non-audit keys $smj:\n${plan.take(800)}")
  }

  test("q45: the recursive step joins the frontier, not a cartesian") {
    val df = graft.SparkEntry.queries("q45_recursive_depth")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"),
      s"recursive CTE must compile to UnionLoop:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q46: intervals stream once past a broadcast probe grid — no " +
    "interval self-join, no per-probe rescan") {
    val plan = formatted("q46_asof_state")
    // the range predicate against the ≤7-row probe side compiles to a
    // broadcast nested loop — the linear shape; a CartesianProduct or a
    // second events Window pass would be the scale bugs
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast NLJ against the probe grid:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t13: vocabulary ranking is TakeOrdered partial top-k, not a " +
    "global sort of the vocabulary") {
    val plan = formatted("t13_zipf_checkpoints")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject at k=ZipfMaxRank:\n${plan.take(1200)}")
  }

  test("p29: the composed pipeline fuses into one DAG — exactly one " +
    "global sort (the final ORDER BY), intermediate stage sorts eliminated") {
    val plan = formatted("p29_full_prep")
    val globalSorts = "rangepartitioning".r.findAllIn(plan).length
    assert(globalSorts == 1,
      s"expected ONE range exchange (stage orderBys must fuse away), " +
        s"got $globalSorts:\n${plan.take(1500)}")
  }

  test("v20: the label constraint is the join key — a broadcast " +
    "equi-join feeds the distance math, not a filtered nested loop") {
    val plan = formatted("v20_ann_filtered")
    assert(plan.contains("BroadcastHashJoin"),
      s"label-filtered ANN must equi-join on label:\n${plan.take(1200)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the filter must not degrade to a scored-then-filtered cross:\n${
        plan.take(1200)}")
  }

  test("q47: the correlated LATERAL LIMIT subquery decorrelates to one " +
    "windowed rank — no per-outer-row re-execution, no cartesian") {
    val plan = formatted("q47_lateral_topk")
    assert(plan.contains("Window"),
      s"expected DecorrelateInnerQuery to rewrite the lateral into a " +
        s"window rank:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("t14: collocation ranking is TakeOrdered partial top-k and the " +
    "unigram re-attach is a shuffle join, never a vocabulary broadcast") {
    val plan = formatted("t14_pmi_collocations")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject at k=PmiTopK:\n${plan.take(1200)}")
    // the only broadcast allowed is the 1-row total; the unigram table
    // joins on token keys (unbounded vocabulary at corpus scale) — the
    // shuffle_hash hint pins that against small fixture size estimates
    assert(plan.contains("ShuffledHashJoin"),
      s"unigram counts must re-attach via a shuffle join:\n${plan.take(1200)}")
  }

  test("m7/m9: perceptual-dedup candidate generation is equi-join only — " +
    "no cartesian, no nested loop (the banding IS the pruning)") {
    Seq("m7_image_phash", "m9_video_phash").foreach { q =>
      val plan = formatted(q)
      assert(!plan.contains("CartesianProduct"),
        s"$q grew a cartesian:\n${plan.take(1200)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q grew a nested loop:\n${plan.take(1200)}")
    }
  }

  test("m8: candidates come from a hash equi-join and the waveform cache " +
    "re-attaches via the hinted shuffle joins — no cartesian") {
    val plan = formatted("m8_audio_fingerprint")
    assert(plan.contains("ShuffledHashJoin"),
      s"waveforms must re-attach via the hinted shuffle join (payload-" +
        s"sized rows must never broadcast):\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"m8 grew a non-equi join:\n${plan.take(1200)}")
  }

  test("p26: fitted quota table attaches to the corpus via broadcast") {
    val plan = formatted("p26_temperature_mixture")
    assert(plan.contains("BroadcastHashJoin"),
      s"quota table must broadcast:\n${plan.take(1200)}")
  }

  test("p30: the ranking window partitions by (bucket, block) — the " +
    "corpus never funnels through per-bucket-global or single partitions") {
    val plan = formatted("p30_length_buckets")
    // formatted mode puts the spec on the node's Arguments: line
    assert("""windowspecdefinition\(bucket#\d+L?, block#\d+L?""".r
      .findFirstIn(plan).isDefined,
      s"row_number must partition by (bucket, block):\n${plan.take(1200)}")
    assert(!plan.contains("SinglePartition") ||
      !plan.linesIterator.exists(l =>
        l.contains("Exchange SinglePartition") && !l.contains("max(doc_id")),
      s"corpus-wide single partition:\n${plan.take(1200)}")
    // one range exchange: the final ORDER BY over the aggregated batches
    assert("rangepartitioning".r.findAllIn(plan).size == 1,
      s"only the final batch sort may range-partition:\n${plan.take(1200)}")
  }

  test("v18: Hamming shortlist is a partial top-k over broadcast query " +
    "codes; no cartesian anywhere") {
    val plan = formatted("v18_ann_binary")
    assert(plan.contains("partial_top_k"),
      s"expected mergeable top-k partials:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan regression guards: every query in [[SparkEntry.queries]] must keep
 * the physical-plan properties its scaladoc claims. Correctness is the
 * oracle's job; THIS spec pins the scale properties — a refactor that
 * silently turns an equi-join into a Cartesian product or drops a pushed
 * filter still passes the oracle at sf0.01, and only blows up at 100 TB.
 */
class PlanGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4,2]")
    .appName("plan-guard")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    try spark.stop()
    finally super.afterAll()
  }

  test("bench sessions run with AQE skew-split armed for the gram-keyed shuffles") {
    // Bench.scala enables spark.sql.adaptive.enabled; skew-join splitting
    // must then resolve ON so a hot gram/shingle partition in the q93 hit
    // join (or any SMJ the optimizer picks for the dedup pair joins at
    // scale) gets divided instead of stalling one task. scale_check5
    // measures the injected-skew behavior; this pins the config so a
    // future conf change cannot silently disarm it.
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  /** Queries whose plan legitimately contains a broadcast-nested-loop join —
   * all are keyless crosses whose broadcast side is provably tiny:
   * q27 broadcasts a literal 1-row query vector; q19/q45 cross an hourly
   * spine with the distinct event-type set (5 rows) to materialize gaps;
   * q53 crosses the scored terms with the 1-row corpus-size aggregate
   * (the in-plan N that replaces a separate count() action). q70's bloom
   * bitmap rides in as a scalar subquery, not a join, so it needs no
   * entry here. */
  private val bnljAllowed = Set(
    "q27_knn_bruteforce", "q19_resample_gapfill", "q45_interpolate",
    "q53_tfidf_topterms", "q71_mixture_sample", "q83_unigram_surprisal",
    // q26 crosses the per-occurrence gram table with the 1-row corpus-count
    // aggregate (the r9 scaled df cap's in-plan N — same pattern as q53)
    "q26_dedup_ngram_jaccard",
    // q110 crosses the query-term hits with the 1-row (T, N) totals
    // aggregate — the q53/q83 in-plan-N pattern; q111 fuses q110's ranking
    // so it inherits the same crossJoin
    "q110_bm25_topk", "q111_rrf_fusion",
    // 16-row broadcast centroid table crossed onto every vector: the IVF
    // assignment IS a deliberate tiny-broadcast nested loop (arg-min over
    // the centroid set per row)
    "q75_ann_ivf_topk",
    // q88 runs the same IVF assignment as q75 before its pair join
    "q88_semantic_dedup",
    // q94 broadcasts the 20-row query batch onto the corpus scan
    "q94_knn_batch",
    // q119 broadcasts the 8-row query panel onto the corpus scan (the q94
    // pool shape) before its label exclusion
    "q119_hard_negatives",
    // q105 broadcasts the 8-row query panel onto the corpus scan (exact
    // leg) and the 16-row centroid table onto the panel (probe selection);
    // q122 runs the same two legs with ranks kept
    "q105_ann_recall", "q122_ann_rank_eval",
    // q99 runs the same IVF assignment as q75/q88 before its ADC scoring
    "q99_ivfpq_search")

  // Merge joins whose BOTH sides are aggregate outputs already
  // hash-partitioned on the join key (stage frontiers, per-cell thresholds,
  // cluster labels): the SMJ adds ZERO exchanges, and at 100 TB — where
  // these relations are keyspace-sized, not corpus-sized — merging
  // co-partitioned inputs beats broadcasting them. Whether AQE picks SMJ or
  // demotes to broadcast here varies with sf/parallelism (sf0.01 audit:
  // only q79 retains it); both outcomes are correct, so all three are
  // allowlisted rather than pinned to one environment's choice.
  private val smjAllowed = Set("q79_funnel", "q71_mixture_sample", "q60_dedup_clusters",
    // q88's within-cluster pair join: BOTH sides are the corpus keyed by
    // bucket id — at 100 TB each vector must move once to its cluster's
    // partition and neither side can broadcast, so a shuffle/merge join on
    // bucket is exactly the intended scale shape (AQE may still demote to
    // broadcast at tiny sf; both outcomes are correct)
    "q88_semantic_dedup",
    // q111's FULL OUTER fusion join: Spark has no broadcast strategy for
    // full-outer, so SMJ is the only shape — over two <= poolK(50)-row
    // ranking relations, size-bounded by construction
    "q111_rrf_fusion",
    // q114's documents-LEFT-JOIN-labels: the cluster-label side derives
    // from q60's ITERATIVE persisted loop (AQE sees no reliable stats) and
    // at 100 TB it is O(paired docs) — potentially corpus-sized, so an SMJ
    // on doc_id is the scale-correct shape and a forced broadcast would be
    // the bug; AQE may still demote at tiny sf, both outcomes correct
    "q114_cluster_balanced_sample",
    // q115's FULL OUTER fusion join, like q111's, has no broadcast
    // strategy — and unlike q111 BOTH sides here are corpus-sized ranking
    // relations (that is the point of the corpus-scale variant), so the
    // shuffle/merge on doc_id is the only scale-correct shape
    "q115_rrf_corpus",
    // q116: same corpus-sized FULL OUTER fusion shape as q115, lexical
    // ranks against dense ranks
    "q116_hybrid_retrieval",
    // q117/q118: the lexical leg (and q118's embedded q116 pool build) is
    // the same corpus-sized FULL OUTER fusion — one side is always the
    // unbroadcastable corpus rank relation
    "q117_hybrid_ann",
    "q118_diverse_rerank",
    // q119's plan STRING renders the pinned cluster-label table's cached
    // lineage (q60's iterative-loop SMJs, allowed above); the LIVE tree's
    // label joins are broadcast left-semi + left-outer, pinned in the
    // dedicated q119 guard below
    "q119_hard_negatives",
    // q120's labels-JOIN-quality: both sides potentially corpus-sized
    // (labels O(paired docs), quality O(corpus)) — the q114 stance: SMJ on
    // doc_id is the scale-correct shape, a forced broadcast would be the bug
    "q120_canonical_by_quality",
    // q128's election join (labels-JOIN-quality) and loner anti-join
    // (documents-ANTI-labels) are q120's exact shape over the cross-modal
    // label table: both sides potentially corpus-sized, SMJ on doc_id is
    // the scale-correct shape
    "q128_crossmodal_dedup")

  test("no query plans a Cartesian product; BNLJ/SMJ only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)
      // SMJ in the INITIAL plan is routinely converted to broadcast by AQE
      // once runtime sizes are known; only an SMJ that survives EXECUTION
      // counts. Execute only the (few) suspects, keeping the test cheap.
      val smj = plan.contains("SortMergeJoin") && !smjAllowed(name) && {
        val d = fn(spark, dir)
        d.collect()
        d.queryExecution.executedPlan.toString.contains("SortMergeJoin")
      }
      if (cart || bnlj || smj) Some(s"$name cartesian=$cart bnlj=$bnlj smj=$smj") else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("filters and projections reach the parquet scan") {
    // q03: predicate pushdown — the scan itself must carry the filters
    val p03 = SparkEntry.queries("q03_filter_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p03.contains("PushedFilters: [IsNotNull(event_type), IsNotNull(value), EqualTo(event_type,purchase)")
      || p03.contains("EqualTo(event_type,purchase)"), s"q03 lost pushdown:\n$p03")
    // q20: column pruning — a 2-column text query must not read the
    // events-wide schema; ReadSchema should mention only what it needs
    val p20 = SparkEntry.queries("q20_text_tokens")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p20.contains("ReadSchema: struct<doc_id:bigint,text:string>"), s"q20 reads extra columns:\n$p20")
  }

  test("broadcast-eligible dimension joins broadcast (q08, q12)") {
    for (q <- Seq("q08_join_broadcast", "q12_tpch3_topk")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q does not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q fell back to SMJ at dimension scale:\n$plan")
    }
  }

  test("top-k queries avoid a global sort (TakeOrderedAndProject)") {
    val plan = SparkEntry.queries("q12_tpch3_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"q12 global-sorts for a LIMIT:\n$plan")
  }

  test("q26 df annotation stays an agg+join, never a window over g (r8)") {
    // The window formulation concentrates every occurrence of a gram into
    // one task's window partition — unsplittable by AQE, superlinear on
    // corpus-wide hot grams (BENCH_NOTES r8: 3.1 s at 30x -> 24.0 s at
    // 100x). The shipped shape partial-aggregates df and equi-joins it
    // back; a refactor that reintroduces the window passes the oracle and
    // only blows up at scale, so pin it here.
    val plan = SparkEntry.queries("q26_dedup_ngram_jaccard")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q26 reintroduced a window over g:\n$plan")
  }

  test("surprisal/tfidf corpus pass is shared via the persisted per-doc aggregate (r8)") {
    // Without the persist the c2/c1/tf branches recompile the full
    // tokenize+explode lineage and run as CONCURRENT broadcast-stage
    // futures (three corpus scans racing; BENCH_NOTES r8). The persisted
    // relation shows up as InMemoryTableScan in every branch.
    for (q <- Seq("q53_tfidf_topterms", "q83_unigram_surprisal", "q89_bigram_surprisal")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), s"$q lost the shared corpus pass:\n$plan")
      spark.catalog.clearCache() // do not leak the persist into other guards
    }
  }

  test("IVF assignment stays the map-only argmin kernel (r8): q75 plans zero exchanges") {
    // The crossJoin + min_by formulation degrades to SortAggregate over all
    // n*k rows (BENCH_NOTES r8 part E: 52 s at 60k x 480, quadratic under
    // the k-proportional-to-n law). With the ivf_argmin expression the
    // whole search is scan -> filter -> argmin -> TakeOrdered: no join, no
    // exchange, no aggregate. Pin that a refactor cannot reintroduce the
    // join shape.
    val df = SparkEntry.queries("q75_ann_ivf_topk")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q75 reintroduced an exchange:\n$plan")
    assert(!plan.contains("NestedLoopJoin"), s"q75 reintroduced the centroid join:\n$plan")
    assert(!plan.contains("SortAggregate"), s"q75 reintroduced the sort aggregate:\n$plan")
  }

  test("q118 label join: broadcast LEFT-SEMI prefilter, labels never shuffle (r15)") {
    // VERDICT r14 #1: the r14 right-outer form hinted broadcast(pool) on
    // the PRESERVED side — a plan Spark cannot build (BHJ is build-left
    // only for RightOuter), so the hint was silently ignored and the
    // corpus-sized label table either broadcast (test scale, AQE) or
    // SMJ-shuffled (100 TB). Pin the fixed shape: the label table meets
    // the pool ONLY through a broadcast LeftSemi (BuildRight — the label
    // side streams map-side, zero shuffle), and the only SMJs in the plan
    // are the embedded q116 FullOuter fusion merges, which have no
    // broadcast strategy by join type.
    // tree-API traversal, not the plan STRING: the string renders the
    // pinned pool/label tables' cached lineages (InMemoryRelation
    // children), whose internal q60/q116 SMJs are allowed and not
    // re-executed here — only joins in the live tree count.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    def liveJoins(p: SparkPlan): Seq[(String, String)] = p.collect {
      case a: AdaptiveSparkPlanExec => liveJoins(a.executedPlan)
      case j: SortMergeJoinExec => Seq(("SMJ:" + j.joinType.toString, ""))
      case j: BroadcastHashJoinExec =>
        Seq(("BHJ:" + j.joinType.toString, j.buildSide.toString))
    }.flatten
    val joins = liveJoins(
      SparkEntry.queries("q118_diverse_rerank")(spark, dir).queryExecution.executedPlan)
    assert(joins.contains(("BHJ:LeftSemi", "BuildRight")),
      s"q118 lost the broadcast left-semi label prefilter: $joins")
    assert(!joins.exists(_._1.contains("RightOuter")),
      s"q118 reintroduced the right-outer label join: $joins")
    assert(joins.forall(j => !j._1.startsWith("SMJ") || j._1.contains("FullOuter")),
      s"q118 SMJ outside the FullOuter fusion merge (label side shuffles at scale): $joins")
    spark.catalog.clearCache() // release the q118 pool pin
  }

  test("q119 label joins: broadcast left-semi prefilter + broadcast lookups, live tree SMJ-free (r15)") {
    // same stance as the q118 guard: the plan STRING renders the pinned
    // label table's cached q60 lineage, so pin the LIVE tree via the node
    // API — the corpus-sized label table must meet the mined pool only
    // through a broadcast LeftSemi (labels stream map-side), the cluster
    // lookups are broadcast left-outers, and no SMJ executes live.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    def liveJoins(p: SparkPlan): Seq[(String, String)] = p.collect {
      case a: AdaptiveSparkPlanExec => liveJoins(a.executedPlan)
      case j: SortMergeJoinExec => Seq(("SMJ:" + j.joinType.toString, ""))
      case j: BroadcastHashJoinExec =>
        Seq(("BHJ:" + j.joinType.toString, j.buildSide.toString))
    }.flatten
    val joins = liveJoins(
      SparkEntry.queries("q119_hard_negatives")(spark, dir).queryExecution.executedPlan)
    assert(joins.contains(("BHJ:LeftSemi", "BuildRight")),
      s"q119 lost the broadcast left-semi label prefilter: $joins")
    assert(!joins.exists(_._1.startsWith("SMJ")),
      s"q119 live tree grew an SMJ (label side shuffles at scale): $joins")
    spark.catalog.clearCache() // release the q119 pool pin
  }

  test("q61 decontaminate broadcasts the test side (shingle join stays hash)") {
    // sf0.001 under AQE degenerates to empty-relation propagation, which
    // hides the join; pin the INTENDED shape from the initial plan instead:
    // a broadcast hash join whose build side is the (small) test-shingle arm.
    val plan = SparkEntry.queries("q61_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"q61 lost its broadcast join:\n$plan")
    assert(plan.contains("BuildRight"), s"q61 builds on the wrong (train) side:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"q61 shuffles the 100TB train side:\n$plan")
  }
}

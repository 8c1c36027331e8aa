package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.sources.whisper.WhisperScan

/**
 * Removes a global `ORDER BY timestamp [ASC]` — and the range-partitioning
 * shuffle under it — when the data already arrives in that order from a
 * whisper scan.
 *
 * The reference's `to_frame()` always returns a chronologically sorted
 * series (`/root/reference/whisper_pandas.py:212-216`), so
 * `read -> orderBy(timestamp)` is the most common whisper query shape. With
 * `timeSort=true` (the default) each scan partition — one archive — is
 * emitted in ascending-timestamp order via the ring rotation, and a
 * single-archive read is therefore already *globally* sorted. Spark cannot
 * see this on its own: a global sort requires `OrderedDistribution`, so the
 * planner puts `Exchange rangepartitioning` (plus its row-sampling pass)
 * under the `Sort` regardless of the scan's `SupportsReportOrdering`, and
 * the physical `RemoveRedundantSorts` never fires because the exchange
 * destroys the reported ordering first. At 100 TB that is two full passes
 * over every matching point (sample + shuffle) plus the sort itself.
 *
 * This rule runs in AQE's query-stage preparation, after
 * `EnsureRequirements` has materialized the exchange, and rewrites
 *
 * {{{ Sort(ts ASC, global) +- Exchange(rangepartitioning(ts)) +- child }}}
 *
 * to `child` when ALL of:
 *  - the sort key is exactly one column: the scan's non-nullable `timestamp`
 *    attribute, ascending (null ordering is irrelevant for a non-nullable
 *    column; a single key is required because ties between equal timestamps
 *    are not broken by the scan);
 *  - every node between exchange and scan is order-preserving and
 *    deterministic (Project/Filter) and passes `timestamp` through
 *    unchanged;
 *  - the scan's partition concatenation is globally ordered
 *    ([[graft.sources.whisper.WhisperScan.globallyOrderedPartitions]]):
 *    either exactly one input partition (the per-partition `timeSort`
 *    guarantee is then a global one), or — since r10 — one oversized
 *    archive's rotation-ordered chunks whose planned time windows tile
 *    disjointly; in the chunked case the rewrite swaps in a
 *    window-ENFORCING scan copy, so the claim is runtime-checked, never
 *    trusted. Multi-archive/multi-file scans interleave partitions and
 *    keep their sort.
 *
 * Injected via [[graft.GraftExtensions]] (`injectQueryStagePrepRule`).
 * Logical-level injection points don't work here: `injectPreCBORule` runs
 * before `V2ScanRelationPushDown` (no scan to inspect yet), and
 * `injectOptimizerRule` earlier still.
 */
case class WhisperSortElision(session: SparkSession) extends Rule[SparkPlan] {

  override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
    case SortExec(Seq(SortOrder(attr: Attribute, Ascending, _, _)), true, ex: ShuffleExchangeExec, _)
        if attr.name == "timestamp" &&
          ex.outputPartitioning.isInstanceOf[RangePartitioning] &&
          globallyOrdered(ex.child, attr) =>
      // Multi-chunk scans (one oversized archive split into rotation-ordered
      // chunks) carry their order as a CLAIM backed by planned per-chunk time
      // windows; before trusting it, swap in the window-enforcing scan copy
      // so a ring that violates the dense-rotation invariant fails loudly at
      // read instead of silently emitting misordered rows. Single-partition
      // scans need no enforcement: the reader fully sorts its partition.
      ex.child.transformUp {
        case b: BatchScanExec =>
          b.scan match {
            case ws: WhisperScan if ws.planInputPartitions().length > 1 =>
              b.copy(scan = ws.withWindowEnforcement)
            case _ => b
          }
      }
  }

  /** Is `plan`'s output — partitions concatenated in index order — already
   * globally ordered by ascending `attr`? */
  private def globallyOrdered(plan: SparkPlan, attr: Attribute): Boolean = plan match {
    case ProjectExec(projectList, child) =>
      projectList.forall(_.deterministic) &&
        child.outputSet.contains(attr) && globallyOrdered(child, attr)
    case FilterExec(condition, child) =>
      condition.deterministic && globallyOrdered(child, attr)
    case b: BatchScanExec =>
      b.scan match {
        case ws: WhisperScan =>
          b.output.exists(_.semanticEquals(attr)) &&
            // one sorted partition, or one archive's rotation-ordered chunks
            // with disjoint tiled windows (checked at read, see apply above)
            ws.globallyOrderedPartitions
        case _ => false
      }
    case _ => false
  }
}

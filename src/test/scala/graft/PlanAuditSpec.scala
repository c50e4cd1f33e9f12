package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Plan-shape regression guard over the whole query registry: at
  * 100 TB an accidental cartesian or nested-loop join is an outage,
  * so the audit that was run by hand (tools/Explain) is encoded here.
  *
  * BroadcastNestedLoopJoin is acceptable only where the operator is
  * inherently non-equi AND one side is an explicitly broadcast small
  * set — those cases are whitelisted by name.
  */
class PlanAuditSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private val bnljWhitelist = Set(
    "q_similarity_cosine_topk", // broadcast query-set vs corpus, non-equi (vec_id !=)
    "q_theta_array_contains",   // broadcast word LUT vs array_contains membership
    "q_similarity_ivf",         // queries x broadcast k-row centroid table (probe assignment)
    "q_window_ntile_approx"     // fact x broadcast 1-row cutpoint array (range lookup)
  )

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plan has no cartesian product or stray nested-loop join") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
      plan should not include "CartesianProduct"
      if (!bnljWhitelist.contains(name)) {
        withClue(s"unexpected BroadcastNestedLoopJoin in $name — " +
          "either make the condition an equi-join or whitelist it deliberately: ") {
          plan should not include "BroadcastNestedLoopJoin"
        }
      }
    }
  }
}

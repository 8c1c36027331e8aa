// Scratch: reproduce plan_audit's census for q79 and locate the SMJ.
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive._
import org.apache.spark.sql.execution.joins._

val df = graft.SparkEntry.queries("q79_funnel")(spark, "/root/testdata/sf0.01")
df.collect()
def findSmj(x: SparkPlan): Unit = {
  x match {
    case s: SortMergeJoinExec => println("SMJ: " + s.simpleStringWithNodeId())
    case _ =>
  }
  x match {
    case a: AdaptiveSparkPlanExec => findSmj(a.executedPlan)
    case q: QueryStageExec        => findSmj(q.plan)
    case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
    case _ =>
  }
  x.children.foreach(findSmj)
}
findSmj(df.queryExecution.executedPlan)
println("conf adaptive=" + spark.conf.get("spark.sql.adaptive.enabled"))
println("done")
sys.exit(0)

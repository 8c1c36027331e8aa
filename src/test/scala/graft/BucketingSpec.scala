package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Co-located join via bucketing — the scale pattern for repeated fact-fact
 * joins: bucket both tables on the join key at write time, and the join
 * plans with ZERO shuffle exchanges (each bucket pair joins locally). At
 * 100 TB this turns the dominant nightly-join cost into a map-side merge.
 */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft-warehouse").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4,2]")
    .appName("bucketing-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    try spark.stop()
    finally super.afterAll()
  }

  test("bucketed tables join without any shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey as l_orderkey", "o_orderpriority")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed").join(spark.table("o_bucketed"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")

    // same result as the plain (shuffling) join
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(
        spark.read.parquet(s"$dir/orders.parquet").selectExpr("o_orderkey as l_orderkey", "o_orderpriority"),
        "l_orderkey"
      )
    assert(joined.count() == plain.count())
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.joins.Layout

/** Physical-layout invariants: bucketed co-located join has no shuffle;
  * salted join is correct and spreads the hot key. */
class LayoutSpec extends SparkFunSuite {
  import spark.implicits._

  test("bucketed tables join without shuffle exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Layout.bucketize(Tables.orders(spark, sf()), "b_orders", "o_orderkey", 8)
      Layout.bucketize(Tables.lineitem(spark, sf()), "b_lineitem", "l_orderkey", 8)
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      // correctness: same count as the plain join
      val plain = Tables.lineitem(spark, sf()).join(Tables.orders(spark, sf()),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === plain)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join: correct results, hot key spread across salts") {
    // skewed left: one key dominates
    val left = (0 until 10000).map(i => (if (i < 9000) 1L else i.toLong, i))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (9500L, "cold")).toDF("k", "name")
    val out = Layout.saltedJoin(left, right, "k", salt = 8)
    assert(out.count() === 9001)
    assert(out.filter(col("name") === "hot").count() === 9000)
    // plain join agrees
    val plain = left.join(right, Seq("k")).count()
    assert(out.count() === plain)
  }
}

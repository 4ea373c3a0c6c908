package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewUtils

/** Salted forms must be result-equivalent to their plain forms, and the
  * salt must actually reach the join/agg keys in the plan. */
class SkewSpec extends SparkTestBase {
  private lazy val events = graft.Tables.events(spark, sf)
  private lazy val userDim = events.groupBy("user_id")
    .agg(count(lit(1)).as("user_events"))

  test("saltedJoin equals plain join") {
    val plain = events.join(userDim, "user_id")
      .select("event_id", "user_events")
      .orderBy("event_id").collect().map(_.toString)
    val salted = SkewUtils.saltedJoin(events, userDim, "user_id", 8)
      .select("event_id", "user_events")
      .orderBy("event_id").collect().map(_.toString)
    assert(plain.sameElements(salted))
  }

  test("saltedJoin joins on (key, salt)") {
    val p = SkewUtils.saltedJoin(events, userDim, "user_id", 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt column absent from plan:\n$p")
  }

  test("saltedCount equals plain groupBy count") {
    val plain = events.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val salted = SkewUtils.saltedCount(events, "user_id", 8)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plain.sameElements(salted))
  }

  test("registerAll exposes the full corpus to spark.sql") {
    graft.Tables.registerAll(spark, sf)
    assert(spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0) == 6000)
    assert(spark.sql("SELECT count(*) FROM events WHERE ts_us > 0")
      .collect()(0).getLong(0) == 1000)
  }
}

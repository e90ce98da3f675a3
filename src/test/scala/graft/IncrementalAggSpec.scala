package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalAgg

/** Incremental rollup maintenance: merged partials must equal the
  * direct recompute, regardless of how arrivals were grouped. */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  def events = Tables.table(spark, dir, "events")

  test("merge of day-sliced partials equals the direct full aggregate") {
    val split = lit("2024-01-21").cast("timestamp")
    val base = IncrementalAgg.partial(events.filter(col("ts") < split),
      Seq("event_type"), "value", "user_id")
    val delta = IncrementalAgg.partial(events.filter(col("ts") >= split),
      Seq("event_type"), "value", "user_id")
    val incremental = IncrementalAgg
      .finalize(IncrementalAgg.merge(Seq("event_type"), base, delta), Seq("event_type"))
      .orderBy("event_type").collect()
    val direct = IncrementalAgg
      .finalize(IncrementalAgg.partial(events, Seq("event_type"), "value", "user_id"),
        Seq("event_type"))
      .orderBy("event_type").collect()
    assert(incremental.length == direct.length && incremental.nonEmpty)
    // 2-decimal money values: sums are exact in double, so the two
    // paths agree bit-for-bit, HLL estimates included (register-max
    // union is order-independent)
    incremental.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("merge is associative: ((a+b)+c) == (a+(b+c)) over three slices") {
    val cuts = (lit("2024-01-11").cast("timestamp"), lit("2024-01-21").cast("timestamp"))
    val a = IncrementalAgg.partial(events.filter(col("ts") < cuts._1),
      Seq("event_type"), "value", "user_id")
    val b = IncrementalAgg.partial(
      events.filter(col("ts") >= cuts._1 && col("ts") < cuts._2),
      Seq("event_type"), "value", "user_id")
    val c = IncrementalAgg.partial(events.filter(col("ts") >= cuts._2),
      Seq("event_type"), "value", "user_id")
    val left = IncrementalAgg.finalize(
      IncrementalAgg.merge(Seq("event_type"),
        IncrementalAgg.merge(Seq("event_type"), a, b), c),
      Seq("event_type")).orderBy("event_type").collect()
    val right = IncrementalAgg.finalize(
      IncrementalAgg.merge(Seq("event_type"), a,
        IncrementalAgg.merge(Seq("event_type"), b, c)),
      Seq("event_type")).orderBy("event_type").collect()
    left.zip(right).foreach { case (x, y) => assert(x == y) }
    assert(left.nonEmpty)
  }

  test("the measured entry returns the per-type rollup with sane fields") {
    val rows = EngineOps.queries("eng_incremental_agg")(spark, dir).collect()
    assert(rows.length == 5) // the 5 event types
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
      assert(r.getAs[Double]("var_v") >= 0.0)
      assert(r.getAs[Long]("approx_distinct") > 0)
    }
  }
}

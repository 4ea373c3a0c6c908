package graft

/** SURVEY §5.4: every declared query executed twice, results compared —
  * catches nondeterministic collect/dropDuplicates/float-order bugs
  * before the driver's hash compare does. */
class DeterminismSpec extends SparkTestBase {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name is run-to-run deterministic") {
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a == b, s"$name differs between runs")
    }
  }
}

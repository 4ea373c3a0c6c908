package graft

/** Dev tool (r11, VERDICT r10 #3): dump the declared key inventory —
  * every `SparkEntry.queries` key and whether it carries an oracle —
  * for `tools/survey_totals.py`, which regenerates the SURVEY §2
  * totals block from this ground truth instead of a hand-edited
  * paragraph (which drifted every round it was touched). */
object SurveyKeys {
  def main(args: Array[String]): Unit = {
    val oracled = SparkEntry.oracleSql.keySet
    SparkEntry.queries.keys.toSeq.sorted.foreach { k =>
      println(s"[skey] $k ${if (oracled(k)) 1 else 0}")
    }
  }
}

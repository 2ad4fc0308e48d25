package graft

import org.apache.spark.sql.functions._
import graft.queries.Graphs

/** The triangle family's adjacency hub guard: a pathological hub fails
  * LOUDLY before the collect_list neighbor-array build instead of
  * OOMing a task at scale. */
class HubGuardSpec extends SparkSpec {
  import spark.implicits._

  test("a synthetic hub trips the guard loudly") {
    // one src with out-degree 100 — far beyond an explicit bound of 50
    val hub = (1 to 100).map(i => (0L, i.toLong)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException](
      Graphs.assertNoAdjacencyHub(hub, maxOutDeg = Some(50L)))
    assert(ex.getMessage.contains("hub guard") &&
      ex.getMessage.contains("100") && ex.getMessage.contains("50"))
  }

  test("a degree-bounded graph passes the default 32·√m + 4096 bound") {
    // a 3-regular-ish ring: max out-degree 2, m = 200 — nowhere near
    // the default bound; the probe must stay silent
    val ring = (0 until 100).flatMap(i =>
      Seq((i.toLong, ((i + 1) % 100).toLong), (i.toLong, ((i + 2) % 100).toLong)))
      .toDF("src", "dst")
    Graphs.assertNoAdjacencyHub(ring) // must not throw
  }

  test("an empty edge set is vacuously bounded") {
    Graphs.assertNoAdjacencyHub(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
  }
}

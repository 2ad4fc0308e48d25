package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalReach

/** Time-respecting reachability semantics: edge ORDER gates traversal
  * (a static BFS over the same edges overcounts), arrivals are the
  * earliest time-respecting ones, and min-merge keeps extra rounds
  * harmless after the fixed point. */
class TemporalReachSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], seeds: Seq[(Long, Long)], rounds: Int) = {
    val root = java.nio.file.Files.createTempDirectory("graft-treach").toString
    val e = edges.toDF("src", "dst", "t")
    val sd = seeds.toDF("id", "arr")
    TemporalReach.earliestArrival(e, sd, rounds, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("decreasing timestamps block the path a static BFS would take") {
    // a -(t=5)-> b -(t=3)-> c : statically a reaches c; temporally it can't
    // (arrive at b at 5, the b->c edge happened at 3).
    val got = run(Seq((1L, 2L, 5L), (2L, 3L, 3L)), Seq((1L, 0L)), rounds = 3)
    assert(got(1L) === 0L)
    assert(got(2L) === 5L)
    assert(!got.contains(3L), "c is NOT time-respecting-reachable")
  }

  test("increasing timestamps propagate and arrivals are the earliest") {
    // two routes to d: via b (arrive 4) and via c (arrive 9) -> min wins
    val got = run(
      Seq((1L, 2L, 2L), (2L, 4L, 4L), (1L, 3L, 7L), (3L, 4L, 9L)),
      Seq((1L, 0L)), rounds = 3)
    assert(got(4L) === 4L, "earliest time-respecting arrival wins")
  }

  test("equal timestamp traverses (>= semantics) and extra rounds are no-ops") {
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 5L))
    val r2 = run(edges, Seq((1L, 5L)), rounds = 2)
    val r4 = run(edges, Seq((1L, 5L)), rounds = 4)
    assert(r2(3L) === 5L, "t == arrival traverses")
    assert(r2 === r4, "rounds past the fixed point change nothing")
  }

  test("a hop per round: k rounds cover exactly <= k-hop temporal paths") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L))
    val r2 = run(edges, Seq((1L, 0L)), rounds = 2)
    assert(r2.contains(3L) && !r2.contains(4L))
    val r3 = run(edges, Seq((1L, 0L)), rounds = 3)
    assert(r3(4L) === 3L)
  }
}

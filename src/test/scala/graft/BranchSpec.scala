package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Branch, Versioned}

/** Branch + three-way merge over Versioned tables: classification of
  * main-only / branch-only / convergent / conflicting changes, the
  * conflict policies, and the mergeCommit round trip. */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    Files.createTempDirectory("graft-branch").toString

  private def rows(t: Seq[(Long, String, Double)]) =
    t.toDF("id", "part", "value")

  private def setup(): (String, String) = {
    val root = freshRoot()
    val main = s"$root/main"; val br = s"$root/branch"
    Versioned.commit(spark, main, rows(Seq(
      (1L, "a", 1.0),  // untouched everywhere
      (2L, "a", 2.0),  // branch-only update
      (3L, "a", 3.0),  // main-only update
      (4L, "b", 4.0),  // conflicting update (different values)
      (5L, "b", 5.0)   // convergent update (same value both sides)
    )), "part", Seq("id"))
    Branch.create(spark, main, br)
    Versioned.commit(spark, br, rows(Seq(
      (2L, "a", 20.0), (4L, "b", 40.0), (5L, "b", 50.0), (6L, "a", 6.0))),
      "part", Seq("id"))
    Versioned.commit(spark, main, rows(Seq(
      (3L, "a", 30.0), (4L, "b", 44.0), (5L, "b", 50.0), (7L, "b", 7.0))),
      "part", Seq("id"))
    (main, br)
  }

  test("fail policy refuses the merge and names a conflicting key") {
    val (main, br) = setup()
    val e = intercept[IllegalArgumentException] {
      Branch.merge3(spark, main, br, Seq("id")).count()
    }
    assert(e.getMessage.contains("conflict"))
    assert(e.getMessage.contains("4"))
  }

  test("theirs resolves conflicts to the branch; origins classify every key") {
    val (main, br) = setup()
    val byId = Branch.merge3(spark, main, br, Seq("id"), policy = "theirs")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getString(3)))).toMap
    assert(byId(1L) === ((1.0, "main")))      // untouched → main state
    assert(byId(2L) === ((20.0, "branch")))   // branch-only update
    assert(byId(3L) === ((30.0, "main")))     // main-only update
    assert(byId(4L) === ((40.0, "conflict"))) // theirs wins
    assert(byId(5L) === ((50.0, "both")))     // convergent edit
    assert(byId(6L) === ((6.0, "branch")))    // branch insert
    assert(byId(7L) === ((7.0, "main")))      // main insert
    assert(byId.size === 7)
  }

  test("ours resolves conflicts to main") {
    val (main, br) = setup()
    val byId = Branch.merge3(spark, main, br, Seq("id"), policy = "ours")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getString(3)))).toMap
    assert(byId(4L) === ((44.0, "conflict")))
    assert(byId(2L) === ((20.0, "branch"))) // non-conflicts unaffected by policy
  }

  test("mergeCommit lands the resolution as one new main version") {
    val (main, br) = setup()
    val before = Versioned.latestVersion(spark, main)
    val v = Branch.mergeCommit(spark, main, br, "part", Seq("id"), policy = "theirs")
    assert(v === before + 1)
    val got = Versioned.readAsOf(spark, main, v)
      .as[(Long, String, Double)].collect().toSet
    val want = Branch.merge3(spark, main, br, Seq("id"), policy = "theirs")
      .drop("origin").as[(Long, String, Double)].collect().toSet
    assert(got === want)
    // pre-merge history is untouched
    assert(Versioned.readAsOf(spark, main, before)
      .filter(col("id") === 2L).as[(Long, String, Double)].collect().toSet ===
      Set((2L, "a", 2.0)))
  }

  test("merging a non-branch fails loudly") {
    val root = freshRoot()
    val a = s"$root/a"; val b = s"$root/b"
    Versioned.commit(spark, a, rows(Seq((1L, "a", 1.0))), "part", Seq("id"))
    Versioned.commit(spark, b, rows(Seq((1L, "a", 1.0))), "part", Seq("id"))
    val e = intercept[IllegalArgumentException] {
      Branch.merge3(spark, a, b, Seq("id"))
    }
    assert(e.getMessage.contains("not a branch"))
  }

  test("branch-side deleteKeys propagates through mergeCommit") {
    val root = freshRoot()
    val main = s"$root/main"; val br = s"$root/branch"
    Versioned.commit(spark, main, rows(Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))), "part", Seq("id"))
    Branch.create(spark, main, br)
    // branch deletes key 2 and updates key 3; main is quiet
    Versioned.deleteKeys(spark, br, Seq(2L).toDF("id"), Seq("id"))
    Versioned.commit(spark, br, rows(Seq((3L, "b", 30.0))), "part", Seq("id"))
    val m = Branch.merge3(spark, main, br, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(m === Map(1L -> "main", 3L -> "branch"), s"delete must drop key 2: $m")
    Branch.mergeCommit(spark, main, br, "part", Seq("id"))
    assert(Versioned.readAsOf(spark, main).as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 1.0), (3L, "b", 30.0)),
      "main head must equal the merge output, delete included")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Git-like branch-and-merge for [[Versioned]] tables — the public
  * branch/ref semantics of Iceberg refs and Nessie (a branch diverges
  * zero-copy, then a three-way merge reconciles row-level changes),
  * expressed Spark-first:
  *
  *   - a branch IS a [[Versioned.shallowClone]] (k-row metadata write;
  *     the clone marker records the base bound, so the merge can always
  *     recover the exact base state without any extra bookkeeping);
  *   - the merge is ONE pass: three states (base, main head, branch
  *     head) full-outer-joined on the key, each row classified by
  *     null-safe struct comparison — no per-key driver logic, no
  *     second scan. At 100 TB the merge costs three keyed shuffles
  *     (or fewer — the three reads share partitioning), exactly the
  *     price of the full outer joins.
  *
  * Row-level semantics (per key, with `b`/`m`/`r` = base/main/branch
  * state, absence = null struct, so inserts and deletes fall out of the
  * same comparisons):
  *
  *   - branch unchanged (r ≡ b)   → main's state wins (fast-forward);
  *   - main unchanged  (m ≡ b)    → branch's state wins;
  *   - both changed identically   → that state (convergent edit);
  *   - both changed differently   → CONFLICT: `fail` refuses the merge
  *     (default — the honest git behavior), `ours` keeps main's state,
  *     `theirs` keeps the branch's.
  *
  * The merged frame carries an `origin` provenance column
  * (main/branch/both/conflict) so audits can see exactly which side
  * supplied each row. [[mergeCommit]] lands the resolution on main —
  * rows the merge removes (a branch-side [[Versioned.deleteKeys]])
  * propagate through a deleteKeys version, then the surviving state
  * commits, so main's head equals the merge output exactly.
  */
object Branch {

  /** Create a branch of `main`'s latest version (zero-copy). Returns
    * the branch's base version number. */
  def create(spark: SparkSession, main: String, branch: String): Long =
    Versioned.shallowClone(spark, main, branch)

  /** Three-way row-level merge of `branch` back into `main` (both
    * [[Versioned]] roots; `branch` must be a clone of `main`). Returns
    * the merged state with the `origin` provenance column. Policy:
    * `fail` (refuse on any conflict), `ours` (main wins), `theirs`
    * (branch wins). */
  def merge3(
      spark: SparkSession,
      main: String,
      branch: String,
      keys: Seq[String],
      policy: String = "fail"): DataFrame = {
    require(Set("fail", "ours", "theirs")(policy), s"unknown merge policy: $policy")
    val (srcPath, bound) = Versioned.sourceRef(spark, branch).getOrElse(
      throw new IllegalArgumentException(
        s"$branch is not a branch of anything (no clone marker)"))
    // compare FULLY-QUALIFIED URIs: a bare path comparison would let a
    // branch of s3a://bucketA/t merge into s3a://bucketB/t (or hdfs vs
    // file) with the same path component — silently against the wrong base
    def qualified(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(hp).toUri
    }
    require(qualified(srcPath) == qualified(main),
      s"$branch is a branch of $srcPath, not of $main")
    // The clone's first manifest version IS the base bound — the branch
    // at `bound` is bit-identical to main at clone time (k34's gate).
    val base = Versioned.readAsOf(spark, branch, bound)
    val mainHead = Versioned.readAsOf(spark, main)
    val branchHead = Versioned.readAsOf(spark, branch)
    val valCols = base.columns.filterNot(keys.contains).toSeq

    // Pack each side's non-key columns (plus a literal presence flag —
    // an absent key yields a NULL struct, never a struct of nulls) so
    // change detection is ONE null-safe struct comparison per side.
    def pack(df: DataFrame, tag: String) =
      df.select(keys.map(col) :+
        struct(valCols.map(col) :+ lit(true).as("_present"): _*).as(tag): _*)

    val j = pack(base, "b_s")
      .join(pack(mainHead, "m_s"), keys, "full")
      .join(pack(branchHead, "r_s"), keys, "full")
    val rUnch = col("r_s") <=> col("b_s")
    val mUnch = col("m_s") <=> col("b_s")
    val same = col("m_s") <=> col("r_s")
    val origin = when(rUnch, lit("main")).when(mUnch, lit("branch"))
      .when(same, lit("both")).otherwise(lit("conflict"))
    val winner = if (policy == "ours") col("m_s") else col("r_s")
    val chosen = when(rUnch, col("m_s")).when(mUnch, col("r_s"))
      .when(same, col("m_s")).otherwise(winner)

    val out = j
      .select(keys.map(col) ++ Seq(chosen.as("_c"), origin.as("origin")): _*)
      .filter(col("_c").isNotNull)
      .select(keys.map(col) ++
        valCols.map(c => col("_c").getField(c).as(c)) :+ col("origin"): _*)
    if (policy == "fail") {
      // driver-sized probe: ONE conflicting key is enough to refuse
      val conflicted = out.filter(col("origin") === "conflict")
        .select(keys.map(col): _*).limit(5).collect()
      require(conflicted.isEmpty,
        s"merge of $branch into $main has conflicts (first keys: " +
          s"${conflicted.mkString(", ")}); re-run with policy=ours|theirs")
    }
    out
  }

  /** Merge `branch` into `main` and COMMIT the resolution as ONE new
    * main version ([[Versioned.commitMerge]]): rows the resolution
    * REMOVES (a branch-side [[Versioned.deleteKeys]] that won) and rows
    * it changes land in the same manifest write, so concurrent readers
    * see either the old head or the fully merged head — never an
    * intermediate delete-only state, and a crash can't strand deletes
    * without the updates. The delta is only the rows the merge actually
    * changed (origin ≠ main), so untouched partitions carry forward.
    * Returns the final main version. */
  def mergeCommit(
      spark: SparkSession,
      main: String,
      branch: String,
      partCol: String,
      keys: Seq[String],
      policy: String = "fail"): Long = {
    val merged = merge3(spark, main, branch, keys, policy)
    val delta = merged.filter(col("origin") =!= "main").drop("origin")
    val removed = Versioned.readAsOf(spark, main)
      .select(keys.map(col): _*)
      .join(merged.select(keys.map(col): _*), keys, "left_anti")
    Versioned.commitMerge(spark, main, delta, removed, partCol, keys)
  }
}

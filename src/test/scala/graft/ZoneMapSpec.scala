package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Maintenance, Upsert, ZoneMap}

/** Zone-map index: a clustered table's per-file [min,max] zones prune
  * most files for a selective band predicate; pruning is conservative
  * (pruned read ≡ full scan); an unclustered table prunes nothing
  * (the documented cluster-then-index contract); rebuild after
  * compaction tracks the new file set.
  */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def clusteredTable(): (String, String) = {
    val root = Files.createTempDirectory("zm").toString
    val path = s"$root/t"
    (0 until 8000).map(k => (k.toLong, k % 17, s"v$k")).toDF("k", "g", "v")
      .repartitionByRange(16, col("k")).sortWithinPartitions(col("k"))
      .write.parquet(path)
    (path, s"$root/idx")
  }

  test("selective band predicate skips most files; results identical to full scan") {
    val (path, idx) = clusteredTable()
    ZoneMap.build(spark, path, Seq("k"), idx)
    val keep = col("max_k") >= 1000 && col("min_k") <= 1400
    val (kept, total) = ZoneMap.pruningStats(spark, idx, keep)
    assert(total === 16)
    assert(kept <= 2, s"range-clustered 500-wide band should hit ≤2 of 16 files, hit $kept")
    val pruned = ZoneMap.readPruned(spark, path, idx, keep)
      .filter(col("k").between(1000, 1400)).orderBy("k").collect().toSeq
    val full = spark.read.parquet(path)
      .filter(col("k").between(1000, 1400)).orderBy("k").collect().toSeq
    assert(pruned === full)
    assert(pruned.size === 401)
  }

  test("out-of-range predicate prunes everything; empty frame keeps schema") {
    val (path, idx) = clusteredTable()
    ZoneMap.build(spark, path, Seq("k"), idx)
    val keep = col("max_k") >= 100000 && col("min_k") <= 200000
    val df = ZoneMap.readPruned(spark, path, idx, keep)
    assert(df.count() === 0)
    assert(df.columns.toSeq === Seq("k", "g", "v"))
  }

  test("unclustered table: zones overlap, nothing prunes (why clusterBy comes first)") {
    val root = Files.createTempDirectory("zm").toString
    val path = s"$root/t"
    // round-robin layout: every file spans nearly the full key range
    (0 until 8000).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .repartition(16).write.parquet(path)
    ZoneMap.build(spark, path, Seq("k"), s"$root/idx")
    val (kept, total) =
      ZoneMap.pruningStats(spark, s"$root/idx", col("max_k") >= 1000 && col("min_k") <= 1400)
    assert(total === 16)
    assert(kept === 16, "hash-scattered files all intersect the band — no pruning possible")
  }

  test("rebuild after compaction tracks the new file set") {
    val (path, idx) = clusteredTable()
    ZoneMap.build(spark, path, Seq("k"), idx)
    Maintenance.compact(spark, path, targetBytesPerFile = 1L << 30)
    ZoneMap.build(spark, path, Seq("k"), idx)
    val (kept, total) =
      ZoneMap.pruningStats(spark, idx, col("max_k") >= 1000 && col("min_k") <= 1400)
    assert(total === 1, "compacted to one file")
    assert(kept === 1)
    val pruned = ZoneMap
      .readPruned(spark, path, idx, col("max_k") >= 1000 && col("min_k") <= 1400)
      .filter(col("k").between(1000, 1400)).count()
    assert(pruned === 401)
  }
}

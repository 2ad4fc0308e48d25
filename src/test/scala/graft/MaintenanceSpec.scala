package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Maintenance, Upsert}

/** Table maintenance: compaction shrinks file counts without changing
  * data, clustering makes row-group stats selective, partitioned
  * compaction touches only fragmented partitions, and an interrupted
  * compaction recovers through the shared swap protocol.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val path = Files.createTempDirectory("maint").toString + "/t"
    // ten incremental upserts -> ten file sets (the hourly-run pathology)
    (0 until 10).foreach { i =>
      val delta = ((i * 100) until ((i + 1) * 100)).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      Upsert.upsertParquet(spark, path, delta, Seq("k"))
    }
    path
  }

  test("compact: same data, far fewer files, crash-safe protocol") {
    val path = freshTable()
    val before = Maintenance.stats(spark, path)
    val dataBefore = spark.read.parquet(path).orderBy("k").collect().toSeq
    Maintenance.compact(spark, path, targetBytesPerFile = 1L << 30)
    val after = Maintenance.stats(spark, path)
    assert(after.files < before.files, s"files ${before.files} -> ${after.files}")
    assert(after.files === 1, "1 GiB target on a tiny table compacts to one file")
    assert(spark.read.parquet(path).orderBy("k").collect().toSeq === dataBefore)
  }

  test("clusterBy: per-file min/max stats become disjoint (data skipping)") {
    val path = Files.createTempDirectory("maint").toString + "/t"
    // write 8 files, each containing the FULL key range (worst case for
    // min/max stats: every file overlaps every key filter)
    (0 until 8).foreach { i =>
      (0 until 1000).map(k => (k.toLong, i.toLong)).toDF("k", "run")
        .coalesce(1).write.mode("append").parquet(path)
    }
    // read the k column's min/max straight from the parquet footers —
    // the stats the reader's row-group skipping actually consults
    def kRanges(): Seq[(Long, Long)] = {
      import scala.jdk.CollectionConverters._
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getPath),
            spark.sparkContext.hadoopConfiguration))
          try {
            val stats = r.getFooter.getBlocks.asScala
              .map(_.getColumns.asScala.find(_.getPath.toDotString == "k").get.getStatistics)
            (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
              stats.map(_.genericGetMax.asInstanceOf[Long]).max)
          } finally r.close()
        }
    }
    val before = kRanges()
    assert(before.size === 8 && before.forall(r => r._1 == 0L && r._2 == 999L),
      s"unclustered: every file spans the whole key range: $before")
    Maintenance.clusterBy(spark, path, Seq("k"), targetBytesPerFile = 8192)
    val after = kRanges().sorted
    assert(after.size > 1, s"need multiple files to demonstrate skipping: $after")
    // pairwise disjoint ranges: a point filter overlaps exactly one file
    after.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"file ranges overlap after clustering: $after")
    }
    val hits = after.count { case (lo, hi) => lo <= 42L && 42L <= hi }
    assert(hits === 1, s"k=42 must fall in exactly one file's range: $after")
    // data intact
    assert(spark.read.parquet(path).count() === 8000)
  }

  test("zorderBy: 2-D box predicates skip more files than lexicographic clustering") {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    // 64×64 grid scattered over 8 files (worst case: every file spans
    // the full range of both columns)
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    def writeScattered(path: String): Unit =
      (0 until 8).foreach { i =>
        pts.filter { case (x, y) => (x * 64 + y) % 8 == i }
          .toDF("x", "y").coalesce(1).write.mode("append").parquet(path)
      }
    // per-file (min,max) of both columns straight from the footers
    def ranges(path: String): Seq[((Long, Long), (Long, Long))] =
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getPath),
            spark.sparkContext.hadoopConfiguration))
          try {
            def mm(c: String) = {
              val st = r.getFooter.getBlocks.asScala
                .map(_.getColumns.asScala.find(_.getPath.toDotString == c).get.getStatistics)
              (st.map(_.genericGetMin.asInstanceOf[Long]).min,
                st.map(_.genericGetMax.asInstanceOf[Long]).max)
            }
            (mm("x"), mm("y"))
          } finally r.close()
        }
    // a 16×16 corner box — the multi-dimensional predicate shape
    def boxHits(path: String): Int = ranges(path).count {
      case ((xlo, xhi), (ylo, yhi)) => xlo <= 15 && 0 <= xhi && ylo <= 15 && 0 <= yhi
    }
    val zpath = Files.createTempDirectory("maint").toString + "/z"
    val lpath = Files.createTempDirectory("maint").toString + "/l"
    writeScattered(zpath); writeScattered(lpath)
    Maintenance.zorderBy(spark, zpath, Seq("x", "y"), bits = 6, targetBytesPerFile = 1024)
    Maintenance.clusterBy(spark, lpath, Seq("x", "y"), targetBytesPerFile = 1024)
    val (zn, ln) = (ranges(zpath).size, ranges(lpath).size)
    assert(zn >= 8 && ln >= 8, s"need real file counts to compare: z=$zn lex=$ln")
    val (zh, lh) = (boxHits(zpath), boxHits(lpath))
    // lexicographic: x prunes but every surviving file spans all of y;
    // z-order: the box is a z-prefix quadrant → a fraction of files
    assert(zh < lh, s"z-order must beat lexicographic on the box: z=$zh lex=$lh")
    assert(zh <= math.max(2, zn / 4), s"box should touch a small fraction: $zh of $zn")
    // layout change only — the data is intact
    assert(spark.read.parquet(zpath).orderBy("x", "y").collect().toSeq
      === pts.toDF("x", "y").orderBy("x", "y").collect().toSeq)
  }

  test("compactPartitioned: only fragmented partitions are rewritten") {
    val path = Files.createTempDirectory("maint").toString + "/t"
    // partition p=a fragmented (10 appends), p=b written once
    (0 until 10).foreach { i =>
      Seq((i.toLong, "a")).toDF("k", "p")
        .write.mode("append").partitionBy("p").parquet(path)
    }
    Seq((100L, "b"), (101L, "b")).toDF("k", "p")
      .write.mode("append").partitionBy("p").parquet(path)
    val bFilesBefore = new java.io.File(s"$path/p=b").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val rewritten = Maintenance.compactPartitioned(spark, path, Seq("p"), maxFilesPerPartition = 4)
    assert(rewritten.size === 1 && rewritten.head.endsWith("p=a"))
    val aFiles = new java.io.File(s"$path/p=a").listFiles()
      .map(_.getName).count(_.endsWith(".parquet"))
    assert(aFiles === 1, s"fragmented partition must compact to one file, got $aFiles")
    val bFilesAfter = new java.io.File(s"$path/p=b").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(bFilesAfter === bFilesBefore, "healthy partition must keep its files byte-for-byte")
    assert(spark.read.parquet(path).count() === 12)
  }

  test("interrupted compaction recovers like an interrupted upsert") {
    val path = freshTable()
    val dataBefore = spark.read.parquet(path).orderBy("k").collect().toSeq
    // fabricate the mid-swap crash state: staged __new complete, table renamed away
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(path).repartition(1)
      .write.parquet(path + "__new")
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__old")))
    // next maintenance call heals (roll forward to the compacted copy)
    Maintenance.compact(spark, path, targetBytesPerFile = 1L << 30)
    assert(spark.read.parquet(path).orderBy("k").collect().toSeq === dataBefore)
    assert(Maintenance.stats(spark, path).files === 1)
  }

  test("evolvePartitioning: new directory layout, same data, derived column correct") {
    val path = Files.createTempDirectory("maint").toString + "/t"
    (0 until 300).map(k => (k.toLong, s"g${k % 3}", k % 10))
      .toDF("k", "grp", "bucket")
      .write.partitionBy("grp").parquet(path)
    val before = spark.read.parquet(path)
      .select("k", "grp", "bucket").orderBy("k").collect().toSeq
    Maintenance.evolvePartitioning(spark, path, Seq("parity"),
      df => df.withColumn("parity", col("k") % 2))
    // layout: top-level dirs are now parity=..., grp is a plain column
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("parity=0", "parity=1"))
    val after = spark.read.parquet(path)
    assert(after.select("k", "grp", "bucket").orderBy("k").collect().toSeq === before)
    assert(after.filter(col("parity") === col("k") % 2).count() === 300)
  }

  test("interrupted partition evolution heals on the next call") {
    val path = Files.createTempDirectory("maint").toString + "/t"
    (0 until 100).map(k => (k.toLong, s"v$k")).toDF("k", "v").write.parquet(path)
    val dataBefore = spark.read.parquet(path).orderBy("k").collect().toSeq
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // crash window A: staged __new INCOMPLETE (no _SUCCESS), table renamed away
    spark.read.parquet(path).withColumn("parity", col("k") % 2)
      .write.partitionBy("parity").parquet(path + "__new")
    fs.delete(new org.apache.hadoop.fs.Path(path + "__new/_SUCCESS"), false)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__old")))
    // next call rolls BACK to __old, then completes the migration
    Maintenance.evolvePartitioning(spark, path, Seq("parity"),
      df => df.withColumn("parity", col("k") % 2))
    assert(spark.read.parquet(path).select("k", "v").orderBy("k").collect().toSeq
      === dataBefore)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("parity=0", "parity=1"))
  }
}

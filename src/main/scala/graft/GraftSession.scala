package graft

import org.apache.spark.sql.SparkSession

/** The engine's session entrypoint: one place that encodes every config
  * the library depends on. Users (and Verify/Bench) build sessions here
  * so behavior never depends on ambient defaults.
  *
  * Sizing guidance (local[N] → cluster): `shufflePartitions` should be
  * cores×2-3 on a real cluster (AQE coalesces small post-shuffle
  * partitions back down); `spark.sql.files.maxPartitionBytes` default
  * 128m holds until individual row groups exceed executor memory.
  */
object GraftSession {

  def builder(
      master: String = "local[*]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events-style feeds carry TIMESTAMP(NANOS) parquet, which Spark 4
      // otherwise refuses; Tables.events floors the longs to micros
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", shufflePartitions = cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

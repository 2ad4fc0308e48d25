package graft

/** Dev-only instrumentation main (test scope, never shipped): runs the
  * named registry queries once at SPARK_GRAFT_SF_DIR and reports Spark
  * job count, cumulative job wall, and per-job time histogram — the
  * "where does a 15-second gate spend it" answer that per-query totals
  * can't give. Usage:
  *   SPARK_GRAFT_ONLY=e45_stream_range_index sbt "Test/runMain graft.DevProbe"
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val intervals = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(e.jobId, System.nanoTime())
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(e.jobId)
        if (t0 != 0L) {
          jobs.add(e.jobId -> (System.nanoTime() - t0))
          intervals.add(t0 -> System.nanoTime())
        }
      }
    })
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.registry.map(_.name).filter(n => only.forall(_.contains(n)))
    // unmeasured warmup pass (JIT + page cache), matching Bench's method
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
    }
    names.foreach { n =>
      jobs.clear()
      intervals.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      // let the async listener bus drain so the tally is complete
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.map(_._2 / 1e9).sorted.reverse
      println(f"[probe] $n: wall=$wall%.2f s, jobs=${js.size}, " +
        f"jobSum=${js.sum}%.2f s, top10=${js.take(10).map(v => f"$v%.2f").mkString(",")}")
      // idle-gap report: wall-clock spans where NO job was running —
      // driver planning, FS metadata, stream machinery
      val iv = intervals.asScala.toSeq.sortBy(_._1)
      var cursor = t0
      val gaps = (iv.map { case (s0, e0) =>
        val g = (s0 - cursor) / 1e9; cursor = math.max(cursor, e0); g
      } :+ (System.nanoTime() - cursor) / 1e9).filter(_ > 0.15)
      println(f"[probe]   idleGaps>0.15s: n=${gaps.size}, " +
        f"sum=${gaps.sum}%.2f s, top=${gaps.sorted.reverse.take(8).map(v => f"$v%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

package graft

/** Benchmark main (driver contract): one JSON line with per-query
  * seconds at SPARK_GRAFT_SF_DIR.
  *
  * Methodology: every query is fully materialized through the `noop`
  * write sink (a bare count() would let Catalyst prune the projections
  * being measured). One unmeasured warmup pass amortizes JVM/JIT and OS
  * page-cache effects; the measured pass starts from a cleared SQL cache
  * so intra-query persist() calls are paid honestly, and the cache is
  * cleared after each query so persisted frames can't serve a later one.
  *
  * Protocol shape (round 12): the DRIVER-facing default is
  * MEASURE-FIRST — no separate warmup pass; two measured passes with
  * the per-query MIN. Rounds 10 and 11 both ended rc 124 (timeout, no
  * record), and the first round-12 dry run showed the other failure
  * mode: a full unmeasured warmup burned ~800 s of the wall budget on
  * a degraded box and the record landed with 114 queries uncovered.
  * Measure-first makes COVERAGE the thing the budget protects: pass 1
  * (cold — it doubles as the warmup, landing caches and JIT) covers
  * the whole registry early in the budget, pass 2 (warm) re-measures
  * for quality, and the min per query keeps warm-sample fidelity. If
  * the budget dies mid-pass-2, the cold pass-1 samples stand for the
  * tail — full coverage either way, slightly colder numbers, never a
  * missing record. The BUILDER's close-out protocol stays
  * SPARK_GRAFT_WARMUP=full SPARK_GRAFT_PASSES=3 (the committed full
  * records in tools/bench_history are full-warmup min-of-3); the
  * emitted JSON records "passes" so the close-out guard can correct
  * for the min-of-N bias across protocols.
  *
  * Wall-budget guard: SPARK_GRAFT_WALL_BUDGET_SECS (default 1,450 —
  * the driver window minus observed sbt overhead, with margin) bounds
  * execution time from main() entry: a full warmup (when requested)
  * stops warming at 55% of budget, and every measured pass skips any
  * query whose estimate (min of its own prior samples, else 1.2x the
  * running median) no longer fits, emitting the PARTIAL record with
  * explicit "covered"/"uncovered" fields instead of being killed
  * mid-write with no record at all.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val t0Main = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - t0Main) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val wallBudget =
      sys.env.getOrElse("SPARK_GRAFT_WALL_BUDGET_SECS", "1450").toDouble
    val spark = GraftSession.local(cpus)

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    // Noise sentinel: one fixed, query-independent computation timed at
    // the head of every measured pass. Round-over-round per-query deltas
    // are only interpretable if box noise is deconvolvable from plan
    // regressions; the sentinel series IS that record — if the sentinel
    // drifted 1.5× between rounds, so did the box. spark.range is pure
    // CPU+scheduler (no disk), sized ~1s so contention shows up in it.
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, cpus)
        .selectExpr("sum(id * 3 + 1) as s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_ONLY=a1,d3 benches a comma-separated subset (dev loop;
    // the driver never sets it, so official runs still cover the registry)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.registry.map(_.name).filter(n => only.forall(_.contains(n)))

    // Per-query estimates for the wall-budget guard: the min of a
    // query's own prior samples (warmup or earlier passes), updated
    // after every measurement — in the driver's no-warmup default,
    // pass 1 populates the estimates pass 2's budget checks use.
    val estimates = scala.collection.mutable.Map.empty[String, Double]
    def recordEst(n: String, v: Double): Unit =
      estimates(n) = math.min(v, estimates.getOrElse(n, Double.MaxValue))

    // Optional FULL unmeasured warmup (builder close-out protocol:
    // SPARK_GRAFT_WARMUP=full) — budget-guarded at 55% so a degraded
    // box still leaves room for the measured passes.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "none") == "full") {
      var coldQueries = 0
      names.foreach { n =>
        if (elapsed() < wallBudget * 0.55) recordEst(n, materialize(n))
        else coldQueries += 1
      }
      if (coldQueries > 0)
        System.err.println(f"[bench] wall budget: warmup stopped with " +
          f"$coldQueries queries unwarmed (${elapsed()}%.0f s elapsed)")
    }

    val nPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    sentinel() // sentinel warmup (JIT the range/sum codegen)
    val sentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    // PER-FAMILY sentinels: one pass-head sentinel cannot normalize
    // intra-pass load spikes (observed 4.3x swings across one pass's
    // series) — so the sentinel is re-timed immediately BEFORE each
    // family within each pass, giving every query a LOCAL load proxy
    // taken seconds, not minutes, from its own measurement. The guard
    // normalizes each query's budget by the sentinel of the pass that
    // produced its min (min_pass below), falling back to the family
    // minimum, then to the global head sentinel for older files.
    def famOf(n: String) = n.takeWhile(!_.isDigit)
    val famOrder = names.map(famOf).distinct
    val famSentinels = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    // A query is measured only if its estimate still fits the wall
    // budget (unsampled queries estimate 1.2x the running median;
    // skips are recorded as uncovered). The filter is re-evaluated per
    // query per pass, so a mid-run slowdown truncates coverage instead
    // of truncating the RECORD.
    def estimate(n: String): Double = {
      val med = if (estimates.isEmpty) 2.0 else {
        val xs = estimates.values.toSeq.sorted
        xs(xs.size / 2)
      }
      estimates.getOrElse(n, med * 1.2) * 1.2
    }
    val ceiling = sys.env.getOrElse("SPARK_GRAFT_CEILING_SECS", "12").toDouble

    /** Emit the record for the passes completed SO FAR — called after
      * EVERY pass, not just the last: the driver's parser takes the
      * last parseable line from the log tail, so if the process is
      * killed between passes (wall-budget arithmetic can't see the
      * driver's outer timeout), the best-so-far record already sits in
      * the tail and on disk instead of nothing at all. The final
      * emission naturally wins as the last line. */
    def emit(passes: Seq[Map[String, Double]], isFinal: Boolean): Unit = {
      val results = names.flatMap { n =>
        val vs = passes.flatMap(_.get(n))
        if (vs.nonEmpty) Some(n -> vs.min) else None
      }
      val covered = results.map(_._1).toSet
      val uncovered = names.filterNot(covered)
      if (isFinal && uncovered.nonEmpty)
        System.err.println(s"[bench] wall budget: ${uncovered.size} queries " +
          s"UNCOVERED (emitting partial record): ${uncovered.mkString(",")}")
      // which pass (1-based) produced each query's min — the guard pairs
      // it with that pass's family sentinel for local normalization
      val minPass = results.map { case (n, v) =>
        n -> (passes.indexWhere(_.get(n).contains(v)) + 1)
      }.toMap
      val sentinelJson = sentinels.map(v => f"$v%.3f").mkString("[", ",", "]")
      val famSentJson = famSentinels.map { case (f, xs) =>
        "\"" + f + "\":" + xs.map(v => f"$v%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      // per-query ceiling readout (stderr, final emission only): every
      // query whose min-of-N exceeds the absolute ceiling is named at
      // measurement time, so a new gate that lands heavy needs its
      // committed waiver at birth — closeout.py enforces the same
      // ceiling against explained.json
      if (isFinal)
        results.filter(_._2 > ceiling).sortBy(-_._2).foreach { case (n, v) =>
          System.err.println(f"[bench] CEILING $n: $v%.2f s exceeds the " +
            f"$ceiling%.0f s per-query ceiling — waive in explained.json or reclaim")
        }
      val total = results.map(_._2).sum
      // batch vs streaming subtotals: the true-streaming queries carry
      // fixed per-microbatch checkpoint/state-store drain cost, so the
      // round-over-round plan-quality signal is batch_total, not the mix
      val streamTotal = results
        .collect { case (n, v) if queries.Events.streamingNames(n) => v }.sum
      val batchTotal = total - streamTotal
      // per-family subtotals (prefix before the first digit): the
      // round-over-round signal one level finer than batch/stream
      val famTotals = results
        .groupBy { case (n, _) => n.takeWhile(!_.isDigit) }
        .map { case (f, xs) => f -> xs.map(_._2).sum }
        .toSeq.sortBy(_._1)
      val fams = famTotals.map { case (f, v) => "\"" + f + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      // coverage + protocol fields: "passes" lets the guard correct the
      // min-of-N bias when this record is compared against a min-of-3
      // baseline; "covered"/"registered" make a wall-budget-truncated
      // record self-describing (the driver's parse sees a valid record
      // with an explicit gap, not a killed process)
      val coverage =
        s""","passes":${passes.size},"covered":${results.size},"registered":${names.size}"""
      def line(entries: Seq[(String, Double)], extra: String): String = {
        val qs = entries.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
          .mkString("{", ",", "}")
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","batch_total":$batchTotal%.3f,"stream_total":$streamTotal%.3f$coverage,"sentinel_secs":$sentinelJson,"sentinel_by_family":$famSentJson,"families":$fams$extra,"queries":$qs,"sf":"$sfDir"}"""
      }
      // The full per-query record goes to a FILE, not the log: the
      // harness keeps only a ~2000-byte log tail, and a full-registry
      // JSON line (~12 KB) printed before the compact one would leave a
      // truncated fragment at the tail's head shadowing the parseable
      // line.
      val minPassJson = results.map { case (n, _) => "\"" + n + "\":" + minPass(n) }
        .mkString("{", ",", "}")
      val uncoveredJson = uncovered.map("\"" + _ + "\"").mkString("[", ",", "]")
      val fullPath = java.nio.file.Paths.get("target", "bench_full.json")
      java.nio.file.Files.createDirectories(fullPath.getParent)
      java.nio.file.Files.write(fullPath,
        (line(results, s""","min_pass":$minPassJson,"uncovered":$uncoveredJson""") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // stdout gets ONE compact line per pass sized to survive the
      // 2000-byte log tail alongside sbt's trailing [success] line: the
      // slowest queries are kept (they carry the optimization signal);
      // the omitted fast ones are summarized by count + total.
      val budget = 900 // families + per-family sentinels share the tail
      val bySlowest = results.sortBy(-_._2)
      val kept = bySlowest
        .scanLeft(("", 0.0, 60)) { case ((_, _, acc), (k, v)) => (k, v, acc + k.length + 15) }
        .drop(1).takeWhile(_._3 <= budget).map(t => (t._1, t._2))
        .sortBy(_._1)
      println(line(kept, s""","n_queries":${results.size}"""))
    }

    val done = scala.collection.mutable.ArrayBuffer.empty[Map[String, Double]]
    (1 to nPasses).foreach { p =>
      sentinels += sentinel()
      done += famOrder.flatMap { f =>
        famSentinels.getOrElseUpdate(f,
          scala.collection.mutable.ArrayBuffer.empty[Double]) += sentinel()
        names.filter(famOf(_) == f).flatMap { n =>
          if (elapsed() + estimate(n) <= wallBudget) {
            val v = materialize(n)
            recordEst(n, v)
            Some(n -> v)
          } else None
        }
      }.toMap
      emit(done.toSeq, isFinal = p == nPasses)
    }
    spark.stop()
  }
}

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
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
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
    names.foreach(materialize) // warmup pass (JIT + page cache), unmeasured
    // measured passes (default 2; SPARK_GRAFT_PASSES for A/B runs)
    // interleaved whole-registry (not N× back-to-back per query), min per
    // query: this box shows ±40% wall-clock noise under background load;
    // the min across spread-out samples reports the query's actual cost
    // rather than the scheduler's worst moment, and keeps round-over-round
    // deltas meaningful. Default was 3 through round 10 — at 369
    // registered queries a 4-execution run (warmup + 3) overran the
    // driver's bench window whenever the box degraded mid-run (r10:
    // rc 124, no record at all; the r11 builder run measured a 7.4x
    // sentinel swing ACROSS its passes, so the third pass was buying
    // noise, not signal). Warmup + min-of-2 keeps the JIT/page-cache
    // discipline and the min-based budget semantics; min-of-2 is
    // stochastically >= min-of-3, a small upward bias the guard's
    // local-sentinel normalization and A/B path absorb.
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
    val passes = (1 to nPasses).map { _ =>
      sentinels += sentinel()
      famOrder.flatMap { f =>
        famSentinels.getOrElseUpdate(f,
          scala.collection.mutable.ArrayBuffer.empty[Double]) += sentinel()
        names.filter(famOf(_) == f).map(n => n -> materialize(n))
      }.toMap
    }
    val results = names.map(n => n -> passes.map(_(n)).min)
    // which pass (1-based) produced each query's min — the guard pairs
    // it with that pass's family sentinel for local normalization
    val minPass = names.map(n =>
      n -> (passes.map(_(n)).zipWithIndex.minBy(_._1)._2 + 1)).toMap
    val sentinelJson = sentinels.map(v => f"$v%.3f").mkString("[", ",", "]")
    val famSentJson = famSentinels.map { case (f, xs) =>
      "\"" + f + "\":" + xs.map(v => f"$v%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")

    // per-query ceiling readout (stderr — the stdout JSON line is
    // size-budgeted): every query whose min-of-N exceeds the absolute
    // ceiling is named HERE, at measurement time, so a new gate that
    // lands heavy needs its committed waiver at birth — closeout.py
    // enforces the same ceiling against explained.json
    val ceiling = sys.env.getOrElse("SPARK_GRAFT_CEILING_SECS", "12").toDouble
    results.filter(_._2 > ceiling).sortBy(-_._2).foreach { case (n, v) =>
      System.err.println(f"[bench] CEILING $n: $v%.2f s exceeds the " +
        f"$ceiling%.0f s per-query ceiling — waive in explained.json or reclaim")
    }

    val total = results.map(_._2).sum
    // batch vs streaming subtotals: the 13 true-streaming queries carry
    // fixed per-microbatch checkpoint/state-store drain cost, so the
    // round-over-round plan-quality signal is batch_total, not the mix
    val streamTotal = results
      .collect { case (n, v) if queries.Events.streamingNames(n) => v }.sum
    val batchTotal = total - streamTotal
    // per-family subtotals (prefix before the first digit: a, q, sql, j,
    // k, p, t, d, v, c, e, er, g, m, dq): the round-over-round signal at
    // one level finer than batch/stream — a regression inside one family
    // is visible even when the totals wash out
    val famTotals = results
      .groupBy { case (n, _) => n.takeWhile(!_.isDigit) }
      .map { case (f, xs) => f -> xs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val fams = famTotals.map { case (f, v) => "\"" + f + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    def line(entries: Seq[(String, Double)], extra: String): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","batch_total":$batchTotal%.3f,"stream_total":$streamTotal%.3f,"sentinel_secs":$sentinelJson,"sentinel_by_family":$famSentJson,"families":$fams$extra,"queries":$qs,"sf":"$sfDir"}"""
    }
    // The full per-query record goes to a FILE, not the log: the harness
    // keeps only a ~2000-byte log tail, and a 171-query JSON line (~6 KB)
    // printed before the compact one would leave a truncated JSON
    // fragment at the tail's head that can shadow the parseable line.
    val minPassJson = names.map(n => "\"" + n + "\":" + minPass(n))
      .mkString("{", ",", "}")
    val fullPath = java.nio.file.Paths.get("target", "bench_full.json")
    java.nio.file.Files.createDirectories(fullPath.getParent)
    java.nio.file.Files.write(fullPath,
      (line(results, s""","min_pass":$minPassJson""") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // stdout gets ONE compact line sized to survive the 2000-byte log
    // tail alongside sbt's trailing [success] line: the slowest queries
    // are kept (they carry the optimization signal); the omitted fast
    // ones are summarized by count + total. min_pass lives only in the
    // full file; sentinel_by_family (~15 families x nPasses, ~400 B)
    // earns its tail space — the guard can't normalize without it.
    val budget = 900 // families + per-family sentinels share the tail
    val bySlowest = results.sortBy(-_._2)
    val kept = bySlowest
      .scanLeft(("", 0.0, 60)) { case ((_, _, acc), (k, v)) => (k, v, acc + k.length + 15) }
      .drop(1).takeWhile(_._3 <= budget).map(t => (t._1, t._2))
      .sortBy(_._1)
    println(line(kept, s""","n_queries":${results.size}"""))
    spark.stop()
  }
}

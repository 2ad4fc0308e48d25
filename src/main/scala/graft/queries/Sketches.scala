package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables => T}
import graft.functions.TextFns
import graft.operators.{CountMin, HllSketch}

/** Registered queries over the mergeable HLL distinct sketch
  * (operators.HllSketch). Both gates are EXACT hash matches — the
  * registers are deterministic md5 arithmetic, so DuckDB reproduces the
  * estimates bit-for-bit; there is no tolerance band to hide behind.
  */
object Sketches {

  // --- a22_hll_distinct: per-group approximate distinct customers next
  // to the exact count — the sketch a 100 TB pipeline reports distinct
  // users/documents with (COUNT(DISTINCT) needs a full shuffle of every
  // distinct value per group; the sketch ships 256 registers per group
  // regardless of cardinality). est lands within ~6.5% rse of exact_n;
  // the gate pins the exact register arithmetic, the spec pins the
  // accuracy band. ---
  val a22HllDistinct = QueryDef.sql(
    "a22_hll_distinct",
    s"""WITH ${HllSketch.sqlRegisters("orders", "o_orderpriority", "o_custkey", "regs")},
       |e AS (${HllSketch.sqlEstimate("regs", "o_orderpriority")}),
       |x AS (SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_n
       |      FROM orders GROUP BY o_orderpriority)
       |SELECT e.o_orderpriority, e.nz, e.est, x.exact_n
       |FROM e JOIN x USING (o_orderpriority)""".stripMargin) { (s, d) =>
    val o = T.orders(s, d)
    val est = HllSketch.estimate(
      HllSketch.registers(o, Seq("o_orderpriority"), col("o_custkey")),
      Seq("o_orderpriority"))
    val exact = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_n"))
    est.join(exact, Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("nz"), col("est"), col("exact_n"))
  }

  // --- k10_hll_merge: incremental distinct state — registers built from
  // the pre-1999 history merged with the post-1999 delta's registers
  // (k8's split), gated against a full single-pass recompute. The hash
  // match proves register-merge ≡ one-shot EXACTLY: distinct state folds
  // forward without ever rescanning history, and the same union+max
  // combines sketches across clusters or days. ---
  val k10HllMerge = QueryDef.sql(
    "k10_hll_merge",
    s"""WITH ${HllSketch.sqlRegisters("lineitem", "l_suppkey", "l_orderkey", "regs")}
       |${HllSketch.sqlEstimate("regs", "l_suppkey")}""".stripMargin) { (s, d) =>
    val li = T.lineitem(s, d)
    val split = to_timestamp(lit("1999-01-01"))
    val pre = HllSketch.registers(
      li.filter(col("l_shipdate") < split), Seq("l_suppkey"), col("l_orderkey"))
    val post = HllSketch.registers(
      li.filter(col("l_shipdate") >= split), Seq("l_suppkey"), col("l_orderkey"))
    HllSketch.estimate(
      HllSketch.merge(pre, post, Seq("l_suppkey")), Seq("l_suppkey"))
  }

  // --- a23_cms_freq: Count-Min frequency estimates for the corpus's 20
  // most frequent tokens, next to the exact counts. The Spark side
  // builds the sketch as a MERGE of two half-corpus sketches while the
  // oracle sketches in one pass — the hash match proves counter-merge ≡
  // one-shot AND pins every md5 collision in the estimates (est_n >=
  // exact_n, bit-identical overshoot). At 100 TB the sketch is the 8 KB
  // answer to "how often does X occur" without a vocabulary-sized
  // state. ---
  private val sqlWsCollapsed = """trim(regexp_replace(text, '\s+', ' ', 'g'))"""
  private val sqlToks = s"string_split($sqlWsCollapsed, ' ')"

  val a23CmsFreq = QueryDef.sql(
    "a23_cms_freq",
    s"""WITH toks AS (SELECT unnest($sqlToks) AS t FROM documents),
       |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS exact_n FROM toks GROUP BY t),
       |pos AS (SELECT t, exact_n, j,
       |    CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || ':' || t), 1, 2)) AS BIGINT) AS p
       |  FROM cnt, LATERAL (SELECT unnest(range(0, ${CountMin.depth})) AS j) r),
       |counters AS (SELECT j, p, CAST(sum(exact_n) AS BIGINT) AS c FROM pos GROUP BY j, p),
       |est AS (SELECT t, min(coalesce(c.c, 0)) AS est_n
       |  FROM pos LEFT JOIN counters c ON c.j = pos.j AND c.p = pos.p GROUP BY t),
       |top AS (SELECT t, exact_n FROM cnt ORDER BY exact_n DESC, t LIMIT 20)
       |SELECT top.t AS token, top.exact_n, est.est_n
       |FROM top JOIN est ON est.t = top.t""".stripMargin) { (s, d) =>
    val docs = T.documents(s, d)
    val toks = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
    val cms = CountMin.merge(
      CountMin.sketch(toks.filter(col("doc_id") % 2 === 0), col("t")),
      CountMin.sketch(toks.filter(col("doc_id") % 2 =!= 0), col("t")))
    val cnt = toks.groupBy(col("t")).agg(count(lit(1)).as("exact_n"))
    val top = cnt.orderBy(col("exact_n").desc, col("t")).limit(20)
    CountMin.lookup(cms, top, "t")
      .join(top, Seq("t"))
      .select(col("t").as("token"), col("exact_n"), col("est_n"))
  }

  // --- a60_quantile_sketch: mergeable DETERMINISTIC quantile summary
  // (operators.QuantileSketch) — per-returnflag price quantiles read
  // off a bounded weighted-sample sketch instead of a global sort, the
  // third mergeable-state family next to HLL (distincts) and Count-Min
  // (frequencies). The Spark side answers each quantile twice: from a
  // ONE-SHOT summary of lineitem and from the MERGE of two summaries
  // built over disjoint shipdate halves — union, no recompression, no
  // history rescan — and joins each estimate's EXACT rank back from the
  // base table. The oracle reproduces the identical sketch (md5 cell
  // scatter, stride samples, value-cumulative weights are all
  // deterministic integer/sort arithmetic — no RNG, unlike t-digest/
  // KLL), so the hash gate pins estimates bit-for-bit AND proves
  // merge-validity: both methods' `within_bound` re-derives the n/k
  // rank guarantee from exact ranks. At 100 TB this summary is the
  // range-partition splitter feed (TeraSort's sample sort) and the
  // percentile dashboard that never re-sorts history. ---
  private val B = 32 // md5 scatter cells
  private val K = 64 // samples kept per cell

  private val a60OracleSql = {
    val hx = "md5(CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR))"
    val hexOf = "instr('0123456789abcdef', %s) - 1"
    s"""WITH base AS (SELECT l_returnflag AS flag, CAST(l_extendedprice AS DOUBLE) AS v,
       |    ((${hexOf.format(s"substr($hx,1,1)")}) * 16 + ${hexOf.format(s"substr($hx,2,1)")}) % $B AS b,
       |    CASE WHEN l_shipdate < TIMESTAMP '1996-01-01' THEN 0 ELSE 1 END AS half
       |  FROM lineitem),
       |s1 AS (SELECT 'oneshot' AS method, flag, v,
       |    row_number() OVER (PARTITION BY flag, b ORDER BY v) AS rn,
       |    count(*) OVER (PARTITION BY flag, b) AS cnt FROM base),
       |s2 AS (SELECT 'merged' AS method, flag, v,
       |    row_number() OVER (PARTITION BY flag, b, half ORDER BY v) AS rn,
       |    count(*) OVER (PARTITION BY flag, b, half) AS cnt FROM base),
       |u AS (SELECT *, (cnt + ${K - 1}) // $K AS stride FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)),
       |samp AS (SELECT method, flag, v,
       |    CASE WHEN rn % stride = 0 THEN stride ELSE cnt % stride END AS wt
       |  FROM u WHERE rn % stride = 0 OR (rn = cnt AND cnt % stride <> 0)),
       |g AS (SELECT method, flag, v, CAST(sum(wt) AS BIGINT) AS wt FROM samp GROUP BY ALL),
       |cum AS (SELECT method, flag, v,
       |    sum(wt) OVER (PARTITION BY method, flag ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw
       |  FROM g),
       |tot AS (SELECT method, flag, CAST(sum(wt) AS BIGINT) AS tot FROM g GROUP BY ALL),
       |qs AS (SELECT unnest([CAST(0.01 AS DOUBLE), CAST(0.25 AS DOUBLE),
       |    CAST(0.5 AS DOUBLE), CAST(0.75 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
       |tg AS (SELECT method, flag, q, tot,
       |    CAST(ceil(q * CAST(tot AS DOUBLE)) AS BIGINT) AS t FROM tot, qs),
       |est AS (SELECT tg.method, tg.flag, tg.q, tg.tot AS n, tg.t, min(cum.v) AS est
       |  FROM tg JOIN cum ON cum.method = tg.method AND cum.flag = tg.flag
       |  WHERE cum.cw >= tg.t GROUP BY ALL),
       |rk AS (SELECT method, e.flag, q, est, n, t,
       |    (SELECT CAST(count(*) AS BIGINT) FROM base WHERE base.flag = e.flag AND base.v <= e.est) AS exact_rank
       |  FROM est e)
       |SELECT method, flag, q, est, exact_rank, n,
       |  abs(exact_rank - t) <= (CASE WHEN method = 'oneshot'
       |    THEN (2 * n) // $K + $B + 2 ELSE (4 * n) // $K + 2 * $B + 2 END) AS within_bound
       |FROM rk""".stripMargin
  }

  val a60QuantileSketch = QueryDef.sql("a60_quantile_sketch", a60OracleSql) { (s, d) =>
    import graft.operators.QuantileSketch
    val li = T.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      col("l_extendedprice").as("price"),
      concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string")).as("rk"),
      col("l_shipdate"))
    val cut = to_timestamp(lit("1996-01-01"))
    def summ(df: org.apache.spark.sql.DataFrame) =
      QuantileSketch.summarize(df, Seq("flag"), col("price"), col("rk"), B, K)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val oneshot = QuantileSketch.quantiles(summ(li), Seq("flag"), qs)
      .withColumn("method", lit("oneshot"))
    val merged = QuantileSketch.quantiles(
      QuantileSketch.merge(
        summ(li.filter(col("l_shipdate") < cut)),
        summ(li.filter(col("l_shipdate") >= cut))),
      Seq("flag"), qs).withColumn("method", lit("merged"))
    val ests = oneshot.unionByName(merged)
    val base = li.select(col("flag"), col("price"))
    val n = base.groupBy(col("flag")).agg(count(lit(1)).as("n"))
    // exact rank of each estimate: 30-row broadcast against one scan
    val ranks = base.join(broadcast(ests), Seq("flag"))
      .filter(col("price") <= col("est"))
      .groupBy(col("method"), col("flag"), col("q"), col("est"))
      .agg(count(lit(1)).as("exact_rank"))
    ranks.join(n, Seq("flag"))
      .withColumn("t", ceil(col("q") * col("n").cast("double")).cast("long"))
      .select(col("method"), col("flag"), col("q"), col("est"),
        col("exact_rank"), col("n"),
        (abs(col("exact_rank") - col("t")) <=
          when(col("method") === "oneshot",
            expr(s"(2 * n) div $K + ${B + 2}"))
          .otherwise(expr(s"(4 * n) div $K + ${2 * B + 2}")))
          .as("within_bound"))
  }

  val all: Seq[QueryDef] = Seq(a22HllDistinct, k10HllMerge, a23CmsFreq, a60QuantileSketch)
}

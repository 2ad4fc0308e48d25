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

  val all: Seq[QueryDef] = Seq(a22HllDistinct, k10HllMerge, a23CmsFreq)
}

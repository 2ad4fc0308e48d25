package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables => T}
import graft.operators.HllSketch

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

  val all: Seq[QueryDef] = Seq(a22HllDistinct, k10HllMerge)
}

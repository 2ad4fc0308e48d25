package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.queries.{Clustering, Extras}

/** Evidence for the newest supervised/order-statistic operators:
  * c4's Gini stump against an in-memory brute force over random data,
  * and a39's global decile binning invariants at fixture scale. */
class StumpBinningSpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default

  private def data(seed: Long, n: Int): List[(Long, Long)] =
    Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L), Gen.oneOf(0L, 1L)))
      .pureApply(params, Seed(seed))

  test("giniStump matches an in-memory brute force on random data") {
    for (seed <- 1L to 6L) {
      val rows = data(seed, 400)
      val got = Clustering.giniStump(rows.toDF("x", "pos"))
        .select("kk", "t", "nl", "nlp", "gini")
        .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
      val mn = rows.map(_._1).min; val mx = rows.map(_._1).max
      val n = rows.size.toLong; val npos = rows.map(_._2).sum
      assert(got.length === 9)
      got.foreach { case (kk, t, nl, nlp, gini) =>
        assert(t === mn + (mx - mn) * kk / 10, s"seed=$seed threshold kk=$kk")
        val expNl = rows.count(_._1 <= t).toLong
        val expNlp = rows.filter(_._1 <= t).map(_._2).sum
        assert(nl === expNl, s"seed=$seed nl kk=$kk")
        assert(nlp === expNlp, s"seed=$seed nlp kk=$kk")
        val nr = n - nl; val nrp = npos - nlp
        def imp(m: Long, p: Long): Double =
          if (m == 0) 0.0 else m - (p * p + (m - p) * (m - p)) / m.toDouble
        assert(math.abs(gini - (imp(nl, nlp) + imp(nr, nrp)) / n) < 1e-12,
          s"seed=$seed gini kk=$kk")
      }
      // the split the stump flags as best really is the grid argmin
      val best = got.minBy(_._5)
      assert(got.forall(_._5 >= best._5 - 1e-15))
    }
  }

  test("giniStump on a constant feature (nr = 0) yields finite impurity") {
    // mn == mx makes every threshold mx, so the right side is empty at
    // every split; the guarded impurity must be the pure-left Gini, not
    // NULL (Spark non-ANSI x/0) or NaN (IEEE).
    val rows = List.fill(50)((7L, 1L)) ++ List.fill(30)((7L, 0L))
    val got = Clustering.giniStump(rows.toDF("x", "pos"))
      .select("kk", "nl", "nr", "gini")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length === 9)
    val n = 80L; val npos = 50L
    val expected = (n - (npos * npos + (n - npos) * (n - npos)) / n.toDouble) / n
    got.foreach { case (kk, nl, nr, gini) =>
      assert(nl === n && nr === 0L, s"kk=$kk sides")
      assert(!gini.isNaN && math.abs(gini - expected) < 1e-12, s"kk=$kk gini=$gini")
    }
  }

  test("a39 deciles partition all orders and revenue rises with the bin") {
    val out = Extras.a39DecileBinning.run(spark, sfDir)
      .select("decile", "n_orders", "revenue")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val n = Tables.orders(spark, sfDir).count()
    assert(out.map(_._2).sum === n)            // bins partition the table
    assert(out.map(_._1).toSeq === (1L to 10L)) // all ten bins occupied
    // per-order average price must strictly increase across deciles —
    // the defining invariant of value-ordered binning
    val avg = out.map(t => t._3 / t._2)
    assert(avg.zip(avg.tail).forall { case (a, b) => a < b })
    // near-equal occupancy: rank-targeted bounds put each bin within
    // ±2 of n/10 unless the fixture had heavy price ties (it doesn't)
    out.foreach { case (dec, cnt, _) =>
      assert(math.abs(cnt - n / 10) <= 2, s"decile $dec size $cnt vs ${n / 10}")
    }
  }
}

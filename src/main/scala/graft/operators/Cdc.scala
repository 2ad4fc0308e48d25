package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold an ordered change feed into a base
  * snapshot.
  *
  * The reference's pipelines emulate this with per-run keyed upserts
  * (`/root/reference/src/etl-square-payments.ts:59-95` — every run
  * re-upserts the lookback window); a real CDC feed additionally carries
  * deletes and multiple changes per key per batch. `apply` generalizes
  * the upsert contract to that shape:
  *
  *   - feed rows carry an op column (`I`/`U` upsert, `D` delete) and a
  *     per-key monotonically increasing sequence column;
  *   - the LAST change per key wins (snapshot rows rank below every feed
  *     row);
  *   - a key whose last change is `D` disappears;
  *   - keys untouched by the feed carry through unchanged.
  *
  * Cost model: one hash shuffle of snapshot ∪ feed on the key — the
  * minimum for any keyed merge — then a per-key top-1 window that AQE
  * executes as partial top-k before the exchange. No broadcast needed on
  * either side, so it scales to a 100 TB snapshot with a feed of any
  * size.
  */
object Cdc {

  /** Returns the post-apply table: snapshot columns (op/seq dropped).
    *
    * @param snapshot base rows; must NOT contain `opCol`/`seqCol`
    * @param feed     change rows: snapshot columns + `opCol` + `seqCol`
    * @param keys     key column names (present in both inputs)
    * @param opCol    op column in `feed`: "I" | "U" | "D"
    * @param seqCol   ordering column in `feed`; values must be > 0 and
    *                 distinct per key (snapshot rows implicitly rank 0)
    */
  def apply(
      snapshot: DataFrame,
      feed: DataFrame,
      keys: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    require(!snapshot.columns.contains(opCol) && !snapshot.columns.contains(seqCol),
      s"snapshot must not carry $opCol/$seqCol")
    val base = snapshot
      .withColumn(opCol, lit("I"))
      .withColumn(seqCol, lit(0L))
    val all = base.unionByName(feed.withColumn(seqCol, col(seqCol).cast("long")))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    all
      .withColumn("__cdc_rk", row_number().over(w))
      .filter(col("__cdc_rk") === 1 && col(opCol) =!= "D")
      .drop("__cdc_rk", opCol, seqCol)
  }
}

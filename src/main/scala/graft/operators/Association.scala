package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — pairwise support / confidence / lift
  * over (basket, item) rows. The classic co-occurrence signal (recommender
  * candidates, bundle detection, template-co-occurrence diagnostics in a
  * document corpus where basket = page and item = boilerplate segment).
  *
  * Greenfield extension (nothing in the reference; nearest analog is the
  * co-purchase graph family q130/q131/q135, which scores STRUCTURE where
  * this scores STRENGTH).
  */
object Association {

  /** Top-`topK` item pairs by lift, with exact integer metrics.
    *
    * For unordered pair (a < b): `s_ab` = baskets containing both, `s_a`/
    * `s_b` = baskets containing each, N = total baskets;
    * `conf_ab = s_ab/s_a`, `conf_ba = s_ab/s_b`, `lift = s_ab·N/(s_a·s_b)`
    * — all emitted as micro-unit longs via integer division of integer
    * products, so every engine computes identical values (no float ratio
    * ever forms). Pairs below `minSupport` co-baskets are cut BEFORE the
    * metric joins.
    *
    * Scale shape: the pair generator is the per-basket self-join — each
    * basket of size d contributes C(d, 2) rows, so basket SIZE is the
    * quadratic hazard (order-line baskets are naturally small; cap
    * pathological baskets upstream with [[ScaleOps.capPerKey]]). Item
    * supports are one groupBy; N is a 1-row broadcast; the minSupport cut
    * shrinks the pair table before both support joins. Overflow bound:
    * lift's numerator `1e6·s_ab·N` needs s_ab·N < 9.2e12 — fine to ~3M
    * baskets of fully-correlated pairs; beyond that quantize to
    * centi-units upstream. */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 5, topK: Int = 50): DataFrame = {
    require(minSupport >= 1 && topK >= 1, "minSupport >= 1, topK >= 1")
    val items = graft.core.CacheScope.persist(
      baskets.select(col(basketCol).as("o"), col(itemCol).cast("long").as("p"))
        .distinct())
    val n = items.select(countDistinct(col("o")).as("n_baskets"))
    val supp = items.groupBy(col("p")).agg(count(lit(1)).as("s"))
    val pairs = items.as("i").join(items.as("j"),
        col("i.o") === col("j.o") && col("i.p") < col("j.p"))
      .groupBy(col("i.p").as("a"), col("j.p").as("b"))
      .agg(count(lit(1)).as("s_ab"))
      .where(col("s_ab") >= minSupport)
    val ord = Seq(col("lift_micro").desc, col("a"), col("b"))
    pairs
      .join(supp.select(col("p").as("a"), col("s").as("s_a")), "a")
      .join(supp.select(col("p").as("b"), col("s").as("s_b")), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("s_ab"), col("s_a"), col("s_b"),
        expr("(1000000L * s_ab) div s_a").as("conf_ab_micro"),
        expr("(1000000L * s_ab) div s_b").as("conf_ba_micro"),
        expr("(1000000L * s_ab * n_baskets) div (s_a * s_b)")
          .as("lift_micro"))
      .orderBy(ord: _*)
      .limit(topK)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0)).orderBy(ord: _*)).cast("long"))
  }
}

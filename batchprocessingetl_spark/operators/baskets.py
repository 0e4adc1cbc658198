"""Market-basket co-occurrence mining (A-priori candidate pairs).

Reference scope: the reference engine has no basket operator; this is
north-star surface for large-scale training-data / commerce analytics.
Design notes for 100 TB:

- The pair join is keyed on the BASKET id, so blow-up is
  sum_baskets C(k, 2) — bounded by basket width, never corpus².
- A-priori prefilter: an item whose own basket-support is below
  ``min_support`` cannot appear in any pair with support >=
  ``min_support`` (pair support <= min(item supports)), so filtering
  items FIRST is semantics-preserving and shrinks the self-join input
  before the quadratic step. On skewed catalogs (most items are
  long-tail) this removes the bulk of the join input for free.
- Giant-basket guard: one pathological basket of width k contributes
  C(k, 2) pairs; ``max_basket_width`` drops baskets wider than the cap
  (standard practice in production basket mining — a 10k-item "basket"
  is a crawler, not a customer). Capping CHANGES the answer, so it is
  off by default and the dropped count is surfaced loudly, never
  silently.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, functions as F

log = logging.getLogger(__name__)


def copurchase_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
    max_basket_width: int | None = None,
) -> DataFrame:
    """Frequent item pairs: (item_a, item_b, support) with item_a <
    item_b and support >= ``min_support`` (support = number of distinct
    baskets containing both items).

    Plan shape: distinct (basket, item) -> [optional width guard] ->
    A-priori item-support prefilter (groupBy item, filter, semi-join
    back) -> within-basket ordered self-join -> hash-agg on the pair ->
    support prune. Two shuffles on the basket key (distinct + join)
    that AQE can co-plan, one map-side-combinable pair aggregate; the
    support prefilter's item table is aggregate-sized, broadcast by
    AQE when small.

    ``max_basket_width``: drop whole baskets wider than the cap before
    pairing; the dropped-basket count is computed and logged (one extra
    aggregate over the width table — pay it only when capping).
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    bi = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()

    if max_basket_width is not None:
        widths = bi.groupBy("__basket").agg(F.count(F.lit(1)).alias("__w"))
        dropped = widths.filter(F.col("__w") > max_basket_width)
        n_dropped = dropped.count()
        if n_dropped:
            log.warning(
                "copurchase_pairs: dropping %d baskets wider than %d "
                "(answer is now support over the capped basket set)",
                n_dropped,
                max_basket_width,
            )
        bi = bi.join(
            widths.filter(F.col("__w") <= max_basket_width).select("__basket"),
            "__basket",
        )

    # A-priori pass 1: item support. Pair support <= min(item supports),
    # so items below min_support can never appear in a surviving pair.
    frequent = (
        bi.groupBy("__item")
        .agg(F.count(F.lit(1)).alias("__sup"))
        .filter(F.col("__sup") >= min_support)
        .select("__item")
    )
    # materialize the filtered basket-item frame through one exchange
    # keyed on the basket: both sides of the self-join then consume the
    # SAME exchange (ReuseExchange) instead of re-running the distinct
    # + prefilter pipeline twice (the lsh_candidate_pairs trick).
    par = df.sparkSession.sparkContext.defaultParallelism
    bi = bi.join(frequent, "__item", "left_semi").repartition(par, "__basket")

    a, b = bi.alias("a"), bi.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__basket") == F.col("b.__basket"))
        & (F.col("a.__item") < F.col("b.__item")),
    ).select(F.col("a.__item").alias("item_a"), F.col("b.__item").alias("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
    max_basket_width: int | None = None,
) -> DataFrame:
    """Association-rule metrics over the frequent pairs: for every
    surviving (a < b) pair, both directed confidences
    (P(b|a) = sup_ab / sup_a, P(a|b) = sup_ab / sup_b) and the
    symmetric lift (sup_ab · n_baskets / (sup_a · sup_b)) — the
    signals that separate "popular with everything" items from real
    affinities (lift > 1).

    Adds two aggregate-sized frames to :func:`copurchase_pairs`'s
    plan: per-item basket supports (joined twice on the item key, AQE
    broadcasts them when small) and the 1-row basket count. Every
    metric is one IEEE double division/multiply of exact integer
    counts, so any engine computes identical bits — no rounding
    needed for cross-engine parity."""
    pairs = copurchase_pairs(df, basket_col, item_col, min_support, max_basket_width)
    bi = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    item_sup = bi.groupBy("__item").agg(F.count(F.lit(1)).alias("__sup"))
    n_baskets = bi.agg(F.count_distinct("__basket").alias("__n"))
    sa = item_sup.select(F.col("__item").alias("item_a"), F.col("__sup").alias("sup_a"))
    sb = item_sup.select(F.col("__item").alias("item_b"), F.col("__sup").alias("sup_b"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "support",
            "sup_a",
            "sup_b",
            (d("support") / d("sup_a")).alias("conf_a_to_b"),
            (d("support") / d("sup_b")).alias("conf_b_to_a"),
            (d("support") * d("__n") / (d("sup_a") * d("sup_b"))).alias("lift"),
        )
    )

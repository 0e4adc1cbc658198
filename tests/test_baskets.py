"""operators/baskets.py — A-priori co-purchase pair mining."""

from itertools import combinations

import pytest

from batchprocessingetl_spark.operators.baskets import copurchase_pairs


def _rows(df):
    return {(r["item_a"], r["item_b"], r["support"]) for r in df.collect()}


def _brute(baskets: dict[int, set[int]], minsup: int) -> set[tuple]:
    counts: dict[tuple, int] = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return {(a, b, n) for (a, b), n in counts.items() if n >= minsup}


@pytest.fixture()
def baskets():
    # 20 baskets; items 1/2 co-occur often, 99 appears once (below any
    # support), duplicates inside a basket must not inflate support
    data = {}
    for k in range(20):
        items = {1, 2} if k % 2 == 0 else {1, 3}
        if k == 0:
            items |= {99}
        if k % 5 == 0:
            items |= {4}
        data[k] = items
    return data


def _df(spark, baskets, dup_first=False):
    rows = [(k, i) for k, items in baskets.items() for i in items]
    if dup_first:
        rows += rows[:5]  # duplicate (basket, item) rows: support unchanged
    return spark.createDataFrame(rows, "basket long, item long")


def test_matches_bruteforce(spark, baskets):
    df = _df(spark, baskets, dup_first=True)
    got = _rows(copurchase_pairs(df, "basket", "item", 3))
    assert got == _brute(baskets, 3)
    assert got  # non-trivial fixture


def test_prefilter_is_semantics_preserving(spark, baskets):
    """The A-priori item prefilter must not change the answer at ANY
    min_support (pair support <= min(item supports))."""
    df = _df(spark, baskets)
    for minsup in (1, 2, 4, 10):
        assert _rows(copurchase_pairs(df, "basket", "item", minsup)) == _brute(
            baskets, minsup
        )


def test_width_cap_drops_giant_baskets(spark, baskets, caplog):
    wide = dict(baskets)
    wide[100] = set(range(200, 230))  # 30-item pathological basket
    df = _df(spark, wide)
    with caplog.at_level("WARNING"):
        got = _rows(copurchase_pairs(df, "basket", "item", 3, max_basket_width=10))
    # capped answer == brute force over the basket set minus the giant
    assert got == _brute(baskets, 3)
    assert any("dropping 1 baskets" in m for m in caplog.messages)


def test_min_support_validation(spark, baskets):
    with pytest.raises(ValueError):
        copurchase_pairs(_df(spark, baskets), "basket", "item", 0)

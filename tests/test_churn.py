"""Churn-aware bucket sizing (the r11 5M-soak scale fix).

The r11 soak attempt measured an IVM whose per-batch cost was ~O(state)
at 5M rows: 2k keys/batch over 1024 buckets touches 1-e^-2 ~ 86% of the
table every batch (artifacts/SOAK_r11_attempt.json).  These tests pin
the sizing rule that closes it — buckets >= factor x keys/batch — and
its guards (grow-only, bulk-load fragmentation cap, EWMA smoothing).
"""

import math

import pytest
from pyspark.sql import functions as F

from pypgcdc_spark.operators.churn import (
    CHURN_FACTOR,
    ChurnEwma,
    expected_touched,
    next_pow2,
    prev_pow2,
    recommend_buckets,
    touched_buckets_and_keys,
)


def test_pow2_helpers():
    assert [next_pow2(n) for n in (0, 1, 2, 3, 1000, 1024)] == [1, 1, 2, 4, 1024, 1024]
    assert [prev_pow2(n) for n in (0, 1, 2, 3, 1000, 1024)] == [1, 1, 2, 2, 512, 1024]


def test_expected_touched_matches_closed_form():
    # 2000 keys over 1024 buckets: the soak's own 1 - e^-2 ~ 86%.
    t = expected_touched(2000, 1024)
    assert t / 1024 == pytest.approx(1 - math.exp(-2000 / 1024), rel=1e-12)
    # B >> K: touched -> K (per-batch file count bounded by keys).
    assert expected_touched(2000, 1 << 20) == pytest.approx(2000, rel=0.01)


def test_bytes_rule_unchanged():
    # Volume growth without churn knowledge: exact r8 behavior.
    assert recommend_buckets(8, 100 << 20, 1 << 20, None) == 128
    assert recommend_buckets(64, 1 << 20, 1 << 20, None) == 64  # under target


def test_churn_rule_soak_scenario():
    """The exact r11 failure: ~2k keys/batch, 150MB state, byte target
    131072 gave 1024 buckets and an 86% rewrite.  The churn rule demands
    8x2000 -> 16384, byte-floor-capped to 4096 at this state size (the
    measured ~5ms/dir file-op cost makes sub-32KB buckets a net loss —
    see MIN_CHURN_BUCKET_BYTES): rewritten fraction drops 86% -> ~39%,
    and converges to ~12% as state (and so the cap) grows."""
    n = recommend_buckets(1024, 150 << 20, 131072, keys_ewma=2000.0)
    assert n == 4096
    frac_before = 1 - math.exp(-2000 / 1024)
    frac_after = 1 - math.exp(-2000 / n)
    assert frac_before > 0.85 and frac_after < 0.40
    # Bigger state, same churn: the cap lifts and the full x8 headroom
    # applies (~12% rewritten).
    n_big = recommend_buckets(1024, 2 << 30, 131072 << 4, keys_ewma=2000.0)
    assert n_big == 16384
    assert 1 - math.exp(-2000 / n_big) < 0.13


def test_churn_growth_capped_for_small_state():
    """A bulk-load batch (50k keys) over a tiny state must NOT fragment
    it into hundreds of thousands of files: churn growth is capped at
    state_bytes / MIN_CHURN_BUCKET_BYTES (bucket count is irrelevant to
    row I/O when every batch rewrites most of state anyway)."""
    # 2 MB state: cap = prev_pow2(2MB/32KB) = 64, not 8x50k = 524288.
    assert recommend_buckets(8, 2 << 20, 128 << 20, keys_ewma=50_000.0) == 64
    # Tiny state: churn can never grow past min_buckets.
    assert recommend_buckets(8, 2048, 128 << 20, keys_ewma=50_000.0) == 8


def test_grow_only_and_bytes_rule_uncapped():
    # Shrinking churn never shrinks buckets (grow-only, no relayout thrash).
    assert recommend_buckets(4096, 1 << 20, 128 << 20, keys_ewma=2.0) == 4096
    # The BYTES rule is never churn-capped: volume genuinely needs buckets.
    assert recommend_buckets(8, 10 << 30, 128 << 20, keys_ewma=1.0) == 128


def test_ewma_smoothing():
    e = ChurnEwma(alpha=0.3)
    assert e.value is None
    assert e.observe(1000) == 1000.0  # first observation seeds
    v = e.observe(10_000)  # one outlier moves it only by alpha
    assert v == pytest.approx(0.3 * 10_000 + 0.7 * 1000)
    # Serialization round-trip (the sidecar path).
    e2 = ChurnEwma(value=e.value)
    assert e2.value == e.value


def test_touched_buckets_and_keys_one_collect(spark):
    """The per-batch observation: same bucket ids as the pruning path,
    plus a distinct-key total accurate enough for an x8 sizing factor."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("uid")  # 700 distinct keys, repeated
    )
    bucket = F.pmod(F.col("uid"), F.lit(16)).cast("int")
    buckets, keys = touched_buckets_and_keys(df, bucket, F.col("uid"))
    assert buckets == list(range(16))  # 700 keys saturate 16 buckets
    assert keys == pytest.approx(700, rel=0.05)  # HLL++ ~2% error


def test_factor_default_bounds_rewrite_fraction():
    assert 1 - math.exp(-1 / CHURN_FACTOR) < 0.125

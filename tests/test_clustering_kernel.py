"""The fused map-only Lloyd iteration (`_train_update`) must return
bit-identical centroids to the JVM-arithmetic reference
(`_update(_assign(...))`) — sums, long→double division, and HALF_UP
rounding all replicated exactly (r12 optimization: the reference shape
planned a fresh 65-column HashAggregate per iteration, ~2 s of pure
Catalyst/codegen latency at any data size)."""

import pytest
from pyspark.sql import functions as F

from pypgcdc_spark.operators.clustering import (
    K,
    _assign,
    _round_half_up,
    _scaled,
    _train_update,
    _update,
)
from pypgcdc_spark.queries import load


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_train_update_matches_jvm_reference(spark, sf_dir):
    (emb,) = load(spark, sf_dir, "embeddings")
    vectors = emb.select(
        "vec_id", "label", _scaled(F.col("embedding")).alias("v")
    ).localCheckpoint(eager=True)
    seeds = vectors.orderBy("vec_id").limit(K).select("vec_id", "v").collect()
    cents = [
        (cid, list(r.v)) for cid, r in enumerate(sorted(seeds, key=lambda r: r.vec_id))
    ]
    # Two chained iterations: any divergence in iteration 1 would compound.
    for _ in range(2):
        ref = _update(_assign(vectors, cents))
        fused = _train_update(vectors, cents)
        assert fused == ref
        cents = fused


def test_round_half_up_edge_cases():
    # Half away from zero, decided on the decimal rendering (JVM
    # BigDecimal.valueOf semantics) — including the famous
    # binary-vs-decimal traps.
    assert _round_half_up(2.5) == 3
    assert _round_half_up(-2.5) == -3
    assert _round_half_up(0.49999999999999994) == 0
    assert _round_half_up(-0.49999999999999994) == 0
    assert _round_half_up(3.0) == 3
    assert _round_half_up(-7.5) == -8

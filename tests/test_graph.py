"""Property-based check of the connected-components kernel: on arbitrary
random graphs, Spark's min-label propagation must agree with a reference
union-find."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pypgcdc_spark.operators.graph import connected_components, connected_components_star


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id in the component
    comp = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    return {n: min(members) for members in comp.values() for n in members}


@pytest.fixture(scope="module")
def cc_spark():
    from pypgcdc_spark.session import get_spark

    return get_spark("graph-prop", cpus=4)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(cc_spark, edges):
    df = cc_spark.createDataFrame(edges, "a LONG, b LONG")
    got = {r.node: r.lbl for r in connected_components(df, "a", "b").collect()}
    assert got == _union_find_labels(edges)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=60,
    )
)
def test_star_contraction_matches_union_find(cc_spark, edges):
    df = cc_spark.createDataFrame(edges, "a LONG, b LONG")
    got = {r.node: r.lbl for r in connected_components_star(df, "a", "b").collect()}
    assert got == _union_find_labels(edges)


def test_star_contraction_converges_on_long_chain(cc_spark):
    # A 60-node chain has diameter 59 — far beyond the round cap.  Plain
    # propagation would need 59 rounds; star contraction must finish
    # within the same max_iters because it halves distances every round.
    edges = [(i, i + 1) for i in range(59)]
    df = cc_spark.createDataFrame(edges, "a LONG, b LONG")
    got = {r.node: r.lbl for r in connected_components_star(df, "a", "b").collect()}
    assert got == {n: 0 for n in range(60)}

"""Property-based model check for connected components: random edge
lists vs a union-find model.  The recursive-CTE oracle checks the one
dedup-edge shape; hypothesis reaches arbitrary topologies (chains that
need many propagation rounds, stars, disjoint cliques, self-loops).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.operators.graph import connected_components

_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=20,
)


def _model(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    # component label = min node id in the component (the operator's
    # documented fixpoint)
    groups: dict[int, list[int]] = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in groups.values() for n in ns}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _model(edges)


def test_deep_chain_converges_within_default_bound(spark):
    """A diameter-40 path needs 40+ propagation rounds — well past the
    old max_iter=25, which TRUNCATED silently (the sf0.1 embedding
    graph needs 26 and was saved only because its last round happened
    to be the final productive one)."""
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == {i: 0 for i in range(41)}


def test_nonconvergence_raises_not_truncates(spark):
    """Hitting max_iter with labels still moving must raise — an
    unconverged component map fed to a dedup keep-one pass deletes the
    wrong documents."""
    import pytest

    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=3)

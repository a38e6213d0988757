"""Property tests for the graph/timeline driver kernels: random small
inputs vs straightforward brute-force references.  These exercise the
numpy kernels directly (no Ray session) — the driver-vs-bucketed path
equality is pinned by the fixed-toy tests in test_graph.py."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

HOSTS = [f"h{i}" for i in range(7)]

edges_strategy = st.lists(
    st.tuples(st.sampled_from(HOSTS), st.sampled_from(HOSTS),
              st.integers(min_value=1, max_value=5)),
    min_size=1, max_size=25,
)


def _und_set(edges):
    return {(min(s, d), max(s, d)) for s, d, _ in edges if s != d}


@settings(max_examples=60, deadline=None)
@given(edges_strategy)
def test_triangles_matches_bruteforce(edges):
    from deduplicator_ray.stages.graph import _triangles_pandas

    und = _und_set(edges)
    if not und:
        return
    und_df = pd.DataFrame(sorted(und), columns=["u", "v"])
    got = (_triangles_pandas(und_df).to_pandas()
           .set_index("host")["n_triangles"].to_dict())
    nodes = sorted({h for e in und for h in e})
    want: dict[str, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if ({(a, b), (a, c), (b, c)} <= und):
            for h in (a, b, c):
                want[h] = want.get(h, 0) + 1
    assert got == want


@settings(max_examples=60, deadline=None)
@given(edges_strategy, st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=5))
def test_kcore_matches_naive_peeling(edges, k, rounds):
    from deduplicator_ray.stages.graph import _kcore_numpy

    und = _und_set(edges)
    if not und:
        return
    und_df = pd.DataFrame(sorted(und), columns=["u", "v"])
    got = (_kcore_numpy(und_df, k, rounds).to_pandas()
           .set_index("host")["core_degree"].to_dict())
    alive = {h for e in und for h in e}
    for _ in range(rounds):
        deg = {h: 0 for h in alive}
        for u, v in und:
            if u in alive and v in alive:
                deg[u] += 1
                deg[v] += 1
        alive = {h for h in alive if deg[h] >= k}
    deg = {h: 0 for h in alive}
    for u, v in und:
        if u in alive and v in alive:
            deg[u] += 1
            deg[v] += 1
    assert got == deg


@settings(max_examples=40, deadline=None)
@given(edges_strategy, st.integers(min_value=1, max_value=4))
def test_hits_matches_direct_recursion(edges, iters):
    from deduplicator_ray.stages.graph import _hits_numpy

    pdf = (pd.DataFrame(edges, columns=["src_host", "dst_host", "n_links"])
           .groupby(["src_host", "dst_host"], as_index=False)
           .agg(n_links=("n_links", "sum")))
    scale = 1000
    out = (_hits_numpy(pdf, "src_host", "dst_host", "n_links", iters, scale)
           .to_pandas().set_index("host"))
    hosts = sorted(set(pdf["src_host"]) | set(pdf["dst_host"]))
    h = {x: scale for x in hosts}
    a = {x: scale for x in hosts}
    elist = list(pdf.itertuples(index=False))
    for _ in range(iters):
        araw = {x: 0 for x in hosts}
        for e in elist:
            araw[e.dst_host] += h[e.src_host] * e.n_links
        m = max(araw.values()) or 1
        a = {x: (araw[x] * scale) // max(m, 1) for x in hosts}
        hraw = {x: 0 for x in hosts}
        for e in elist:
            hraw[e.src_host] += a[e.dst_host] * e.n_links
        m = max(hraw.values()) or 1
        h = {x: (hraw[x] * scale) // max(m, 1) for x in hosts}
    for x in hosts:
        assert out.loc[x, "hub"] == h[x], x
        assert out.loc[x, "auth"] == a[x], x


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2", "s3"]),
                          st.integers(min_value=0, max_value=400)),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=120))
def test_capture_burst_matches_bruteforce(caps, window):
    """The burst kernel's math (sorted slices + disjoint-range shift,
    replicated here — the real operator is pinned by the fixed test in
    test_timeline_scope.py) vs the O(n^2) definition: max over captures
    of same-site captures in [t, t+window)."""
    df = pd.DataFrame(caps, columns=["site", "ts"]).sort_values(
        ["site", "ts"], kind="mergesort", ignore_index=True)
    ts = df["ts"].to_numpy(dtype=np.int64)
    sites, starts, counts = np.unique(df["site"].to_numpy(),
                                      return_index=True, return_counts=True)
    stride = (int(ts.max()) - int(ts.min())) + window + 1
    site_id = np.repeat(np.arange(len(sites), dtype=np.int64), counts)
    shifted = ts + site_id * np.int64(stride)
    upper = np.searchsorted(shifted, shifted + np.int64(window), side="left")
    cnt = upper - np.arange(len(ts), dtype=np.int64)
    burst = dict(zip(sites, np.maximum.reduceat(cnt, starts)))

    want: dict[str, int] = {}
    for s, t in caps:
        n = sum(1 for s2, t2 in caps if s2 == s and t <= t2 < t + window)
        want[s] = max(want.get(s, 0), n)
    assert burst == want

"""Randomized cross-checks for iterative operators that have no SQL oracle:
generate a seeded random graph once, run the distributed operator, and
compare against a straightforward pure-Python reference implementation.
This is the §5 "property-ish" layer for BFS / components / shortest paths /
PageRank mass, where DuckDB can't serve as the oracle."""

import heapq
import random
from collections import deque

import pytest
from pyspark.sql import types as T

from vivace_graph_v3_spark.graph import GraphStore
from vivace_graph_v3_spark.operators.graph_algorithms import (
    connected_components, pagerank, shortest_paths,
)
from vivace_graph_v3_spark.operators.traverse import traverse
from vivace_graph_v3_spark.schema import SchemaRegistry

N, E, SEED = 200, 600, 1234


@pytest.fixture(scope="module")
def random_graph(spark):
    rng = random.Random(SEED)
    ids = [f"v{i:03d}" for i in range(N)]
    edges = set()
    while len(edges) < E:
        a, b = rng.randrange(N), rng.randrange(N)
        if a != b:
            edges.add((ids[a], ids[b]))
    edges = sorted(edges)
    weights = {e: round(rng.uniform(0.5, 5.0), 3) for e in edges}

    reg = SchemaRegistry()
    reg.def_vertex("node", {})
    reg.def_edge("link")
    g = GraphStore(spark, reg, name="rand", has_tombstones=False)
    g.add_vertices("node", spark.createDataFrame(
        [(v, "node", False, 0, 0) for v in ids],
        "id string, type string, deleted boolean, revision long, commit_epoch long"))
    g.add_edges("link", spark.createDataFrame(
        [(f"e{i}", "link", False, 0, 0, s, d, weights[(s, d)])
         for i, (s, d) in enumerate(edges)],
        "id string, type string, deleted boolean, revision long, "
        "commit_epoch long, src string, dst string, weight double"))
    return g, ids, edges, weights


def test_bfs_depths_match_python(random_graph):
    g, ids, edges, _ = random_graph
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    root = ids[0]
    want, dq = {root: 0}, deque([root])
    while dq:
        u = dq.popleft()
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    got = {r["id"]: r["depth"]
           for r in traverse(g, [root], max_depth=N).collect()}
    assert got == want


def test_connected_components_match_python(random_graph):
    g, ids, edges, _ = random_graph
    parent = {v: v for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    want = {}
    for v in ids:
        root = find(v)
        want.setdefault(root, set()).add(v)
    # canonical component id = min member (matches the operator's contract)
    want_map = {v: min(members) for members in want.values() for v in members}
    got = {r["id"]: r["comp"] for r in connected_components(g).collect()}
    assert got == want_map


def test_weighted_sssp_matches_dijkstra(random_graph):
    g, ids, edges, weights = random_graph
    adj = {}
    for (s, d), w in weights.items():
        adj.setdefault(s, []).append((d, w))
    root = ids[0]
    dist, pq = {root: 0.0}, [(0.0, root)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, float("inf")) - 1e-12:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    got = {r["id"]: r["dist"]
           for r in shortest_paths(g, [root], weighted=True,
                                   max_iter=N).collect()}
    assert set(got) == set(dist)
    assert all(abs(got[v] - dist[v]) < 1e-6 for v in dist)


def test_pagerank_matches_python_iteration(random_graph):
    g, ids, edges, _ = random_graph
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    n, d_f = len(ids), 0.85
    ranks = {v: 1.0 for v in ids}
    for _ in range(10):
        recv = {v: 0.0 for v in ids}
        dangling = 0.0
        for v in ids:
            if v in out:
                share = ranks[v] / len(out[v])
                for t in out[v]:
                    recv[t] += share
            else:
                dangling += ranks[v]
        base = (1 - d_f) + d_f * dangling / n
        ranks = {v: base + d_f * recv[v] for v in ids}
    got = {r["id"]: r["rank"]
           for r in pagerank(g, max_iter=10, tol=None).collect()}
    assert all(abs(got[v] - ranks[v]) < 1e-6 for v in ids)


def test_label_propagation_matches_python(random_graph):
    """Synchronous LPA with the (max count, min label) tie-break is fully
    deterministic — the distributed result must equal the pure-Python run
    round for round."""
    from collections import Counter

    from vivace_graph_v3_spark.operators.graph_algorithms import (
        label_propagation)

    g, ids, edges, _ = random_graph
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)

    labels = {v: v for v in ids}
    for _ in range(5):
        nxt = {}
        for v in ids:
            nbrs = adj.get(v, [])
            if not nbrs:
                nxt[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in nbrs)
            best = max(counts.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
            # min label among max-count: sort explicitly for clarity
            top = max(counts.values())
            nxt[v] = min(l for l, c in counts.items() if c == top)
        labels = nxt

    got = {r["id"]: r["label"]
           for r in label_propagation(g, max_iter=5).collect()}
    assert got == labels


def test_k_core_matches_python(random_graph):
    from vivace_graph_v3_spark.operators.graph_algorithms import k_core

    g, ids, edges, _ = random_graph
    k = 4
    # peel in python: unique fixpoint regardless of order
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    alive = set(ids)
    while True:
        drop = {v for v in alive
                if len(nbrs.get(v, set()) & alive) < k}
        if not drop:
            break
        alive -= drop
    want = {v: len(nbrs[v] & alive) for v in alive}

    got = {r["id"]: r["degree"] for r in k_core(g, k).collect()}
    assert got == want


def test_triangle_count_matches_python(random_graph):
    from vivace_graph_v3_spark.operators.graph_algorithms import triangle_count

    g, ids, edges, _ = random_graph
    nbrs = {v: set() for v in ids}
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    want = 0
    order = sorted(ids)
    for a in order:
        for b in (x for x in nbrs[a] if x > a):
            # canonical a < b < c: each triangle counted once
            want += sum(1 for c in (nbrs[a] & nbrs[b]) if c > b)
    got = triangle_count(g).first()["n_triangles"]
    assert got == want


def test_personalized_pagerank_matches_python(random_graph):
    g, ids, edges, _ = random_graph
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    n, d_f = len(ids), 0.85
    srcs = [ids[0], ids[7], ids[42]]
    tele = {v: (n / len(srcs) if v in srcs else 0.0) for v in ids}
    ranks = dict(tele)
    for _ in range(10):
        recv = {v: 0.0 for v in ids}
        dangling = 0.0
        for v in ids:
            if v in out:
                share = ranks[v] / len(out[v])
                for t in out[v]:
                    recv[t] += share
            else:
                dangling += ranks[v]
        ranks = {v: ((1 - d_f) + d_f * dangling / n) * tele[v]
                 + d_f * recv[v] for v in ids}
    got = {r["id"]: r["rank"]
           for r in pagerank(g, max_iter=10, tol=None,
                             sources=srcs).collect()}
    assert all(abs(got[v] - ranks[v]) < 1e-6 for v in ids)
    # mass conservation holds in the personalized variant too
    assert abs(sum(got.values()) - n) < 1e-6
    # non-source vertices with no in-path from the sources get zero rank
    reachable = set(srcs)
    frontier = list(srcs)
    while frontier:
        u = frontier.pop()
        for v in out.get(u, []):
            if v not in reachable:
                reachable.add(v)
                frontier.append(v)
    assert all(got[v] == 0.0 for v in ids
               if v not in reachable)

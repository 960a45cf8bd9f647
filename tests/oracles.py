"""Local (numpy / pure-python) ground-truth oracles for the graph algorithms."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_numpy(
    n: int,
    edges: set[tuple[int, int]],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> np.ndarray:
    """Power iteration with dangling-mass redistribution, L1 stopping."""
    out_deg = np.zeros(n, dtype=np.int64)
    by_dst: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        out_deg[s] += 1
        by_dst[d].append(s)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        dangling = r[out_deg == 0].sum()
        new = np.full(n, (1.0 - damping) / n)
        new += damping * dangling / n
        for d, srcs in by_dst.items():
            new[d] += damping * sum(r[s] / out_deg[s] for s in srcs)
        delta = np.abs(new - r).sum()
        r = new
        if delta <= tol:
            break
    return r


def pagerank_numpy_fixed(
    n: int, edges: set[tuple[int, int]], iterations: int, damping: float = 0.85
) -> np.ndarray:
    return pagerank_numpy(n, edges, damping=damping, tol=-1.0, max_iter=iterations)


def components_bfs(n: int, edges: set[tuple[int, int]]) -> dict[int, int]:
    """Undirected connected components; label = min vertex id in component."""
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    comp: dict[int, int] = {}
    for start in range(n):
        if start in comp:
            continue
        stack, members = [start], []
        seen = {start}
        while stack:
            u = stack.pop()
            members.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        label = min(members)
        for m in members:
            comp[m] = label
    return comp


def lpa_sync(n: int, edges: set[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Synchronous LPA, mode label with min-label tie-break, isolated keep own."""
    adj: dict[int, list[int]] = defaultdict(list)
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    for a, b in und:
        adj[a].append(b)
        adj[b].append(a)
    labels = {i: i for i in range(n)}
    for _ in range(rounds):
        new = {}
        for i in range(n):
            if not adj[i]:
                new[i] = labels[i]
                continue
            cnt = Counter(labels[j] for j in adj[i])
            best_freq = max(cnt.values())
            new[i] = min(l for l, c in cnt.items() if c == best_freq)
        labels = new
    return labels


def triangles_brute(edges: set[tuple[int, int]]) -> int:
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    count = 0
    for a, b in und:
        count += len(adj[a] & adj[b] - {a, b})
    return count // 3


def personalized_pagerank_numpy(
    n: int,
    edges: set[tuple[int, int]],
    seeds: set[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
) -> np.ndarray:
    """Seeded restart vector; dangling mass redistributed to the seeds."""
    out_deg = np.zeros(n, dtype=np.int64)
    by_dst: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        out_deg[s] += 1
        by_dst[d].append(s)
    sv = np.zeros(n)
    for s in seeds:
        sv[s] = 1.0 / len(seeds)
    r = sv.copy()
    for _ in range(max_iter):
        dangling = r[out_deg == 0].sum()
        new = sv * ((1.0 - damping) + damping * dangling)
        for d, srcs in by_dst.items():
            new[d] += damping * sum(r[s] / out_deg[s] for s in srcs)
        delta = np.abs(new - r).sum()
        r = new
        if delta <= tol:
            break
    return r

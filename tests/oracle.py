"""Single-node NumPy oracle implementing LLAMA's exact recurrences.

These mirror the reference kernels line-for-line semantically:
- pagerank: pull recurrence pagerank.h:159-166, init 1/N, dangling mass
  LOST (out-degree-0 nodes contribute nothing, pagerank.h:287-288),
  fixed iterations (benchmark.cc:1463 default 10).
- connected components: hash-min fixpoint (shape of sssp.h:124-179).
- label propagation: synchronous rounds, mode with smallest-label tie-break.
- triangle count: u<v<w orientation (triangle_counting.h:104-120).
- sssp: Bellman-Ford min-relaxation (sssp.h:131-161).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def _relabel(pairs):
    ids = sorted({u for e in pairs for u in e[:2]})
    idx = {u: i for i, u in enumerate(ids)}
    return ids, idx


def pagerank(pairs, damping=0.85, max_iter=10, tol=None):
    ids, idx = _relabel(pairs)
    n = len(ids)
    out_deg = np.zeros(n)
    for s, d in pairs:
        out_deg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for s, d in pairs:
            contrib[idx[d]] += rank[idx[s]] / out_deg[idx[s]]
        new = base + damping * contrib
        diff = np.abs(new - rank).sum()
        rank = new
        if tol is not None and diff <= tol:
            break
    return dict(zip(ids, rank.tolist()))


def connected_components(pairs):
    ids, idx = _relabel(pairs)
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    comp = {u: u for u in ids}
    changed = True
    while changed:
        changed = False
        new = dict(comp)
        for u in ids:
            m = min([comp[u]] + [comp[v] for v in adj[u]])
            if m < new[u]:
                new[u] = m
                changed = True
        comp = new
    return comp


def label_propagation(pairs, max_iter=5):
    ids, _ = _relabel(pairs)
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    label = {u: u for u in ids}
    for _ in range(max_iter):
        new = {}
        for u in ids:
            if not adj[u]:
                new[u] = label[u]
                continue
            cnt = Counter(label[v] for v in adj[u])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[u] = best[0]
        label = new
    return label


def triangle_count(pairs):
    und = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)  # oriented low→high
    count = 0
    for a, b in und:
        count += len(adj[a] & adj[b])
    return count


def sssp(pairs, root=0, weights=None):
    """weights: dict[(s,d)] -> w, default 1.0. Returns {id: dist or None}."""
    ids, _ = _relabel(pairs)
    dist = {u: None for u in ids}
    if root in dist:
        dist[root] = 0.0
    changed = True
    while changed:
        changed = False
        for s, d in pairs:
            if dist[s] is None:
                continue
            w = weights[(s, d)] if weights else 1.0
            cand = dist[s] + w
            if dist[d] is None or cand < dist[d]:
                dist[d] = cand
                changed = True
    return dist


def degrees(pairs):
    ids, _ = _relabel(pairs)
    od = Counter(s for s, d in pairs)
    ind = Counter(d for s, d in pairs)
    return {u: (od.get(u, 0), ind.get(u, 0)) for u in ids}


def brandes_bc(pairs, roots):
    """Brandes betweenness from the given roots (directed, unweighted) —
    mirrors bc_adj.h:56-207."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    nodes = set()
    for s, d in set(pairs):
        adj[s].append(d)
        nodes.add(s)
        nodes.add(d)
    bc = {u: 0.0 for u in nodes}
    for s in roots:
        if s not in nodes:
            continue
        sigma = {u: 0.0 for u in nodes}
        dist = {u: -1 for u in nodes}
        preds = defaultdict(list)
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {u: 0.0 for u in nodes}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += (sigma[v] / sigma[w]) * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def kosaraju_scc(pairs):
    """Sequential Kosaraju SCC; returns {id: min member id of its SCC}."""
    from collections import defaultdict

    nodes = sorted({u for e in pairs for u in e})
    adj = defaultdict(list)
    radj = defaultdict(list)
    for s, d in set(pairs):
        if s != d:
            adj[s].append(d)
            radj[d].append(s)
    visited = set()
    order = []
    for start in nodes:
        if start in visited:
            continue
        stack = [(start, iter(adj[start]))]
        visited.add(start)
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in visited:
                    visited.add(w)
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(v)
                stack.pop()
    comp = {}
    for start in reversed(order):
        if start in comp:
            continue
        stack = [start]
        members = []
        comp[start] = start
        while stack:
            v = stack.pop()
            members.append(v)
            for w in radj[v]:
                if w not in comp:
                    comp[w] = start
                    stack.append(w)
        m = min(members)
        for v in members:
            comp[v] = m
    return comp


def k_core(pairs, k):
    """Sequential k-core peel on the symmetrized simple graph; returns
    {id: in-core degree} for surviving nodes."""
    adj = {}
    for s, d in {tuple(p) for p in pairs}:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                if m in adj:
                    adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}

"""Sequential Leiden local moving — faithful port of
strata/src/leiden.rs:58-160 (greedy modularity moves, full recompute per
candidate exactly like the reference) — the parity oracle for the
distributed implementation in operators/communities.py.

Deterministic: with ``seed=None`` the reference visits nodes in petgraph
insertion order (leiden.rs:80-84); this port does the same over the
caller's node list. O(V·E) per candidate move like the reference — test
graphs only.
"""

from __future__ import annotations


def modularity_ref(nodes, edges, communities, resolution: float = 1.0) -> float:
    """Edge-sum modularity (leiden.rs:169-283): Q = (1/2m) Σ_{edges in
    same community} (w − γ·k_a·k_b/(2m)); each undirected edge once."""
    m = sum(w for _, _, w in edges)
    if m == 0.0:
        return 0.0
    deg: dict = {n: 0.0 for n in nodes}
    for a, b, w in edges:
        deg[a] += w
        deg[b] += w
    q = 0.0
    for a, b, w in edges:
        if communities[a] == communities[b]:
            q += w - resolution * deg[a] * deg[b] / (2.0 * m)
    return q / (2.0 * m)


def leiden_ref(nodes, edges, resolution: float = 1.0, max_iterations: int = 100):
    """→ {node: community_id}; ids canonicalized to min member node for
    comparability with the distributed output.

    edges: iterable of (a, b, weight); undirected, no self-loops.
    """
    nodes = list(nodes)
    edges = [(a, b, float(w)) for a, b, w in edges]
    communities = {n: i for i, n in enumerate(nodes)}  # leiden.rs:67-70
    nbrs: dict = {n: set() for n in nodes}
    for a, b, _ in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)

    improved, iterations = True, 0
    while improved and iterations < max_iterations:  # leiden.rs:77-147
        improved = False
        iterations += 1
        for n in nodes:
            current = communities[n]
            best, best_delta = current, 0.0
            base = modularity_ref(nodes, edges, communities, resolution)
            for nb in nbrs[n]:
                nc = communities[nb]
                if nc != current:
                    test = dict(communities)
                    test[n] = nc
                    delta = modularity_ref(nodes, edges, test, resolution) - base
                    if delta > best_delta:
                        best_delta, best = delta, nc
                        improved = True  # quirk: set on candidate, leiden.rs:121
            # fresh singleton option (leiden.rs:131-141)
            new_id = max(communities.values()) + 1
            test = dict(communities)
            test[n] = new_id
            delta = modularity_ref(nodes, edges, test, resolution) - base
            if delta > best_delta:
                best = new_id
                improved = True
            if best != current:
                communities[n] = best

    # canonicalize ids to min member (matches the distributed relabel)
    members: dict = {}
    for n, c in communities.items():
        members.setdefault(c, []).append(n)
    canon = {c: min(ms) for c, ms in members.items()}
    return {n: canon[c] for n, c in communities.items()}


def partition_sets(assign: dict) -> set:
    """{node: community} → frozenset of member-frozensets (id-agnostic)."""
    groups: dict = {}
    for n, c in assign.items():
        groups.setdefault(c, set()).add(n)
    return {frozenset(g) for g in groups.values()}

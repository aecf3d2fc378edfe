"""Brute-force partial-order alignment oracle (test-only).

An exact, slow re-implementation of the POA algorithm family the reference
consumes through abPOA (/root/reference/src/align.c:762-943): reads are
aligned one by one to a growing DAG with exact 2-piece-affine DP over every
node (no banding, no SIMD, no heuristics), merged into aligned-groups
(columns), and the consensus is the per-column majority over the resulting
MSA rows (the ABPOA_MF output mode).  Fit alignment (read global, graph
segment free at both ends) naturally anchors partial-cover reads mid-graph
— the oracle analog of abpoa_align_sequence_to_subgraph
(/root/reference/src/align.c:793-806).

Used by tests/test_poa_oracle.py to bound the divergence of the production
star-MSA (longcalld_tpu/core/msa.py) from true partial-order alignment.
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Tuple

import numpy as np

INF = 10 ** 9
GAP = 5
NOCOV = 6


class PoaGraph:
    def __init__(self, x=6, o1=6, e1=2, o2=24, e2=1):
        self.x, self.o1, self.e1, self.o2, self.e2 = x, o1, e1, o2, e2
        self.base: List[int] = []
        self.preds: List[set] = []
        self.succs: List[set] = []
        self.group: List[int] = []       # aligned-group id per node
        self.groups: List[set] = []      # group id -> node ids
        self.read_paths: List[List[int]] = []   # per read: visited node ids

    # ---------------- construction ----------------

    def _new_node(self, base: int, group: Optional[int] = None) -> int:
        v = len(self.base)
        self.base.append(int(base))
        self.preds.append(set())
        self.succs.append(set())
        if group is None:
            group = len(self.groups)
            self.groups.append(set())
        self.group.append(group)
        self.groups[group].add(v)
        return v

    def _add_edge(self, u: Optional[int], v: int) -> None:
        if u is not None and u != v:
            self.preds[v].add(u)
            self.succs[u].add(v)

    def add_backbone(self, seq: np.ndarray) -> None:
        prev = None
        path = []
        for b in seq:
            v = self._new_node(int(b))
            self._add_edge(prev, v)
            path.append(v)
            prev = v
        self.read_paths.append(path)

    def topo_order(self) -> List[int]:
        n = len(self.base)
        indeg = [len(self.preds[v]) for v in range(n)]
        todo = sorted(v for v in range(n) if indeg[v] == 0)
        out = []
        import heapq
        heapq.heapify(todo)
        while todo:
            v = heapq.heappop(todo)
            out.append(v)
            for w in self.succs[v]:
                indeg[w] -= 1
                if indeg[w] == 0:
                    heapq.heappush(todo, w)
        assert len(out) == n, "graph has a cycle"
        return out

    # ---------------- exact DP ----------------

    def align(self, read: np.ndarray):
        """Exact fit alignment (read end-to-end, graph segment free) with
        2-piece affine gaps.  Returns the traceback path as a list of
        (kind, node, j) with kind in {'M','I','D'}."""
        x, o1, e1, o2, e2 = self.x, self.o1, self.e1, self.o2, self.e2
        read = np.asarray(read, dtype=np.int64)
        m = len(read)
        order = self.topo_order()
        n = len(self.base)
        jj = np.arange(m + 1, dtype=np.int64)

        M = np.full((n, m + 1), INF, dtype=np.int64)
        I1 = np.full((n, m + 1), INF, dtype=np.int64)
        I2 = np.full((n, m + 1), INF, dtype=np.int64)
        D1 = np.full((n, m + 1), INF, dtype=np.int64)
        D2 = np.full((n, m + 1), INF, dtype=np.int64)

        # leading read insertions before the first matched node
        src_best = np.minimum(o1 + e1 * jj, o2 + e2 * jj)
        src_best[0] = 0

        best = np.full((n, m + 1), INF, dtype=np.int64)
        for v in order:
            sub = np.where(read == self.base[v], 0, x)
            if self.preds[v]:
                pred_rows = np.stack([best[u] for u in self.preds[v]])
                pb = pred_rows.min(axis=0)
                pD1 = np.stack([D1[u] for u in self.preds[v]]).min(axis=0)
                pD2 = np.stack([D2[u] for u in self.preds[v]]).min(axis=0)
            else:
                pb = np.full(m + 1, INF, dtype=np.int64)
                pD1 = pD2 = pb
            # fit: an alignment may start fresh at any node (graph prefix
            # free), entering from the virtual source
            enter = np.minimum(pb, src_best)
            M[v, 1:] = np.minimum(enter[:-1] + sub, INF)
            D1[v] = np.minimum(pD1 + e1, pb + o1 + e1)
            D2[v] = np.minimum(pD2 + e2, pb + o2 + e2)
            md = np.minimum(M[v], np.minimum(D1[v], D2[v]))
            # in-row insertion scans (prefix-min form)
            for (I, o, e) in ((I1, o1, e1), (I2, o2, e2)):
                cand = md + o - e * jj
                run = np.minimum.accumulate(cand)
                I[v, 1:] = np.minimum(run[:-1] + e * jj[1:], INF)
            best[v] = np.minimum(md, np.minimum(I1[v], I2[v]))

        # end anywhere on the graph with the read consumed
        v_end = min(range(n), key=lambda v: best[v, m])
        score = int(best[v_end, m])

        # ---------------- traceback (transition testing) -------------
        path = []
        v, j = v_end, m
        states = {"M": M, "I1": I1, "I2": I2, "D1": D1, "D2": D2}
        cur = min(states, key=lambda s: states[s][v, j])
        while True:
            val = int(states[cur][v, j])
            if cur == "M":
                path.append(("M", v, j))
                sub = 0 if read[j - 1] == self.base[v] else x
                j -= 1
                # entering fresh (graph prefix free / leading insertions)?
                if val - sub == src_best[j]:
                    for _ in range(j):
                        path.append(("I", None, j))
                        j -= 1
                    break
                nxt = None
                for u in self.preds[v]:
                    for s in states:
                        if states[s][u, j] + sub == val:
                            nxt = (s, u)
                            break
                    if nxt:
                        break
                assert nxt, "traceback broke at M"
                cur, v = nxt
            elif cur in ("I1", "I2"):
                o, e = (self.o1, self.e1) if cur == "I1" else (self.o2,
                                                               self.e2)
                path.append(("I", None, j))
                j -= 1
                if states[cur][v, j] + e == val:
                    continue
                md_states = ("M", "D1", "D2")
                found = False
                for s in md_states:
                    if states[s][v, j] + o + e == val:
                        cur = s
                        found = True
                        break
                if not found:
                    # opened straight from the virtual source
                    assert val == src_best[j + 1] or j == 0
                    for _ in range(j):
                        path.append(("I", None, j))
                        j -= 1
                    break
            else:  # D1 / D2
                o, e = (self.o1, self.e1) if cur == "D1" else (self.o2,
                                                               self.e2)
                path.append(("D", v, j))
                nxt = None
                for u in self.preds[v]:
                    if states[cur][u, j] + e == val:
                        nxt = (cur, u)
                        break
                    for s in states:
                        if states[s][u, j] + o + e == val \
                                and s not in ("I1", "I2"):
                            nxt = (s, u)
                            break
                    if nxt:
                        break
                assert nxt, "traceback broke at D"
                cur, v = nxt
            if j == 0 and cur == "M":
                break
        path.reverse()
        return score, path

    def merge(self, read: np.ndarray, path) -> None:
        """Merge an aligned read into the graph (Lee 2002 semantics:
        matches fuse, mismatches join the node's aligned-group,
        insertions create fresh nodes/groups)."""
        read = np.asarray(read, dtype=np.int64)
        prev = None
        nodes = []
        for kind, v, j in path:
            if kind == "D":
                continue
            b = int(read[j - 1])
            if kind == "M":
                if self.base[v] == b:
                    node = v
                else:
                    node = None
                    for w in self.groups[self.group[v]]:
                        if self.base[w] == b:
                            node = w
                            break
                    if node is None:
                        node = self._new_node(b, group=self.group[v])
            else:
                # insertion: always a fresh node/column — later reads merge
                # onto it through the DP itself (fusing here can alias a
                # node the path still visits, creating a cycle)
                node = self._new_node(b)
            self._add_edge(prev, node)
            nodes.append(node)
            prev = node
        self.read_paths.append(nodes)

    def add_read(self, read: np.ndarray) -> None:
        _, path = self.align(read)
        self.merge(read, path)

    # ---------------- MSA + consensus ----------------

    def msa_rows(self) -> np.ndarray:
        order = self.topo_order()
        seen = []
        col_of_group = {}
        for v in order:
            g = self.group[v]
            if g not in col_of_group:
                col_of_group[g] = len(seen)
                seen.append(g)
        n_cols = len(seen)
        rows = np.full((len(self.read_paths), n_cols), NOCOV, dtype=np.uint8)
        for r, nodes in enumerate(self.read_paths):
            if not nodes:
                continue
            cols = [col_of_group[self.group[v]] for v in nodes]
            rows[r, min(cols):max(cols) + 1] = GAP
            for v, c in zip(nodes, cols):
                rows[r, c] = self.base[v]
        return rows


def column_consensus(rows: np.ndarray) -> np.ndarray:
    """Majority symbol per column (same contract as msa.star_msa's
    column_consensus: ties prefer the smaller symbol, uncovered -> GAP)."""
    n_cols = rows.shape[1]
    counts = np.zeros((6, n_cols), dtype=np.int64)
    for sym in range(6):
        counts[sym] = (rows == sym).sum(axis=0)
    best = counts.argmax(axis=0).astype(np.uint8)
    covered = counts.sum(axis=0) > 0
    return np.where(covered, best, GAP).astype(np.uint8)


def consensus_seq(rows: np.ndarray) -> np.ndarray:
    row = column_consensus(rows)
    return row[row != GAP]


def informative_columns(rows: np.ndarray, min_freq: float) -> np.ndarray:
    n_cols = rows.shape[1]
    out = []
    for c in range(n_cols):
        col = rows[:, c]
        col = col[col != NOCOV]
        if len(col) == 0:
            continue
        vals, cnt = np.unique(col, return_counts=True)
        if len(vals) < 2:
            continue
        cnt = np.sort(cnt)[::-1]
        if cnt[1] >= 2 and cnt[1] / len(col) >= min_freq:
            out.append(c)
    return np.asarray(out, dtype=np.int64)


def exact_bipartition(rows: np.ndarray, min_freq: float,
                      min_side: int = 2
                      ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Exhaustive optimal 2-clustering over informative columns: the
    bipartition minimizing total disagreement with per-cluster column
    majorities.  Exponential — test-only, n <= ~14 reads."""
    n = rows.shape[0]
    cols = informative_columns(rows, min_freq)
    if len(cols) == 0 or n < 2 * min_side:
        return None
    sub = rows[:, cols]

    def cost(idx) -> int:
        if len(idx) == 0:
            return 0
        g = sub[list(idx)]
        total = 0
        for c in range(g.shape[1]):
            col = g[:, c]
            col = col[col != NOCOV]
            if len(col) == 0:
                continue
            _, cnt = np.unique(col, return_counts=True)
            total += int(len(col) - cnt.max())
        return total

    best = None
    reads = list(range(n))
    for r in range(min_side, n // 2 + 1):
        for combo in itertools.combinations(reads[1:], r - 1):
            a = {0, *combo}
            b = set(reads) - a
            if len(b) < min_side:
                continue
            c = cost(a) + cost(b)
            if best is None or c < best[0]:
                best = (c, a, b)
    if best is None:
        return None
    _, a, b = best
    return (np.asarray(sorted(a), dtype=np.int64),
            np.asarray(sorted(b), dtype=np.int64))


def poa_msa(seqs: List[np.ndarray], x=6, o1=6, e1=2, o2=24, e2=1
            ) -> PoaGraph:
    g = PoaGraph(x, o1, e1, o2, e2)
    g.add_backbone(np.asarray(seqs[0], dtype=np.uint8))
    for s in seqs[1:]:
        g.add_read(np.asarray(s, dtype=np.uint8))
    return g

"""Test-only partial-order alignment oracle with SPOA's semantics.

The production extractor builds a pseudo-MSA from independent pairwise
ALT->REF alignments (lancet2_tpu/caller/extractor.py). The reference
builds a progressive SPOA partial-order graph instead (reference:
src/lancet/caller/msa_builder.{h,cpp}: spoa AlignmentType::kNW, convex
dual-affine m=0 / n=-6 / g=-6,e=-2 / q=-26,c=-1), where haplotype i aligns
against a graph already containing haplotypes 0..i-1. This module is an
INDEPENDENT reimplementation of that algorithm family — graph-based
progressive alignment, written from the POA/SPOA papers, sharing no code
with the production pseudo-MSA — used to fuzz extraction equality
(tests/test_poa_oracle.py), the same cross-validation pattern the
reference uses for longdust (it compiles the upstream C into its tests,
reference: tests/CMakeLists.txt:51-53).

Scope: semantics (global graph alignment under the convex dual-affine
model, progressive node merging, MSA column classes), not byte-level spoa
internals. Tie-breaking is documented where it matters: diagonal
preferred over graph-gap over sequence-gap, and earlier (lower-ranked)
predecessors preferred — mirroring the production aligner's diag > V > F
preference so tie-induced divergence is minimized; residual divergences
are triaged by the fuzz harness, not hidden.
"""

from __future__ import annotations

import numpy as np

NEG = -(1 << 30)

# SPOA parameters used by the reference MsaBuilder (msa_builder.h:17-71)
MATCH = 0
MISMATCH = -6
GAP1_OPEN, GAP1_EXT = -6, -2
GAP2_OPEN, GAP2_EXT = -26, -1


class PoaGraph:
    """Partial-order graph: nodes carry one character; `aligned` links
    nodes that occupy the same MSA column class."""

    def __init__(self):
        self.char: list[str] = []
        self.preds: list[set] = []
        self.succs: list[set] = []
        self.aligned: list[list[int]] = []
        self.seq_paths: list[list[int]] = []  # node chain per added seq

    def _new_node(self, ch: str) -> int:
        self.char.append(ch)
        self.preds.append(set())
        self.succs.append(set())
        self.aligned.append([])
        return len(self.char) - 1

    def _add_edge(self, u: int, v: int) -> None:
        self.succs[u].add(v)
        self.preds[v].add(u)

    # ------------------------------------------------------------------
    def add_sequence(self, seq: str) -> None:
        if not self.char:
            path = [self._new_node(c) for c in seq]
            for a, b in zip(path, path[1:]):
                self._add_edge(a, b)
            self.seq_paths.append(path)
            return
        aln = self._align(seq)
        self._merge(seq, aln)

    # ------------------------------------------------------------------
    def _topo(self) -> list[int]:
        """Ring-aware topological order: all predecessors of every member
        of an aligned ring precede the whole ring, and ring members are
        consecutive (spoa's sort has the same property)."""
        n = len(self.char)
        ring: list[list[int]] = []
        ring_of = [-1] * n
        for u in range(n):
            if ring_of[u] >= 0:
                continue
            members = [u] + [v for v in self.aligned[u]]
            members = sorted(set(members))
            rid = len(ring)
            ring.append(members)
            for m in members:
                ring_of[m] = rid
        # ring DAG
        nrings = len(ring)
        rpreds = [set() for _ in range(nrings)]
        rsuccs = [set() for _ in range(nrings)]
        for v in range(n):
            for u in self.preds[v]:
                a, b = ring_of[u], ring_of[v]
                if a != b:
                    rpreds[b].add(a)
                    rsuccs[a].add(b)
        indeg = [len(p) for p in rpreds]
        stack = sorted([r for r in range(nrings) if indeg[r] == 0])
        order: list[int] = []
        import heapq

        heapq.heapify(stack)
        while stack:
            r = heapq.heappop(stack)
            order.extend(ring[r])
            for s in rsuccs[r]:
                indeg[s] -= 1
                if indeg[s] == 0:
                    heapq.heappush(stack, s)
        assert len(order) == n, "POA graph must stay acyclic"
        return order

    # ------------------------------------------------------------------
    def _align(self, seq: str):
        """Global (kNW) alignment of seq to the graph under the convex
        dual-affine model. Returns [(node_id | -1, seq_pos | -1), ...]."""
        order = self._topo()
        rank = {u: i for i, u in enumerate(order)}
        n, m = len(order), len(seq)
        codes = np.frombuffer(seq.encode(), np.uint8)

        def gap_cost_row(length):
            j = np.arange(length + 1, dtype=np.int64)
            g1 = GAP1_OPEN + (j - 1) * GAP1_EXT
            g2 = GAP2_OPEN + (j - 1) * GAP2_EXT
            out = np.maximum(g1, g2)
            out[0] = 0
            return out

        H = np.full((n + 1, m + 1), NEG, np.int64)
        E1 = np.full((n + 1, m + 1), NEG, np.int64)
        E2 = np.full((n + 1, m + 1), NEG, np.int64)
        F1 = np.full((n + 1, m + 1), NEG, np.int64)
        F2 = np.full((n + 1, m + 1), NEG, np.int64)
        H[0] = gap_cost_row(m)
        E1[0, 1:] = GAP1_OPEN + np.arange(m) * GAP1_EXT
        E2[0, 1:] = GAP2_OPEN + np.arange(m) * GAP2_EXT

        node_chars = np.frombuffer(
            "".join(self.char[u] for u in order).encode(), np.uint8
        )
        pred_rows: list[list[int]] = []
        for i, u in enumerate(order):
            ps = [rank[p] + 1 for p in self.preds[u]]
            pred_rows.append(sorted(ps) if ps else [0])

        for i in range(1, n + 1):
            sub = np.where(node_chars[i - 1] == codes, MATCH, MISMATCH)
            best_diag = np.full(m, NEG, np.int64)
            bf1 = np.full(m + 1, NEG, np.int64)
            bf2 = np.full(m + 1, NEG, np.int64)
            for p in pred_rows[i - 1]:
                np.maximum(best_diag, H[p, :-1], out=best_diag)
                np.maximum(bf1, np.maximum(H[p] + GAP1_OPEN,
                                           F1[p] + GAP1_EXT), out=bf1)
                np.maximum(bf2, np.maximum(H[p] + GAP2_OPEN,
                                           F2[p] + GAP2_EXT), out=bf2)
            F1[i] = bf1
            F2[i] = bf2
            h = np.full(m + 1, NEG, np.int64)
            h[1:] = best_diag + sub
            np.maximum(h, bf1, out=h)
            np.maximum(h, bf2, out=h)
            # E channels are a sequential scan along j
            e1 = E1[i]
            e2 = E2[i]
            for j in range(1, m + 1):
                e1[j] = max(h[j - 1] + GAP1_OPEN, e1[j - 1] + GAP1_EXT)
                e2[j] = max(h[j - 1] + GAP2_OPEN, e2[j - 1] + GAP2_EXT)
                if e1[j] > h[j]:
                    h[j] = e1[j]
                if e2[j] > h[j]:
                    h[j] = e2[j]
            H[i] = h

        sinks = [rank[u] + 1 for u in order if not self.succs[u]]
        end = max(sinks, key=lambda i: (H[i, m], -i))

        # traceback: explicit state machine over {H, E1, E2, F1, F2}.
        # In-H preference diag > E (seq gap) > F (graph gap), cheap-open
        # channel first, earliest predecessor on ties — mirrors the
        # production engine's diag > V > F order (ops/evidence_dp.py).
        aln: list[tuple[int, int]] = []
        i, j, state = end, m, "H"
        while i > 0 or j > 0:
            if state == "H":
                moved = False
                if i > 0 and j > 0:
                    u = order[i - 1]
                    sub = MATCH if self.char[u] == seq[j - 1] else MISMATCH
                    for p in pred_rows[i - 1]:
                        if H[i, j] == H[p, j - 1] + sub:
                            aln.append((u, j - 1))
                            i, j = p, j - 1
                            moved = True
                            break
                if moved:
                    continue
                if j > 0 and H[i, j] == E1[i, j]:
                    state = "E1"
                elif j > 0 and H[i, j] == E2[i, j]:
                    state = "E2"
                elif i > 0 and H[i, j] == F1[i, j]:
                    state = "F1"
                elif i > 0 and H[i, j] == F2[i, j]:
                    state = "F2"
                else:
                    raise AssertionError("traceback stuck in H")
                continue
            if state in ("E1", "E2"):
                E, go, ge = ((E1, GAP1_OPEN, GAP1_EXT) if state == "E1"
                             else (E2, GAP2_OPEN, GAP2_EXT))
                aln.append((-1, j - 1))
                if E[i, j] == H[i, j - 1] + go:
                    state = "H"
                else:
                    assert E[i, j] == E[i, j - 1] + ge
                j -= 1
                continue
            # F states: consume one graph node, no seq char
            F, go, ge = ((F1, GAP1_OPEN, GAP1_EXT) if state == "F1"
                         else (F2, GAP2_OPEN, GAP2_EXT))
            aln.append((order[i - 1], -1))
            moved = False
            for p in pred_rows[i - 1]:
                if F[i, j] == H[p, j] + go:
                    i, state = p, "H"
                    moved = True
                    break
            if not moved:
                for p in pred_rows[i - 1]:
                    if F[i, j] == F[p, j] + ge:
                        i = p
                        moved = True
                        break
            assert moved, "traceback stuck in F"
            continue
        aln.reverse()
        return aln

    # ------------------------------------------------------------------
    def _merge(self, seq: str, aln) -> None:
        """spoa Graph::AddAlignment semantics: reuse a matched node when
        the characters agree, else reuse a ring member with the char,
        else create a new node joined to the ring."""
        path: list[int] = []
        prev = -1
        for node_id, pos in aln:
            if pos < 0:
                continue  # graph gap: no seq char consumed
            ch = seq[pos]
            if node_id >= 0 and self.char[node_id] == ch:
                cur = node_id
            elif node_id >= 0:
                cur = -1
                for v in self.aligned[node_id]:
                    if self.char[v] == ch:
                        cur = v
                        break
                if cur < 0:
                    cur = self._new_node(ch)
                    ring = [node_id] + list(self.aligned[node_id])
                    for v in ring:
                        self.aligned[v].append(cur)
                    self.aligned[cur] = ring
            else:
                cur = self._new_node(ch)
            if prev >= 0 and cur != prev:
                self._add_edge(prev, cur)
            path.append(cur)
            prev = cur
        self.seq_paths.append(path)

    # ------------------------------------------------------------------
    def msa_rows(self) -> list[str]:
        """MSA rows (one per added sequence) from ring column classes:
        every ring occupies one column, columns in topological order."""
        order = self._topo()
        col_of = {}
        col = 0
        for u in order:
            if u in col_of:
                continue
            for v in [u] + self.aligned[u]:
                col_of[v] = col
            col += 1
        rows = []
        for path in self.seq_paths:
            row = ["-"] * col
            for u in path:
                row[col_of[u]] = self.char[u]
            rows.append("".join(row))
        return rows


def poa_msa(ref_seq: str, alt_seqs: list[str]) -> list[str]:
    """[ref_row, alt_rows...] via progressive SPOA-semantics POA (REF
    added first, like the reference MsaBuilder)."""
    g = PoaGraph()
    g.add_sequence(ref_seq)
    for s in alt_seqs:
        g.add_sequence(s)
    return g.msa_rows()

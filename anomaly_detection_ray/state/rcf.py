"""Streaming Robust Random Cut Forest — the scoring core of Layer B.

A from-scratch implementation of the RRCF sketch of Guha, Mishra, Roy &
Schrijvers, "Robust random cut forest based anomaly detection on
streams" (ICML 2016) — the published algorithm behind the
ThresholdedRandomCutForest the reference uses
(``ad/ml/ADColdStart.java:181-226`` builds it with 50 trees / 256
samples / outputAfter max(shingle,32)). NOT a port of the AWS
random-cut-forest library; trees here implement the paper's
insert/delete/CoDisp operations, with a sliding-window reservoir per
forest and a per-tree seeded RNG so runs are bit-deterministic
(mirroring the reference preview path's ``randomSeed(0)``,
``ADModelManager.java:486-516``).

Representation note: points and bounding boxes are plain Python float
lists and cuts use ``random.Random`` — for the shingled dimensions this
engine uses (≤ ~16), per-node Python float loops are ~5× faster than
per-node small-array numpy calls (each ~2-4 µs of dispatch overhead on
an 8-element array; profiled).

Anomaly score of a point = mean over trees of CoDisp (collusive
displacement), normalized by log2(tree size) so scores are comparable
across fill levels.
"""

from __future__ import annotations

import random
from collections import deque

import numpy as np


class _Node:
    __slots__ = ("parent", "left", "right", "dim", "cut", "lo", "hi", "count", "point", "key")

    def __init__(self):
        self.parent = None
        self.left = None
        self.right = None
        self.dim = -1
        self.cut = 0.0
        self.lo = None  # list[float]
        self.hi = None
        self.count = 0
        self.point = None  # leaves only: list[float]
        self.key = None

    @property
    def is_leaf(self):
        return self.point is not None


class RandomCutTree:
    def __init__(self, seed: int):
        self.rng = random.Random(seed)
        self.root: _Node | None = None
        self.leaves: dict[int, _Node] = {}

    # ---- insert ----

    def insert(self, point: list[float], key: int) -> None:
        if self.root is None:
            self.root = self._leaf(point, key)
            return
        node = self.root
        rand = self.rng.random
        while True:
            lo = node.lo
            hi = node.hi
            nl = list(lo)
            nh = list(hi)
            total = 0.0
            for d, p in enumerate(point):
                if p < nl[d]:
                    nl[d] = p
                elif p > nh[d]:
                    nh[d] = p
                total += nh[d] - nl[d]
            if total <= 0.0:
                # point identical to a degenerate (all-equal) subtree →
                # absorb as a duplicate of its leaf; counts on the spine
                # below (and at) this node still need the +1 — ancestors
                # above were already incremented on the way down.
                while not node.is_leaf:
                    node.count += 1
                    node = node.left
                node.count += 1
                self.leaves[key] = node
                return
            r = rand() * total
            acc = 0.0
            dim = 0
            cut = nl[0]
            for d in range(len(point)):
                ext = nh[d] - nl[d]
                if acc + ext > r or d == len(point) - 1:
                    dim = d
                    cut = nl[d] + (r - acc)
                    break
                acc += ext
            if cut < lo[dim] or cut >= hi[dim]:
                # cut separates the new point from this whole subtree.
                # (At a leaf the bbox is zero-width, so this branch always
                # fires — leaves never need a descend case.)
                self._split_here(node, point, key, dim, cut, nl, nh)
                return
            # descend along the existing structure (node must be internal)
            node.lo = nl
            node.hi = nh
            node.count += 1
            node = node.left if point[node.dim] <= node.cut else node.right

    def _leaf(self, point: list[float], key: int) -> _Node:
        leaf = _Node()
        leaf.point = list(point)
        leaf.lo = leaf.point
        leaf.hi = leaf.point
        leaf.count = 1
        leaf.key = key
        self.leaves[key] = leaf
        return leaf

    def _split_here(self, node: _Node, point, key, dim, cut, lo, hi) -> None:
        leaf = self._leaf(point, key)
        new = _Node()
        new.dim = dim
        new.cut = cut
        new.lo = lo
        new.hi = hi
        new.count = node.count + 1
        parent = node.parent
        if point[dim] <= cut:
            new.left, new.right = leaf, node
        else:
            new.left, new.right = node, leaf
        leaf.parent = new
        node.parent = new
        new.parent = parent
        if parent is None:
            self.root = new
        elif parent.left is node:
            parent.left = new
        else:
            parent.right = new
        # NOTE: ancestor counts/bboxes were already updated during descent.

    def _update_counts_up(self, node: _Node | None, delta: int) -> None:
        while node is not None:
            node.count += delta
            node = node.parent

    # ---- delete ----

    def forget(self, key: int) -> None:
        leaf = self.leaves.pop(key)
        if leaf.count > 1:
            # duplicate leaf still referenced by other keys
            leaf.count -= 1
            self._update_counts_up(leaf.parent, -1)
            return
        parent = leaf.parent
        if parent is None:
            self.root = None
            return
        sibling = parent.right if parent.left is leaf else parent.left
        grand = parent.parent
        sibling.parent = grand
        if grand is None:
            self.root = sibling
        elif grand.left is parent:
            grand.left = sibling
        else:
            grand.right = sibling
        self._update_counts_up(grand, -1)
        self._tighten_up(grand)

    def _tighten_up(self, node: _Node | None) -> None:
        while node is not None:
            llo, lhi = node.left.lo, node.left.hi
            rlo, rhi = node.right.lo, node.right.hi
            node.lo = [a if a < b else b for a, b in zip(llo, rlo)]
            node.hi = [a if a > b else b for a, b in zip(lhi, rhi)]
            node = node.parent

    # ---- scoring ----

    def codisp(self, key: int) -> float:
        node = self.leaves[key]
        best = 0.0
        while node.parent is not None:
            parent = node.parent
            sib = parent.right if parent.left is node else parent.left
            v = sib.count / node.count if node.count else sib.count
            if v > best:
                best = v
            node = parent
        return best


class RCForest:
    """Sliding-window forest: every tree holds the last ``sample_size``
    points; per-tree RNGs give cut diversity; ``score_and_update``
    inserts, scores (CoDisp / log2(size)), then evicts the oldest."""

    def __init__(self, num_trees: int = 30, sample_size: int = 256, seed: int = 0):
        self.sample_size = sample_size
        tree_seeds = np.random.SeedSequence(seed).generate_state(num_trees)
        self.trees = [RandomCutTree(int(s)) for s in tree_seeds]
        self.window: deque[int] = deque()
        self._next_key = 0

    def score_and_update(self, point) -> float:
        pt = [float(x) for x in point]
        key = self._next_key
        self._next_key += 1
        if len(self.window) >= self.sample_size:
            old = self.window.popleft()
            for t in self.trees:
                t.forget(old)
        for t in self.trees:
            t.insert(pt, key)
        self.window.append(key)
        size = len(self.window)
        if size < 2:
            return 0.0
        norm = np.log2(size + 1)
        total = 0.0
        for t in self.trees:
            total += t.codisp(key)
        return float(total / len(self.trees) / norm)

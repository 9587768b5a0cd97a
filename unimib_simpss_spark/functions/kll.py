"""KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) — the
mergeable, distribution-free rank-error companion to
:func:`~unimib_simpss_spark.functions.sketches.hist_quantile`
(VERDICT r9 #7).

Why both exist: the equi-width histogram's error is ``span/bins`` — a
value-domain bound that degrades arbitrarily on heavy-tailed spans
(one outlier at 1e12 stretches every bin). KLL's guarantee is on RANK:
with parameter ``k`` the estimated rank of any value is within
``O(1/k)`` of true rank regardless of the value distribution, with
``O(k · log(n/k))`` items of state, and two sketches MERGE into a
sketch with the same guarantee — the shape shard rollups and streaming
state need at 100 TB.

Determinism: canonical KLL flips a random coin per compaction (keep
odd- or even-indexed survivors). This implementation alternates the
coin per level (Munro–Paterson-style deterministic compaction), so a
sketch built from the same item sequence is bit-identical on every
run/engine — worth the slightly weaker worst-case constant, because it
makes results reproducible and testable. The rank-error property test
measures the achieved error directly.

Compaction keeps every level sorted, so inserts cost O(1) amortized
(level-0 append) and compaction is a sorted-merge, not a re-sort.

This module is pure Python/stdlib (no numpy needed) so it can serve as
both the executor-side partial aggregator and the driver-side merger.
The Spark surface lives in ``functions/sketches.py::kll_quantiles``.
"""

from __future__ import annotations

import pickle
from bisect import insort

_MIN_CAP = 2
_DECAY = 2.0 / 3.0  # KLL level-capacity decay c


class KLL:
    """One sketch. ``add`` values, ``merge`` sketches, query ``rank`` /
    ``quantile``. State: ``levels[h]`` holds items of weight ``2**h``,
    each level sorted ascending."""

    __slots__ = ("k", "levels", "n", "_coins")

    def __init__(self, k: int = 200) -> None:
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._coins: list[bool] = [False]

    # ------------------------------------------------------------ sizing
    def _capacity(self, h: int) -> int:
        """Capacity of level ``h`` given the current top level H:
        ``k * c^(H-h)``, floored at 2 — deeper (older) levels shrink."""
        depth = len(self.levels) - 1 - h
        return max(_MIN_CAP, int(self.k * (_DECAY**depth)))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.levels)))

    def size(self) -> int:
        return sum(len(lv) for lv in self.levels)

    # ----------------------------------------------------------- updates
    def add(self, value: float) -> None:
        insort(self.levels[0], float(value))
        self.n += 1
        if self.size() > self._total_capacity():
            self._compress()

    def _compress(self) -> None:
        """Compact the lowest over-capacity level: keep alternating
        survivors (deterministic per-level coin), promote them up one
        level. One pass; repeats via the size check in ``add``/
        ``merge``."""
        while self.size() > self._total_capacity():
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._capacity(h):
                    buf = self.levels[h]  # kept sorted by construction
                    start = 1 if self._coins[h] else 0
                    self._coins[h] = not self._coins[h]
                    survivors = buf[start::2]
                    self.levels[h] = []
                    if h + 1 == len(self.levels):
                        self.levels.append([])
                        self._coins.append(False)
                    merged = self.levels[h + 1]
                    if merged:
                        for v in survivors:
                            insort(merged, v)
                    else:
                        self.levels[h + 1] = survivors
                    break
            else:  # no level individually over capacity — grow tolerance
                return

    def merge(self, other: "KLL") -> "KLL":
        """Merge ``other`` into ``self`` (returns self). Level-wise
        sorted-merge concatenation, then compress — the KLL merge rule;
        the result honors the same rank-error budget."""
        if other.k != self.k:
            raise ValueError(f"cannot merge KLL(k={other.k}) into KLL(k={self.k})")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self._coins.append(False)
        for h, lv in enumerate(other.levels):
            if not lv:
                continue
            mine = self.levels[h]
            if mine:
                out: list[float] = []
                i = j = 0
                while i < len(mine) and j < len(lv):
                    if mine[i] <= lv[j]:
                        out.append(mine[i]); i += 1
                    else:
                        out.append(lv[j]); j += 1
                out.extend(mine[i:]); out.extend(lv[j:])
                self.levels[h] = out
            else:
                self.levels[h] = list(lv)
        self.n += other.n
        if self.size() > self._total_capacity():
            self._compress()
        return self

    # ----------------------------------------------------------- queries
    def _weighted(self) -> list[tuple[float, int]]:
        items: list[tuple[float, int]] = []
        for h, lv in enumerate(self.levels):
            w = 1 << h
            items.extend((v, w) for v in lv)
        items.sort(key=lambda t: t[0])
        return items

    def rank(self, value: float) -> int:
        """Estimated number of inserted items ``<= value``."""
        return sum(w for v, w in self._weighted() if v <= value)

    def quantile(self, p: float) -> float:
        """Estimated p-quantile (0 <= p <= 1): the smallest sketched
        value whose estimated rank reaches ``p * n``."""
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"p must be in [0, 1], got {p}")
        items = self._weighted()
        if not items:
            raise ValueError("quantile of an empty sketch")
        target = p * self.n
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return items[-1][0]

    def quantiles(self, ps: list[float]) -> list[float]:
        """Batch form of :meth:`quantile` — one pass over the sketch."""
        items = self._weighted()
        if not items:
            raise ValueError("quantiles of an empty sketch")
        out = []
        for p in ps:
            if not 0.0 <= p <= 1.0:
                raise ValueError(f"p must be in [0, 1], got {p}")
            target = p * self.n
            cum = 0
            ans = items[-1][0]
            for v, w in items:
                cum += w
                if cum >= target:
                    ans = v
                    break
            out.append(ans)
        return out

    # ------------------------------------------------------------- wire
    def to_bytes(self) -> bytes:
        """Compact wire form for shuffling partial sketches between
        executors. Pickle of plain builtins only (version-tagged)."""
        return pickle.dumps(
            ("kll1", self.k, self.n, self.levels, self._coins), protocol=4
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "KLL":
        tag, k, n, levels, coins = pickle.loads(raw)
        if tag != "kll1":
            raise ValueError(f"unknown KLL wire tag {tag!r}")
        sk = cls(k)
        sk.n = n
        sk.levels = [list(lv) for lv in levels]
        sk._coins = list(coins)
        return sk

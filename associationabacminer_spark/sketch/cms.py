"""Count-Min Sketch — mergeable frequency sketch (Cormode & Muthukrishnan,
J. Algorithms 2005).

Replaces the reference's exact ``Counter`` of key=value frequencies over
the unique-log universe (/root/reference/src/TableCreator.py:112-128) and
the batched per-candidate ES count queries
(/root/reference/src/eval/EnvOverassignmentCalculator.py:168-201) with a
fixed-size d x w counter matrix.

Guarantees (for total stream mass N): point estimates never underestimate,
and overestimate by more than eps*N with probability at most delta, where
eps = e / w and delta = e^-d  (classic parametrization w = ceil(e/eps),
d = ceil(ln(1/delta))).  For the test suite we use the simpler additive
bound estimate <= true + e/w * N at confidence 1 - e^-d.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from associationabacminer_spark.sketch.hashing import hash64_multi

_MAGIC = b"CMS1"


class CountMinSketch:
    __slots__ = ("width", "depth", "table", "total")

    def __init__(self, width: int = 2048, depth: int = 5):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    @classmethod
    def from_error(cls, eps: float, delta: float) -> "CountMinSketch":
        """Size the sketch for additive error eps*N at confidence 1-delta."""
        return cls(width=math.ceil(math.e / eps), depth=math.ceil(math.log(1.0 / delta)))

    # -- update -------------------------------------------------------------
    def update_batch(
        self, values, counts=None, prehashed: bool = False
    ) -> "CountMinSketch":
        """Absorb a batch; ``counts`` (optional int array) adds weighted
        mass.  ``prehashed=True``: values are upstream 64-bit key hashes
        (query with the same convention, e.g. via xxhash.xxh64_keys)."""
        n = len(values)
        if n == 0:
            return self
        hm = hash64_multi(values, np.arange(self.depth), prehashed=prehashed) % np.uint64(self.width)
        if counts is None:
            weights = np.ones(n, dtype=np.int64)
        else:
            weights = np.asarray(counts, dtype=np.int64)
        for j in range(self.depth):
            np.add.at(self.table[j], hm[j].astype(np.int64), weights)
        self.total += int(weights.sum())
        return self

    # -- query --------------------------------------------------------------
    def query(self, values, prehashed: bool = False) -> np.ndarray:
        """Vectorized point-frequency estimates for a batch of keys."""
        if len(values) == 0:
            return np.empty(0, dtype=np.int64)
        hm = hash64_multi(values, np.arange(self.depth), prehashed=prehashed) % np.uint64(self.width)
        ests = np.stack(
            [self.table[j][hm[j].astype(np.int64)] for j in range(self.depth)]
        )
        return ests.min(axis=0)

    @property
    def eps(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    # -- merge --------------------------------------------------------------
    @staticmethod
    def merge(a: "CountMinSketch", b: "CountMinSketch") -> "CountMinSketch":
        if (a.width, a.depth) != (b.width, b.depth):
            raise ValueError("cannot merge CMS of different shapes")
        out = CountMinSketch(a.width, a.depth)
        np.add(a.table, b.table, out=out.table)
        out.total = a.total + b.total
        return out

    # -- serde --------------------------------------------------------------
    def serialize(self) -> bytes:
        """Dense or sparse (flat-index, value) pairs — whichever is
        smaller.  Per-partition partials over low-cardinality keys touch
        d * n_distinct cells of the d x w table; sparse encoding keeps
        the tree-merge shuffle payload proportional to distinct keys,
        not sketch width (the 100 TB path)."""
        flat = self.table.ravel()
        nz = np.flatnonzero(flat)
        dense_size = flat.size * 8
        if len(nz) * 16 < dense_size:
            head = _MAGIC + struct.pack(
                "<IIqBq", self.width, self.depth, self.total, 1, len(nz)
            )
            return (
                head
                + nz.astype("<i8").tobytes()
                + flat[nz].astype("<i8").tobytes()
            )
        head = _MAGIC + struct.pack(
            "<IIqBq", self.width, self.depth, self.total, 0, flat.size
        )
        return head + self.table.astype("<i8").tobytes()

    @staticmethod
    def deserialize(data: bytes) -> "CountMinSketch":
        if data[:4] != _MAGIC:
            raise ValueError("not a CMS blob")
        width, depth, total, mode, cnt = struct.unpack("<IIqBq", data[4:29])
        out = CountMinSketch(width, depth)
        out.total = total
        payload = data[29:]
        if mode == 1:
            idx = np.frombuffer(payload, dtype="<i8", count=cnt).astype(np.int64)
            vals = np.frombuffer(payload[cnt * 8 :], dtype="<i8", count=cnt).astype(
                np.int64
            )
            out.table.ravel()[idx] = vals
        else:
            out.table = (
                np.frombuffer(payload, dtype="<i8", count=width * depth)
                .reshape(depth, width)
                .astype(np.int64)
            )
        return out


def inner_product_estimate(a: "CountMinSketch", b: "CountMinSketch") -> int:
    """Join-size / inner-product estimate  sum_k fA(k) * fB(k)  from two
    CMS built with the SAME (width, depth) (Cormode & Muthukrishnan 2005
    §4.2): the row-wise dot product of the counter matrices
    overestimates the true inner product (every colliding pair only
    adds), so the minimum over depth rows is the estimate, with
    Pr[err > eps * Na * Nb] <= delta.

    The planner use: fA/fB are per-join-key frequency sketches of two
    tables, and the inner product IS the equi-join output cardinality —
    a skewed-key join explosion shows up here before any shuffle runs."""
    if (a.width, a.depth) != (b.width, b.depth):
        raise ValueError("inner product requires identically-sized sketches")
    return int((a.table.astype(np.float64) * b.table.astype(np.float64)).sum(axis=1).min())

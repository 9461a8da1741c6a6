"""t-digest — mergeable quantile sketch (Dunning & Ertl, arXiv:1902.04023),
merging-digest variant with the k1 (arcsine) scale function.

Complements KLL for the turn-length / inter-turn-latency quantile queries
(reference analog: the equi-width/equi-frequency hour binning at
/root/reference/src/model/ConfigurableEventNormalizer.py:39-56 and the
hour histogram at /root/reference/src/util/EventTimeBucketCounter.py:37-60).
t-digest trades KLL's worst-case guarantees for much tighter accuracy at
the tails (q -> 0 or 1), which is where latency quantiles live.

Compression is fully vectorized: sorted points are bucketed by
floor(k(q_mid)) in k-space, k(q) = (delta / 2pi) * asin(2q - 1), then
reduced to weighted means per bucket with ``np.bincount``.  Deterministic
(no RNG) -> byte-identical under identical op sequences.
"""

from __future__ import annotations

import struct

import numpy as np

# v2 packs n as a double (fractional weights are legal); v1 packed it as
# int64.  The magic was bumped when the layout changed so stale persisted
# state (lineage ledgers, grouped_sketch_states tables) fails loudly or
# decodes via the legacy branch instead of silently misreading n.
_MAGIC = b"TDG2"
_MAGIC_V1 = b"TDG1"
_BUFFER_CAP = 8192


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf_v", "_buf_w", "n")

    def __init__(self, delta: float = 200.0):
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self.n = 0

    # -- update -------------------------------------------------------------
    def update_batch(self, values, weights=None) -> "TDigest":
        arr = np.asarray(values, dtype=np.float64)
        mask = ~np.isnan(arr)
        arr = arr[mask]
        if len(arr) == 0:
            return self
        w = (
            np.ones(len(arr), dtype=np.float64)
            if weights is None
            else np.asarray(weights, dtype=np.float64)[mask]
        )
        self._buf_v.append(arr)
        self._buf_w.append(w)
        # n counts total WEIGHT (== rows for the unit-weight stream case):
        # weighted points stand in for that many original rows
        self.n += int(w.sum()) if w.sum() == int(w.sum()) else w.sum()
        if sum(len(b) for b in self._buf_v) >= _BUFFER_CAP:
            self._compress()
        return self

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2.0 * np.pi)) * np.arcsin(
            np.clip(2.0 * q - 1.0, -1.0, 1.0)
        )

    def _compress(self) -> None:
        if not self._buf_v and len(self.means) <= self.delta * 2:
            return
        v = np.concatenate([self.means] + self._buf_v)
        w = np.concatenate([self.weights] + self._buf_w)
        self._buf_v, self._buf_w = [], []
        if len(v) == 0:
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        cum = np.cumsum(w)
        q_mid = (cum - w / 2.0) / total
        buckets = np.floor(self._k(q_mid) + self.delta / 4.0).astype(np.int64)
        # bincount-reduce to weighted means per k-space bucket
        _, inv = np.unique(buckets, return_inverse=True)
        bw = np.bincount(inv, weights=w)
        bvw = np.bincount(inv, weights=v * w)
        self.means = bvw / bw
        self.weights = bw

    # -- merge --------------------------------------------------------------
    @staticmethod
    def merge(a: "TDigest", b: "TDigest") -> "TDigest":
        if a.delta != b.delta:
            raise ValueError("cannot merge t-digests with different delta")
        out = TDigest(a.delta)
        a._compress()
        b._compress()
        out._buf_v = [a.means, b.means]
        out._buf_w = [a.weights, b.weights]
        out.n = a.n + b.n
        out._compress()
        return out

    # -- query --------------------------------------------------------------
    def quantile(self, q) -> np.ndarray | float:
        self._compress()
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            res = np.full(len(qs), np.nan)
            return float(res[0]) if scalar else res
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        targets = np.clip(qs, 0.0, 1.0) * total
        res = np.interp(targets, cum, self.means)
        return float(res[0]) if scalar else res

    def rank(self, values) -> np.ndarray:
        self._compress()
        arr = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if len(self.means) == 0:
            return np.zeros(len(arr))
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return np.interp(arr, self.means, cum) / total

    def n_centroids(self) -> int:
        self._compress()
        return len(self.means)

    # -- serde --------------------------------------------------------------
    def serialize(self) -> bytes:
        self._compress()
        # n is packed as a double: fractional weights (update_weighted /
        # weighted update_batch) legitimately produce non-integer n
        head = _MAGIC + struct.pack("<ddI", self.delta, float(self.n), len(self.means))
        return (
            head
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @staticmethod
    def deserialize(data: bytes) -> "TDigest":
        magic = data[:4]
        if magic == _MAGIC:
            delta, n, c = struct.unpack("<ddI", data[4:24])
        elif magic == _MAGIC_V1:
            # TDG1 is ambiguous: the ancient layout packed n as int64
            # ("<dqI") but double-era code wrote "<ddI" under the same magic
            # before the TDG2 bump.  Both headers are 20 bytes with delta and
            # the centroid count c at identical offsets — only the middle 8
            # bytes (n) differ.  Disambiguate by picking the interpretation
            # consistent with sum(weights) (n tracks total weight); a
            # cross-era misread is off by >300 orders of magnitude, so the
            # nearer interpretation is unambiguous.  Ties (e.g. empty digest,
            # both reads 0) prefer the double layout: double-era blobs
            # dominate persisted state.
            delta, n_f, c = struct.unpack("<ddI", data[4:24])
            (n_i,) = struct.unpack("<q", data[12:20])
            if len(data) < 24 + 16 * c:
                # fail loudly BEFORE the heuristic: an 8-byte-aligned
                # truncation would otherwise silently sum fewer than c
                # weights and could pick the wrong n interpretation
                raise ValueError("truncated t-digest blob")
            sw = float(
                np.frombuffer(data[24 + 8 * c : 24 + 16 * c], dtype="<f8").sum()
            )
            n = n_f if abs(n_f - sw) <= abs(float(n_i) - sw) else float(n_i)
        else:
            raise ValueError("not a t-digest blob")
        if len(data) < 24 + 16 * c:
            raise ValueError("truncated t-digest blob")
        out = TDigest(delta)
        out.n = int(n) if n == int(n) else n
        off = 24
        out.means = np.frombuffer(data[off : off + 8 * c], dtype="<f8").astype(
            np.float64
        )
        off += 8 * c
        out.weights = np.frombuffer(data[off : off + 8 * c], dtype="<f8").astype(
            np.float64
        )
        return out

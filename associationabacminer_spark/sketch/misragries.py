"""Misra-Gries heavy-hitters summary — the deterministic frequent-items
sketch (Misra & Gries 1982; mergeable form per Agarwal et al.,
"Mergeable Summaries", PODS 2012 §3).

State: at most k (key-hash, count) pairs, stored hash-sorted so merges
are byte-deterministic.  Guarantees for a stream of total mass N:

* every key with true frequency  f > N/(k+1)  is present (no heavy
  hitter is ever lost), and
* each stored count underestimates by at most err = N/(k+1) (returned
  alongside the summary): f_true - err <= count <= f_true.

merge(a, b) = sum counters pairwise, then subtract the (k+1)-th largest
count from all and drop the non-positive ones — the PODS'12 mergeable
reduction; the combined error adds (err_a + err_b + decrement), tracked
exactly in ``err``.  Unlike CMS (overestimate with probability bounds),
MG is deterministic and underestimate-only — the two bracket the truth
from both sides.

Complements the reference's exact Counter tops
(/root/reference/src/TableCreator.py:112-128) with a fixed-size state.
"""

from __future__ import annotations

import struct

import numpy as np

from associationabacminer_spark.sketch.hashing import hash64

_MAGIC = b"MGS1"


class MisraGries:
    __slots__ = ("k", "keys", "counts", "err", "total")

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.keys = np.empty(0, dtype=np.uint64)  # hash-sorted
        self.counts = np.empty(0, dtype=np.int64)
        self.err = 0  # max undercount of any stored counter
        self.total = 0  # stream mass absorbed

    # -- update -------------------------------------------------------------
    def update_batch(
        self, values, counts=None, prehashed: bool = False
    ) -> "MisraGries":
        """Absorb a batch (vectorized): aggregate the batch exactly with
        np.unique, then merge it in — identical to item-at-a-time MG
        because merge subsumes streaming updates (PODS'12)."""
        if prehashed:
            h = np.asarray(values).astype(np.uint64, copy=False)
        else:
            h = hash64(values)
        if counts is None:
            uk, uc = np.unique(h, return_counts=True)
            uc = uc.astype(np.int64)
        else:
            c = np.asarray(counts, dtype=np.int64)
            # drop non-positive counts up front: they would corrupt
            # total/err accounting and could leave non-positive counters in
            # state (the keep>0 filter only runs when len(uk) > k)
            pos = c > 0
            if not pos.all():
                h, c = h[pos], c[pos]
            uk, inv = np.unique(h, return_inverse=True)
            uc = np.zeros(len(uk), dtype=np.int64)
            np.add.at(uc, inv, c)
        self._combine(uk, uc, other_err=0, other_total=int(uc.sum()))
        return self

    def _combine(self, keys, counts, other_err: int, other_total: int) -> None:
        ak = np.concatenate([self.keys, keys])
        ac = np.concatenate([self.counts, counts])
        uk, inv = np.unique(ak, return_inverse=True)
        uc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(uc, inv, ac)
        dec = 0
        if len(uk) > self.k:
            # subtract the (k+1)-th largest count; keep strictly-positive
            dec = int(np.partition(uc, -(self.k + 1))[-(self.k + 1)])
            uc = uc - dec
            keep = uc > 0
            uk, uc = uk[keep], uc[keep]
        self.keys, self.counts = uk, uc
        self.err = self.err + other_err + dec
        self.total += other_total

    # -- merge / serde ------------------------------------------------------
    @staticmethod
    def merge(a: "MisraGries", b: "MisraGries") -> "MisraGries":
        assert a.k == b.k, "Misra-Gries merge requires equal k"
        out = MisraGries(a.k)
        out.keys, out.counts = a.keys.copy(), a.counts.copy()
        out.err, out.total = a.err, a.total
        out._combine(b.keys, b.counts, other_err=b.err, other_total=b.total)
        return out

    def serialize(self) -> bytes:
        head = _MAGIC + struct.pack("<iqqi", self.k, self.err, self.total, len(self.keys))
        return head + self.keys.tobytes() + self.counts.tobytes()

    @classmethod
    def deserialize(cls, buf: bytes) -> "MisraGries":
        assert buf[:4] == _MAGIC, "not a Misra-Gries summary"
        k, err, total, n = struct.unpack("<iqqi", buf[4:28])
        s = cls(k)
        off = 28
        s.keys = np.frombuffer(buf[off : off + 8 * n], dtype=np.uint64).copy()
        off += 8 * n
        s.counts = np.frombuffer(buf[off : off + 8 * n], dtype=np.int64).copy()
        s.err, s.total = err, total
        return s

    # -- queries ------------------------------------------------------------
    def query(self, values, prehashed: bool = False) -> np.ndarray:
        """Lower-bound counts for the given keys (0 if not tracked);
        true frequency is within [count, count + err]."""
        h = (
            np.asarray(values).astype(np.uint64, copy=False)
            if prehashed
            else hash64(values)
        )
        idx = np.searchsorted(self.keys, h)
        idx = np.clip(idx, 0, max(len(self.keys) - 1, 0))
        out = np.zeros(len(h), dtype=np.int64)
        if len(self.keys):
            hit = self.keys[idx] == h
            out[hit] = self.counts[idx][hit]
        return out

    def error_bound(self) -> int:
        """Max undercount of any stored counter (exact, tracked through
        merges); always <= total/(k+1) for a single-pass build."""
        return int(self.err)

"""Vectorized 64-bit hashing for sketch kernels.

The reference hashes row content with per-row ``hashlib`` calls
(sha1/sha256 at /root/reference/src/model/EnvLogUniverseGenerator.py:91 and
/root/reference/src/model/EnvParamGenerators.py:108) — one Python call per
row, the dominant cost of its distinct-count path.  Here everything is
batch-vectorized: integers go through a numpy splitmix64 finalizer;
strings/bytes go through pandas' C-level siphash
(``pd.util.hash_pandas_object``) and are then re-mixed per seed with
splitmix64.  No per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants (public domain, Vigna 2015)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 array -> uint64 array."""
    with np.errstate(over="ignore"):
        z = (x + _SM_GAMMA) & _MASK64
        z = ((z ^ (z >> _U64(30))) * _SM_M1) & _MASK64
        z = ((z ^ (z >> _U64(27))) * _SM_M2) & _MASK64
        return z ^ (z >> _U64(31))


def _base_hash(values) -> np.ndarray:
    """Seed-independent uint64 base hash of a batch of values.

    Integer/float numpy dtypes take the pure-numpy path; everything else
    (object/str arrays, pandas Series of any dtype) goes through pandas'
    vectorized siphash.
    """
    if isinstance(values, pd.Series):
        arr = values
    else:
        arr = np.asarray(values)
        if arr.dtype.kind in ("i", "u"):
            return arr.astype(np.uint64, copy=False)
        if arr.dtype.kind == "f":
            return arr.view(np.uint64) if arr.dtype == np.float64 else arr.astype(
                np.float64
            ).view(np.uint64)
        arr = pd.Series(arr)
    if arr.dtype.kind in ("i", "u"):
        return arr.to_numpy().astype(np.uint64, copy=False)
    if arr.dtype.kind == "f":
        return arr.to_numpy(dtype=np.float64).view(np.uint64)
    # C-vectorized siphash over object/string values; NaN/None hash stably.
    return pd.util.hash_pandas_object(arr, index=False).to_numpy(dtype=np.uint64)


def _prehashed_base(values) -> np.ndarray:
    """Interpret values as an already-computed 64-bit hash column (e.g.
    Spark's ``xxhash64`` evaluated JVM-side), skipping the base hash.

    This is the scale path: shipping pre-hashed int64 keys through Arrow
    instead of strings both shrinks the transfer and — measured in this
    sandbox — avoids the string-column Arrow path that anti-scales under
    many concurrent Python workers."""
    if isinstance(values, pd.Series):
        values = values.to_numpy()
    arr = np.asarray(values)
    if arr.dtype == np.uint64:
        return arr
    return arr.astype(np.int64, copy=False).view(np.uint64)


def hash64(values, seed: int = 0, prehashed: bool = False) -> np.ndarray:
    """Vectorized seeded 64-bit hash.

    Parameters
    ----------
    values : np.ndarray | pd.Series | sequence
        Batch of values (ints, floats, strings, bytes) — or pre-hashed
        int64 keys when ``prehashed`` is True.
    seed : int
        Hash-family selector (used by CMS rows, Bloom probes, minhash
        permutations).

    Returns
    -------
    np.ndarray of uint64, same length as ``values``.
    """
    base = _prehashed_base(values) if prehashed else _base_hash(values)
    if prehashed and seed == 0:
        return base  # already well-mixed 64-bit values
    with np.errstate(over="ignore"):
        return splitmix64(base ^ (splitmix64(np.array([seed], dtype=np.uint64))[0]))


def hash64_multi(values, seeds: np.ndarray, prehashed: bool = False) -> np.ndarray:
    """Hash one batch under many seeds at once -> shape (len(seeds), n).

    One base-hash pass, then a cheap splitmix re-mix per seed — this is
    what keeps d-row CMS updates and k-probe Bloom inserts vectorized.
    """
    base = _prehashed_base(values) if prehashed else _base_hash(values)
    seed_mix = splitmix64(np.asarray(seeds, dtype=np.uint64))
    with np.errstate(over="ignore"):
        return splitmix64(base[None, :] ^ seed_mix[:, None])

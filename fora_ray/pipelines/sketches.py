"""Mergeable sketch aggregates — HyperLogLog distinct counting and
Count-Min-prefiltered heavy hitters (SURVEY 2.6 extension; the brief's
"novel sketch" custom-operator family).

Why sketches at the 100 TB tier: an exact ``COUNT(DISTINCT key)`` or an
exact per-key frequency table is an all-to-all shuffle of every key.
A mergeable sketch is one streaming ``aggregate`` pass producing a few
KB of state per block plus an associative, commutative combine — no
shuffle of row data at all.  Both sketches here are deterministic
(counter-based splitmix64 hashing, no RNG state) and their merge is
order-invariant (register max / counter sum), so the distributed result
is bit-identical at ANY partitioning — which is what lets a
single-process replay serve as a golden oracle (fora_ray/goldens.py).

Heavy hitters compose the sketch with an exact follow-up:

  pass 1  aggregate: Count-Min sketch of the key column (no shuffle)
  pass 2  map_batches: per-block value_counts, keep values whose CMS
          estimate >= threshold (CMS never underestimates, so the
          candidate set provably contains every true heavy hitter)
  pass 3  tiny groupby over candidates only + exact-count filter

The output is therefore EXACT (all keys with true count >= phi * N) and
plain-SQL-oracled, while the full-key shuffle is replaced by a shuffle
of just the candidate set.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_str_u64, mix64, splitmix64

_U64 = np.uint64


def _values_u64(arr) -> np.ndarray:
    """Deterministic uint64 hash of an Arrow array (int or string)."""
    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False)
        return splitmix64(v.astype(np.uint64))
    return splitmix64(hash_str_u64(arr.to_pylist()))


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _hll_alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_accumulate(registers: np.ndarray, hashes: np.ndarray, p: int) -> None:
    """Fold uint64 hashes into 2^p registers in place (vectorized).

    Register index = low p bits; rank = trailing zeros of the remaining
    64-p bits + 1 (same geometric law as the classic leading-zero form,
    exactly vectorizable: the isolated lowest set bit is a power of two,
    which float64 log2 represents exactly)."""
    m = 1 << p
    idx = (hashes & _U64(m - 1)).astype(np.int64)
    v = (hashes >> _U64(p)) | (_U64(1) << _U64(64 - p))  # sentinel caps rank
    with np.errstate(over="ignore"):
        iso = v & (~v + _U64(1))
    rho = np.log2(iso.astype(np.float64)).astype(np.int64) + 1
    np.maximum.at(registers, idx, rho)


def hll_estimate(registers: np.ndarray) -> int:
    """Standard HLL estimator with the small-range (linear counting)
    correction; 64-bit hashes need no large-range correction."""
    m = registers.size
    e = _hll_alpha(m) * m * m / float(np.sum(np.exp2(-registers.astype(np.float64))))
    zeros = int((registers == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return int(round(e))


def _make_hll_agg(on: str, p: int, alias: str):
    from ray.data.aggregate import AggregateFnV2

    class _HLL(AggregateFnV2):
        def __init__(self):
            super().__init__(alias, zero_factory=lambda: np.zeros(1 << p, np.int8),
                             on=on, ignore_nulls=True)

        def aggregate_block(self, block):
            regs = np.zeros(1 << p, np.int8)
            col = block[on]
            if block.num_rows:
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                arr = arr.drop_null()
                if len(arr):
                    hll_accumulate(regs, _values_u64(arr), p)
            return regs

        def combine(self, a, b):
            return np.maximum(a, b)

        def finalize(self, a):
            return hll_estimate(a.astype(np.int64))

    return _HLL()


def hll_distinct(ds, on: str, p: int = 12, alias: str | None = None) -> int:
    """Approximate COUNT(DISTINCT on) in one shuffle-free aggregate pass.

    Relative error ~1.04/sqrt(2^p) (1.6% at the default p=12, 4 KB of
    state); below ~2.5 * 2^p distinct values the linear-counting branch
    is near-exact.  Result is independent of partitioning."""
    alias = alias or f"hll_distinct({on})"
    out = ds.aggregate(_make_hll_agg(on, p, alias))
    return int(out[alias])


# ---------------------------------------------------------------------------
# Histogram-based approximate quantiles
# ---------------------------------------------------------------------------

def _make_hist_agg(on: str, bins: int, lo: float, hi: float, alias: str):
    from ray.data.aggregate import AggregateFnV2

    width = (hi - lo) / bins if hi > lo else 1.0

    class _Hist(AggregateFnV2):
        def __init__(self):
            super().__init__(alias, zero_factory=lambda: np.zeros(bins, np.int64),
                             on=on, ignore_nulls=True)

        def aggregate_block(self, block):
            acc = np.zeros(bins, np.int64)
            col = block[on]
            if block.num_rows:
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                v = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
                if v.size:
                    idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
                    np.add.at(acc, idx, 1)
            return acc

        def combine(self, a, b):
            return a + b

        def finalize(self, a):
            return a

    return _Hist()


def approx_quantiles(ds, on: str, qs=(0.25, 0.5, 0.75), bins: int = 4096,
                     lo: float | None = None, hi: float | None = None):
    """Approximate quantiles from a fixed-bin histogram: two shuffle-free
    aggregate passes (exact min/max, then int64 bin counts whose sum-merge
    is order-invariant -> result independent of partitioning).  Error is
    bounded by one bin width in VALUE space ((hi-lo)/bins); rank position
    within the owning bin is linearly interpolated.

    Returns {q: estimate}.  Deterministic, so a single-process replay of
    the same histogram is a bit-identical golden oracle."""
    if lo is None or hi is None:
        from ray.data.aggregate import Max, Min

        mm = ds.aggregate(Min(on), Max(on))
        lo = float(mm[f"min({on})"]) if lo is None else lo
        hi = float(mm[f"max({on})"]) if hi is None else hi
    if hi <= lo:
        return {float(q): float(lo) for q in qs}
    alias = f"hist({on})"
    counts = ds.aggregate(_make_hist_agg(on, bins, lo, hi, alias))[alias]
    return histogram_quantiles(counts, qs, lo, hi)


def histogram_quantiles(counts: np.ndarray, qs, lo: float, hi: float) -> dict:
    """Deterministic quantile readout from bin counts (shared by the
    distributed path and the golden replay — pure numpy on a tiny array)."""
    bins = counts.size
    width = (hi - lo) / bins
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = {}
    for q in qs:
        r = q * (n - 1)  # fractional 0-indexed rank
        b = int(np.searchsorted(cum, math.floor(r) + 1))
        b = min(b, bins - 1)
        below = int(cum[b - 1]) if b > 0 else 0
        in_bin = int(counts[b])
        frac = ((r - below) / in_bin) if in_bin > 0 else 0.0
        out[float(q)] = float(lo + (b + min(max(frac, 0.0), 1.0)) * width)
    return out


# ---------------------------------------------------------------------------
# Count-Min + exact heavy hitters
# ---------------------------------------------------------------------------

def _cms_rows(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, len) int64 matrix of CMS column indices per hash."""
    return np.stack([
        (mix64(hashes, _U64(j + 1)) % _U64(width)).astype(np.int64)
        for j in range(depth)
    ])


def _make_cms_agg(on: str, depth: int, width: int, alias: str):
    from ray.data.aggregate import AggregateFnV2

    class _CMS(AggregateFnV2):
        def __init__(self):
            super().__init__(alias, zero_factory=lambda: np.zeros((depth, width), np.int64),
                             on=on, ignore_nulls=True)

        def aggregate_block(self, block):
            acc = np.zeros((depth, width), np.int64)
            col = block[on]
            if block.num_rows:
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                arr = arr.drop_null()
                if len(arr):
                    rows = _cms_rows(_values_u64(arr), depth, width)
                    for j in range(depth):
                        np.add.at(acc[j], rows[j], 1)
            return acc

        def combine(self, a, b):
            return a + b

        def finalize(self, a):
            return a

    return _CMS()


def count_min_sketch(ds, on: str, depth: int = 4, width: int = 4096) -> np.ndarray:
    """One-pass (depth, width) Count-Min sketch of a column.  Estimates
    (min over rows) never underestimate a key's true count; expected
    overestimate is N * e / width per row."""
    alias = f"cms({on})"
    return ds.aggregate(_make_cms_agg(on, depth, width, alias))[alias]


def heavy_hitters(ds, on: str, phi: float = 0.01, depth: int = 4,
                  width: int = 4096, total: int | None = None):
    """EXACT phi-heavy hitters: all values of `on` with true count
    >= ceil(phi * N), as a Dataset (value, n) — computed without ever
    shuffling the full key column (see module docstring).

    `ds` is consumed twice (sketch pass + candidate pass); pass a
    materialized or re-readable Dataset.
    """
    import ray

    if total is None:
        total = ds.count()
    thresh = max(1, math.ceil(phi * total))
    cms_ref = ray.put(count_min_sketch(ds, on, depth=depth, width=width))

    def candidates(t: pa.Table) -> pa.Table:
        empty = pa.table({"value": pa.array([], t[on].type if t.num_rows else pa.int64()),
                          "n_part": pa.array([], pa.int64())})
        if t.num_rows == 0 or on not in t.schema.names:
            return empty
        cms = ray.get(cms_ref)
        vc = pc.value_counts(t[on].combine_chunks() if isinstance(t[on], pa.ChunkedArray) else t[on])
        vals, counts = vc.field("values"), vc.field("counts")
        ok = pc.is_valid(vals)
        vals, counts = vals.filter(ok), counts.filter(ok)
        if len(vals) == 0:
            return empty
        rows = _cms_rows(_values_u64(vals), cms.shape[0], cms.shape[1])
        est = np.min(cms[np.arange(cms.shape[0])[:, None], rows], axis=0)
        keep = pa.array(est >= thresh)
        return pa.table({"value": vals.filter(keep),
                         "n_part": counts.filter(keep).cast(pa.int64())})

    from ray.data.aggregate import Sum

    from ..stages.shuffle import drop_empty_blocks

    agg = (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n_part", alias_name="n"))
    )
    out = drop_empty_blocks(agg).filter(
        lambda row: row["n"] >= thresh
    )
    return out.sort("value")

"""Vectorized xxhash64 content fingerprint for token arrays.

This is the engine's analog of the reference's pluggable checksum kernel
(``checksum_generator`` slot, /root/reference/data_validation.py:430-432,
bound to a chunked CRC32 at :642). Design doctrine carried over: *"hash +
filesize uniquely identify data, regardless of path"*
(/root/reference/data_validation.py:5) — here, ``(tok_hash, n_tok)``
uniquely identify a token payload regardless of ``doc_id``/``source``.

Two interchangeable kernels (same slot-style contract as the reference's
chunk_crc32 vs mmap_direct swap, /root/reference/refactor.py:43-48):

* ``pandas_udf`` (default, the mandated surface): XXH64 of the
  little-endian int32 byte buffer, computed batch-wise in numpy over Arrow
  batches. The per-batch hot loop is fully vectorized across rows — a
  padded ``[rows, max_len]`` lane matrix processed stripe-by-stripe with
  row masks; there is **no per-row Python**.
* ``jvm``: built-in ``F.xxhash64(tokens)`` (whole-stage codegen; a fold of
  per-element hashes, so a *different* value space than the buffer hash —
  consistent within itself, used as the throughput upper bound in bench).

The XXH64 algorithm is implemented from the public spec
(github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md). A golden
self-test (`kernel_self_test`) mirrors the reference's habit of asserting
``crc32(b'foo') == '8C736521'`` before every use
(/root/reference/data_validation.py:204-208, :493-496).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)
_U64 = np.uint64
_MASK64 = 0xFFFFFFFFFFFFFFFF

#: Published XXH64 test vector: hash of empty input at seed 0.
XXH64_EMPTY = 0xEF46DB3751D8E999

#: Golden values for the kernel self-test, pinned from the scalar spec
#: implementation (analog of the reference's golden '8C736521').
GOLDEN_TOKENS = [1, 2, 3]
#: XXH64(le-bytes(int32 [1,2,3]), seed=0) — pinned from the scalar spec
#: implementation; as signed int64 (Spark LongType): -5398535361462201860.
GOLDEN_HASH: int = 13048208712247349756


def _rotl(x: np.ndarray | np.uint64, r: int):
    r = _U64(r)
    return (x << r) | (x >> (_U64(64) - r))


def _round(acc, lane):
    return _rotl(acc + lane * _P2, 31) * _P1


# ---------------------------------------------------------------------------
# Scalar spec implementation (tests / goldens only — not the hot path)
# ---------------------------------------------------------------------------


def xxh64_bytes_scalar(data: bytes, seed: int = 0) -> int:
    """Plain-Python XXH64 straight from the public spec. O(len) Python —
    used only to pin goldens and property-test the vectorized kernel."""
    p1, p2, p3, p4, p5 = (int(x) for x in (_P1, _P2, _P3, _P4, _P5))

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _MASK64

    def rnd(acc: int, lane: int) -> int:
        return (rotl((acc + lane * p2) & _MASK64, 31) * p1) & _MASK64

    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + p1 + p2) & _MASK64
        a2 = (seed + p2) & _MASK64
        a3 = seed & _MASK64
        a4 = (seed - p1) & _MASK64
        while n - i >= 32:
            a1 = rnd(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = rnd(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = rnd(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = rnd(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)) & _MASK64
        for a in (a1, a2, a3, a4):
            acc = ((acc ^ rnd(0, a)) * p1 + p4) & _MASK64
    else:
        acc = (seed + p5) & _MASK64
    acc = (acc + n) & _MASK64
    while n - i >= 8:
        acc = (rotl(acc ^ rnd(0, int.from_bytes(data[i : i + 8], "little")), 27) * p1 + p4) & _MASK64
        i += 8
    while n - i >= 4:
        acc = (rotl(acc ^ ((int.from_bytes(data[i : i + 4], "little") * p1) & _MASK64), 23) * p2 + p3) & _MASK64
        i += 4
    while n - i >= 1:
        acc = (rotl(acc ^ ((data[i] * p5) & _MASK64), 11) * p1) & _MASK64
        i += 1
    acc ^= acc >> 33
    acc = (acc * p2) & _MASK64
    acc ^= acc >> 29
    acc = (acc * p3) & _MASK64
    acc ^= acc >> 32
    return acc


def xxh64_int32_scalar(tokens, seed: int = 0) -> int:
    """XXH64 of a token array's little-endian int32 buffer (scalar ref)."""
    buf = np.asarray(tokens, dtype=np.int32).tobytes()
    return xxh64_bytes_scalar(buf, seed)


# ---------------------------------------------------------------------------
# Vectorized batch kernel (the hot path)
# ---------------------------------------------------------------------------


def xxh64_int32_batch(
    flat: np.ndarray, offsets: np.ndarray, seed: int = 0
) -> np.ndarray:
    """XXH64 of N variable-length int32 buffers, vectorized across rows.

    flat: concatenated int32 token values of all rows (Arrow list layout);
    offsets: int64[N+1] row boundaries into ``flat``.
    Returns uint64[N].

    Strategy: rows are padded into a ``[N, Lmax]`` uint64 lane matrix; the
    32-byte-stripe loop runs ``Lmax // 8`` iterations of whole-column numpy
    ops with per-row activity masks, so cost is O(N * Lmax / 8) vector ops —
    no Python touches an individual row. Each token is one 4-byte XXH64
    lane; buffer length is always a multiple of 4, so there is no 1-byte
    tail phase.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    flat_u = np.ascontiguousarray(np.asarray(flat, dtype=np.int32)).view(np.uint32)
    flat_u = flat_u[int(offsets[0]) : int(offsets[-1])]
    starts = offsets[:-1] - offsets[0]
    lens = np.diff(offsets)
    with np.errstate(over="ignore"):
        return _xxh64_dispatch(flat_u, starts, lens, seed)


#: Row-block size: keeps each column op's working set (~8B * block) inside
#: cache and bounds the padded-matrix allocation.
_BLOCK_ROWS = 16384


def _xxh64_dispatch(
    flat_u: np.ndarray, starts: np.ndarray, lens: np.ndarray, seed: int
) -> np.ndarray:
    """Process rows in blocks of ``_BLOCK_ROWS``. When row lengths are
    skewed (padded work would exceed ~2x the true token count), sort rows by
    length first so each block is near-uniform, then scatter results back —
    padded work then tracks the true token count, not ``rows x max_len``."""
    n = len(lens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lmax = int(lens.max())
    skewed = n > 1 and lmax > int(lens.min())
    order = np.argsort(lens, kind="stable") if skewed else None
    out = np.empty(n, dtype=np.uint64)
    for lo in range(0, n, _BLOCK_ROWS):
        hi = min(lo + _BLOCK_ROWS, n)
        if order is None:
            out[lo:hi] = _xxh64_block(flat_u, starts[lo:hi], lens[lo:hi], seed)
        else:
            idx = order[lo:hi]
            out[idx] = _xxh64_block(flat_u, starts[idx], lens[idx], seed)
    return out


def _xxh64_block(
    flat_u: np.ndarray, starts: np.ndarray, lens: np.ndarray, seed: int = 0
) -> np.ndarray:
    n = len(lens)
    seed_u = _U64(seed)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lmax = int(lens.max())

    if lmax == 0:
        acc = np.full(n, seed_u + _P5, dtype=np.uint64)
        return _avalanche(acc)

    uniform = bool((lens == lmax).all())

    # Padded token matrix [n, lpad] uint32, lpad a multiple of 8 so a uint64
    # view pairs adjacent tokens into ready-made 8-byte little-endian lanes
    # (token[2i] | token[2i+1] << 32) with zero arithmetic.
    lpad = (lmax + 7) & ~7
    contiguous = uniform and bool(
        (starts == starts[0] + np.arange(n, dtype=np.int64) * lmax).all()
    )
    if contiguous and lpad == lmax:
        m32 = flat_u[starts[0] : starts[0] + n * lmax].reshape(n, lmax)
    else:
        # 1D flat scatter: dest[g] = row*lpad + col for the g-th token.
        m32 = np.zeros(n * lpad, dtype=np.uint32)
        total = int(lens.sum())
        cum = np.cumsum(lens) - lens  # first flat position of each row
        pos = np.arange(total, dtype=np.int64)
        m32[pos + np.repeat(np.arange(n, dtype=np.int64) * lpad - cum, lens)] = (
            flat_u[pos + np.repeat(starts - cum, lens)]
        )
        m32 = m32.reshape(n, lpad)
    m64 = m32.view(np.uint64)  # [n, lpad/2]

    nstripes = lens // 8  # 32-byte stripes = 8 tokens = 4 uint64 lanes
    max_ns = int(nstripes.max())
    # When rows arrive sorted by length (the skew dispatch path), stripe-s
    # activity is a suffix — use slices instead of per-row masks.
    ns_sorted = bool((np.diff(nstripes) >= 0).all()) if n > 1 else True

    a1 = np.full(n, seed_u + _P1 + _P2, dtype=np.uint64)
    a2 = np.full(n, seed_u + _P2, dtype=np.uint64)
    a3 = np.full(n, seed_u, dtype=np.uint64)
    a4 = np.full(n, seed_u - _P1, dtype=np.uint64)
    for s in range(max_ns):
        b = 4 * s
        if uniform:
            a1 = _round(a1, m64[:, b])
            a2 = _round(a2, m64[:, b + 1])
            a3 = _round(a3, m64[:, b + 2])
            a4 = _round(a4, m64[:, b + 3])
        elif ns_sorted:
            k = int(np.searchsorted(nstripes, s, side="right"))
            a1[k:] = _round(a1[k:], m64[k:, b])
            a2[k:] = _round(a2[k:], m64[k:, b + 1])
            a3[k:] = _round(a3[k:], m64[k:, b + 2])
            a4[k:] = _round(a4[k:], m64[k:, b + 3])
        else:
            active = nstripes > s
            a1 = np.where(active, _round(a1, m64[:, b]), a1)
            a2 = np.where(active, _round(a2, m64[:, b + 1]), a2)
            a3 = np.where(active, _round(a3, m64[:, b + 2]), a3)
            a4 = np.where(active, _round(a4, m64[:, b + 3]), a4)

    merged = _rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)
    for a in (a1, a2, a3, a4):
        merged = (merged ^ _round(np.uint64(0), a)) * _P1 + _P4
    acc = np.where(nstripes > 0, merged, seed_u + _P5)

    acc = acc + lens.astype(np.uint64) * _U64(4)  # total byte length

    # Tail: up to 3 eight-byte lanes (token pairs) + up to 1 four-byte lane.
    # Stripe starts are 8-token aligned, so pair lanes sit at uint64 column
    # nstripes*4 + k and the final odd token is the low half of the next one.
    trem = lens - nstripes * 8  # 0..7 tokens
    npairs = trem // 2
    if trem.any():
        c64 = nstripes * 4
        last64 = lpad // 2 - 1
        for k in range(3):
            active = npairs > k
            if not active.any():
                break
            lane = np.take_along_axis(
                m64, np.minimum(c64 + k, last64)[:, None], 1
            )[:, 0]
            upd = _rotl(acc ^ _round(np.uint64(0), lane), 27) * _P1 + _P4
            acc = np.where(active, upd, acc)
        has4 = (trem % 2) == 1
        if has4.any():
            lane4 = (
                np.take_along_axis(
                    m64, np.minimum(c64 + npairs, last64)[:, None], 1
                )[:, 0]
                & _U64(0xFFFFFFFF)
            )
            upd = _rotl(acc ^ (lane4 * _P1), 23) * _P2 + _P3
            acc = np.where(has4, upd, acc)

    return _avalanche(acc)


def _avalanche(acc: np.ndarray) -> np.ndarray:
    acc = acc ^ (acc >> _U64(33))
    acc = acc * _P2
    acc = acc ^ (acc >> _U64(29))
    acc = acc * _P3
    acc = acc ^ (acc >> _U64(32))
    return acc


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def tok_hash_udf(tokens: pd.Series) -> pd.Series:
    """Vectorized pandas UDF: tok_hash = XXH64(int32-LE buffer).

    Converts the incoming Series to an Arrow ListArray once (C-level), then
    hands the flat values + offsets straight to the numpy kernel. Null token
    arrays hash to null (the reference's "checksum not yet generated" state,
    /root/reference/data_validation.py:549-550).

    Kept as the cross-checked twin of ``tok_hash_arrow`` (r9): the pandas
    boundary pays two extra conversions per batch — Spark's Arrow->pandas
    materializes one numpy object per row for a list column, and
    ``pa.array`` re-boxes them — measured ~0.25 s/8M rows warm and ~2 s
    cold vs the Arrow-native form, for identical values.
    """
    arr = pa.array(tokens, type=pa.list_(pa.int32()))
    offsets = arr.offsets.to_numpy()
    base, end = int(offsets[0]), int(offsets[-1])
    flat = arr.values.slice(base, end - base).to_numpy(zero_copy_only=False)
    hashes = xxh64_int32_batch(flat, offsets - base).view(np.int64)
    result = pd.Series(hashes, dtype="Int64")
    valid = np.asarray(arr.is_valid())
    result[~valid] = pd.NA
    return result


@F.arrow_udf(T.LongType())
def tok_hash_arrow(tokens: pa.Array) -> pa.Array:
    """Arrow-native vectorized UDF (r9, the hot-path kernel): the batch
    arrives as a ``pa.ListArray`` and the flat values + offsets go straight
    to the numpy kernel — no Arrow->pandas->Arrow round trip, no per-row
    object materialization (guide §4: control how efficiently columns cross
    the boundary). Values are bit-identical to ``tok_hash_udf`` (same
    kernel; pinned by the udf_xxhash_golden driver oracle and
    tests/test_hashing.py)."""
    if isinstance(tokens, pa.ChunkedArray):  # defensive: chunked batches
        tokens = tokens.combine_chunks()
    if not (pa.types.is_list(tokens.type) and tokens.type.value_type == pa.int32()):
        tokens = tokens.cast(pa.list_(pa.int32()))
    offsets = tokens.offsets.to_numpy()
    base, end = int(offsets[0]), int(offsets[-1])
    flat = tokens.values.slice(base, end - base).to_numpy(zero_copy_only=False)
    hashes = xxh64_int32_batch(flat, offsets - base).view(np.int64)
    valid = np.asarray(tokens.is_valid())
    if valid.all():
        return pa.array(hashes, type=pa.int64())
    return pa.array(hashes, type=pa.int64(), mask=~valid)


def tok_hash_jvm(col: str | Column = "tokens") -> Column:
    """JVM-side alternative fingerprint (whole-stage codegen, no Python).

    NOTE: Spark's xxhash64 over an array folds per-element hashes, so its
    values differ from the buffer hash — both sides (snapshot + manifest)
    must use the same kernel. Used as the bench upper bound.
    """
    return F.xxhash64(col)


def with_tok_hash(
    df: DataFrame, tokens_col: str = "tokens", method: str = "pandas_udf"
) -> DataFrame:
    """Append ``tok_hash`` to a sequences DataFrame.

    The reference gated checksum generation behind size thresholds because
    per-file CRC32 was expensive (checksum_threshold,
    /root/reference/data_validation.py:424,487-491); the vectorized kernel
    removes the need — every row is fingerprinted.

    ``method="pandas_udf"`` (the vectorized-Python kernel slot) dispatches
    to the Arrow-native kernel since r9 — same numpy hot loop, same values
    (golden-pinned), minus the Arrow->pandas->Arrow round trip; pass
    ``"pandas_series"`` to force the legacy pandas boundary for comparison.
    """
    if method in ("pandas_udf", "arrow_udf"):
        return df.withColumn("tok_hash", tok_hash_arrow(F.col(tokens_col)))
    if method == "pandas_series":
        return df.withColumn("tok_hash", tok_hash_udf(F.col(tokens_col)))
    if method == "jvm":
        return df.withColumn("tok_hash", tok_hash_jvm(tokens_col))
    raise ValueError(f"unknown tok_hash method: {method!r}")


def kernel_self_test() -> None:
    """Golden self-check before use — analog of the reference's
    ``test_crc32_function`` run before every generation
    (/root/reference/data_validation.py:204-208, :493-496)."""
    empty = xxh64_int32_batch(np.array([], dtype=np.int32), np.array([0, 0]))
    assert int(empty[0]) == XXH64_EMPTY, "xxh64 kernel failed empty-input golden"
    got = xxh64_int32_batch(
        np.array(GOLDEN_TOKENS, dtype=np.int32), np.array([0, len(GOLDEN_TOKENS)])
    )
    expect = xxh64_int32_scalar(GOLDEN_TOKENS)
    assert int(got[0]) == expect, "xxh64 vector kernel diverged from scalar spec"
    if GOLDEN_HASH is not None:
        assert expect == GOLDEN_HASH, "xxh64 scalar kernel diverged from pinned golden"

"""Vectorized Z-order (Morton) and Hilbert curve keys.

Space-filling-curve clustering keys computed the way the north rule mandates:
whole-column NumPy bit ops inside Arrow pandas UDFs — the same vectorized
pattern as the reference's only UDF (grouped-map pandas UDF at
`src/elt/gold/fact_daily_ohlcv.py:93-147`), never per-row Python.

Division of labor with the JVM: hashing of string dims (source, doc_id) is
done by Spark's built-in ``xxhash64`` (codegen'd, JVM-side); Python only sees
fixed-width integers and interleaves bits. The UDFs return int64 (63 usable
bits), so the key sorts natively in Spark without decimal/binary overhead.

All magic constants are the standard public-domain Morton spreading masks;
the Hilbert transform is the classic Wikipedia xy2d rotation algorithm,
vectorized with boolean masks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_U = np.uint64


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 21 bits to every 3rd bit (3-dim Morton)."""
    x = x & _U(0x1FFFFF)
    x = (x | (x << _U(32))) & _U(0x1F00000000FFFF)
    x = (x | (x << _U(16))) & _U(0x1F0000FF0000FF)
    x = (x | (x << _U(8))) & _U(0x100F00F00F00F00F)
    x = (x | (x << _U(4))) & _U(0x10C30C30C30C30C3)
    x = (x | (x << _U(2))) & _U(0x1249249249249249)
    return x


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 31 bits to every 2nd bit (2-dim Morton)."""
    x = x & _U(0x7FFFFFFF)
    x = (x | (x << _U(16))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x << _U(8))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U(2))) & _U(0x3333333333333333)
    x = (x | (x << _U(1))) & _U(0x5555555555555555)
    return x


def morton3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Interleave three 21-bit values -> 63-bit Z-order key."""
    return _part1by2(a) | (_part1by2(b) << _U(1)) | (_part1by2(c) << _U(2))


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two 31-bit values -> 62-bit Z-order key."""
    return _part1by1(a) | (_part1by1(b) << _U(1))


def hilbert2(x: np.ndarray, y: np.ndarray, order: int = 31) -> np.ndarray:
    """Vectorized 2-D Hilbert index of (x, y), each in [0, 2^order)."""
    x = x.astype(np.uint64) & _U((1 << order) - 1)
    y = y.astype(np.uint64) & _U((1 << order) - 1)
    d = np.zeros_like(x)
    s = _U(1) << _U(order - 1)
    one = _U(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((_U(3) * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x_f = s - one - x
        y_f = s - one - y
        x = np.where(flip, x_f, x)
        y = np.where(flip, y_f, y)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        s >>= one
    return d


def hilbert2_inverse(d: np.ndarray, order: int = 31) -> tuple[np.ndarray, np.ndarray]:
    """Inverse transform (tests: round-trip property)."""
    d = d.astype(np.uint64)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d.copy()
    one = _U(1)
    s = _U(1)
    top = _U(1) << _U(order)
    while s < top:
        rx = one & (t >> one)
        ry = one & (t ^ rx)
        flip = (ry == 0) & (rx == 1)
        x_f = s - one - x
        y_f = s - one - y
        x = np.where(flip, x_f, x)
        y = np.where(flip, y_f, y)
        swap = ry == 0
        x, y = np.where(swap, y, x), np.where(swap, x, y)
        x += s * rx
        y += s * ry
        t >>= _U(2)
        s <<= one
    return x, y


def _to_bits(v: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    """Min/max-scale a numeric column into [0, 2^bits) rank space."""
    span = hi - lo
    if span <= 0:
        return np.zeros(len(v), dtype=np.uint64)
    scaled = (v.astype(np.float64) - lo) / span
    return np.clip(scaled * ((1 << bits) - 1), 0, (1 << bits) - 1).astype(np.uint64)


def _hash_bits(h: pd.Series, bits: int) -> np.ndarray:
    """Top ``bits`` of a signed-int64 xxhash64 column (uniform by design)."""
    return h.to_numpy(dtype=np.int64).view(np.uint64) >> _U(64 - bits)


def zkey3_udf(lo: float, hi: float):
    """pandas UDF: zkey(n_tok, xxhash64(source), xxhash64(doc_id)) -> int64."""

    @pandas_udf("long")
    def zkey(n_tok: pd.Series, h_src: pd.Series, h_doc: pd.Series) -> pd.Series:
        a = _to_bits(n_tok.to_numpy(), lo, hi, 21)
        b = _hash_bits(h_src, 21)
        c = _hash_bits(h_doc, 21)
        return pd.Series(morton3(a, b, c).astype(np.int64))

    return zkey


def zkey2_udf(lo: float, hi: float):
    """pandas UDF: zkey(n_tok, xxhash64(doc_id)) -> int64 (2-dim)."""

    @pandas_udf("long")
    def zkey(n_tok: pd.Series, h_doc: pd.Series) -> pd.Series:
        a = _to_bits(n_tok.to_numpy(), lo, hi, 31)
        b = _hash_bits(h_doc, 31)
        return pd.Series(morton2(a, b).astype(np.int64))

    return zkey


def hkey2_udf(lo: float, hi: float):
    """pandas UDF: Hilbert key over (n_tok, xxhash64(doc_id)) -> int64."""

    @pandas_udf("long")
    def hkey(n_tok: pd.Series, h_doc: pd.Series) -> pd.Series:
        a = _to_bits(n_tok.to_numpy(), lo, hi, 31)
        b = _hash_bits(h_doc, 31)
        return pd.Series(hilbert2(a, b, order=31).astype(np.int64))

    return hkey


# ---------------------------------------------------------------------------
# JVM-native Morton keys: the same spread-bits pipeline as the NumPy kernels,
# expressed with built-in shiftleft/&/| so it stays inside whole-stage codegen
# and costs nothing extra when repartitionByRange evaluates the key twice
# (range-sampling pass + shuffle pass). Tests assert bit-equality with the
# Arrow-UDF kernels; Hilbert keeps the Arrow path (its per-bit rotation loop
# has no sane SQL form).

_SPREAD3 = [
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]
_SPREAD2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_sql(c: Column, steps: list[tuple[int, int]], in_mask: int) -> Column:
    x = c.bitwiseAND(F.lit(in_mask))
    for shift, mask in steps:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _scale_sql(c: Column, lo: float, hi: float, bits: int) -> Column:
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (c.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float((1 << bits) - 1))
    return F.least(
        F.greatest(scaled, F.lit(0.0)), F.lit(float((1 << bits) - 1))
    ).cast("long")


def _hash_bits_sql(c: Column, bits: int) -> Column:
    # logical right shift of the signed xxhash64 == NumPy's uint64 >> shift
    return F.shiftrightunsigned(c, 64 - bits)


def zkey3_sql(numeric_col: str, h1: Column, h2: Column, lo: float, hi: float) -> Column:
    a = _scale_sql(F.col(numeric_col), lo, hi, 21)
    b = _hash_bits_sql(h1, 21)
    c = _hash_bits_sql(h2, 21)
    return (
        _spread_sql(a, _SPREAD3, 0x1FFFFF)
        .bitwiseOR(F.shiftleft(_spread_sql(b, _SPREAD3, 0x1FFFFF), 1))
        .bitwiseOR(F.shiftleft(_spread_sql(c, _SPREAD3, 0x1FFFFF), 2))
    )


def zkey2_sql(numeric_col: str, h1: Column, lo: float, hi: float) -> Column:
    a = _scale_sql(F.col(numeric_col), lo, hi, 31)
    b = _hash_bits_sql(h1, 31)
    return _spread_sql(a, _SPREAD2, 0x7FFFFFFF).bitwiseOR(
        F.shiftleft(_spread_sql(b, _SPREAD2, 0x7FFFFFFF), 1)
    )


# ---------------------------------------------------------------------------
# Fully-native kernels (no JVM in the loop): used by the staged-exchange
# clustering rewrite, where tasks read Parquet with pyarrow directly and the
# string dims never pass through Spark expressions. FNV-1a is vectorized over
# the Arrow string buffers: one NumPy pass per byte position (doc ids are
# short), never per row.

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64(col) -> np.ndarray:
    """Vectorized FNV-1a 64 over a pyarrow string/binary Array or
    ChunkedArray; returns uint64 per row (nulls hash as empty)."""
    import pyarrow as pa

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    if not chunks:
        return np.empty(0, np.uint64)
    outs = []
    with np.errstate(over="ignore"):
        for chunk in chunks:
            arr = chunk.cast(pa.large_binary())
            n = len(arr)
            if n == 0:
                outs.append(np.empty(0, np.uint64))
                continue
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + n + 1
            ]
            vals = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            h = np.full(n, _FNV_OFFSET, np.uint64)
            lens = offs[1:] - offs[:-1]
            starts = offs[:-1]
            for i in range(int(lens.max()) if n else 0):
                mask = lens > i
                hm = h[mask]
                hm = (hm ^ vals[starts[mask] + i]) * _FNV_PRIME
                h[mask] = hm
            outs.append(h)
    return np.concatenate(outs) if len(outs) != 1 else outs[0]


def native_cluster_key(
    mode: str,
    numeric: np.ndarray,
    dim_hashes: list[np.ndarray],
    lo: float,
    hi: float,
) -> np.ndarray:
    """Clustering key from NumPy inputs (same curve kernels as the UDF path):
    ``dim_hashes`` are uint64 hashes of the non-partition string dims."""
    if mode == "zorder" and len(dim_hashes) == 2:
        a = _to_bits(numeric, lo, hi, 21)
        return morton3(a, dim_hashes[0] >> _U(43), dim_hashes[1] >> _U(43)).astype(np.int64)
    if mode == "zorder":
        a = _to_bits(numeric, lo, hi, 31)
        return morton2(a, dim_hashes[0] >> _U(33)).astype(np.int64)
    if mode == "hilbert":
        a = _to_bits(numeric, lo, hi, 31)
        return hilbert2(a, dim_hashes[0] >> _U(33), order=31).astype(np.int64)
    raise ValueError(f"unknown clustering mode {mode!r}")


def cluster_key_column(
    mode: str,
    numeric_col: str,
    hash_cols: list[str],
    lo: float,
    hi: float,
    impl: str = "jvm",
) -> Column:
    """Build the clustering-key Column. ``impl='jvm'`` (default) keeps the
    whole key inside codegen; ``impl='arrow'`` routes the bit interleave
    through the vectorized NumPy pandas UDFs (bit-identical, tested)."""
    if mode == "zorder" and impl == "jvm":
        if len(hash_cols) == 2:
            return zkey3_sql(numeric_col, F.xxhash64(hash_cols[0]), F.xxhash64(hash_cols[1]), lo, hi)
        return zkey2_sql(numeric_col, F.xxhash64(hash_cols[0]), lo, hi)
    if mode == "zorder" and len(hash_cols) == 2:
        return zkey3_udf(lo, hi)(
            F.col(numeric_col), F.xxhash64(hash_cols[0]), F.xxhash64(hash_cols[1])
        )
    if mode == "zorder":
        return zkey2_udf(lo, hi)(F.col(numeric_col), F.xxhash64(hash_cols[0]))
    if mode == "hilbert":
        return hkey2_udf(lo, hi)(F.col(numeric_col), F.xxhash64(hash_cols[0]))
    raise ValueError(f"unknown clustering mode {mode!r}")

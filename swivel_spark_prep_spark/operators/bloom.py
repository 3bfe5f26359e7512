"""Bloom-filter runtime pre-filtering for semi joins — the pattern
Spark's own InjectRuntimeFilter applies to shuffle joins (and Bloom-join
literature long before it), exposed as an operator so a pipeline can use
it where the optimizer can't see the opportunity (e.g. the filter side
is an arbitrary computed DataFrame, or the join is performed in a later
stage/job than the filter build).

Why: a semi join against a build side that is too large to broadcast
exactly still shuffles EVERY probe-side row. A Bloom filter of the build
keys is a few MB regardless of build-side row width, broadcasts to every
executor, and discards most non-matching probe rows BEFORE the shuffle —
at 100 TB that's the difference between shuffling the full probe table
and shuffling ~the matching fraction (plus the false-positive rate,
p ≈ (1 - e^{-kn/m})^k).

Build is fully distributed: each key expands to ``n_hashes`` bit
positions (xxhash64 with distinct seeds — JVM-side), positions aggregate
into a bitmap of ``m/64`` longs via ``bit_or`` (map-side partial
aggregation makes the shuffle ≤ partitions × m/64 rows). The bitmap —
the only driver materialization, m bits regardless of build size — ships
back into the probe scan as a single array Literal tested by pure
codegen expressions (xxhash64 + bit ops — no Python in the probe path).
The final join stays EXACT: survivors still pass through a real
``left_semi`` (the Bloom filter only prunes, it never decides).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_bloom(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> np.ndarray:
    """Distributed Bloom-filter build over ``keys[key_col]`` → a numpy
    uint64 bitmap of ``n_bits`` bits (must be a power of two; the
    default 8 Mbit = 1 MB holds ~1M keys at ~3% FP with 5 hashes).
    The only collect is the bitmap itself (≤ n_bits/64 rows)."""
    if n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two, got {n_bits}")
    mask = n_bits - 1
    k = F.col(key_col).cast("string")
    pos = F.array(
        *[
            (F.xxhash64(k, F.lit(i)).bitwiseAND(F.lit(mask))).alias(f"p{i}")
            for i in range(n_hashes)
        ]
    )
    # Arrow fetch, not collect(): the word relation is up to n_bits/64
    # rows (131k at the default size) and row-based collect() pays a
    # per-row pickle on exactly the op's critical path — the columnar
    # transfer + one vectorized scatter is the same bytes at a fraction
    # of the driver cost (guide §6, Arrow for driver transfers).
    words = (
        keys.select(F.explode(pos).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            # call_function: the SQL shiftleft accepts an expression for
            # numBits (the Python F.shiftleft wrapper only takes an int)
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .toArrow()
    )
    bitmap = np.zeros(n_bits // 64, dtype=np.uint64)
    w = words.column("w").to_numpy(zero_copy_only=False)
    # .view, not astype: reinterpret the int64 bit pattern exactly —
    # the same mod-2^64 wrap the row path computed arithmetically
    bits = words.column("bits").to_numpy(zero_copy_only=False).view(np.uint64)
    bitmap[w] = bits
    return bitmap


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> DataFrame:
    """``probe LEFT SEMI JOIN build ON key_col`` with a Bloom pre-filter:
    probe rows failing the broadcast bitmap test never reach the shuffle.
    Result is exactly the plain semi join (oracle-checked as X73); the
    filter's no-false-negative guarantee is what makes that safe, and is
    property-tested. The predicate must hash exactly like the build:
    same cast-to-string, same xxhash64 seeds — both sides pin that by
    sharing this module's constants."""
    bitmap = build_bloom(build, key_col, n_bits, n_hashes)
    mask = n_bits - 1

    # JVM-side membership test: recompute the same xxhash64 positions as
    # expressions and test the bitmap via a single array Literal (one
    # Literal node holding n_bits/64 longs — 1 MB of plan data at the
    # default size, shipped once per executor with the task binary).
    # Keeping the test in codegen avoids shipping a Python xxhash64
    # reimplementation and keeps the probe scan UDF-free.
    bits_lit = F.lit(bitmap.astype(np.int64).tolist())
    k = F.col(key_col).cast("string")
    tests = [
        (
            F.element_at(
                bits_lit,
                ((F.xxhash64(k, F.lit(i)).bitwiseAND(F.lit(mask))) / 64).cast("int")
                + 1,
            ).bitwiseAND(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.xxhash64(k, F.lit(i)).bitwiseAND(F.lit(mask)) % 64).cast(
                        "int"
                    ),
                )
            )
            != 0
        )
        for i in range(n_hashes)
    ]
    might = tests[0]
    for t in tests[1:]:
        might = might & t
    pre = probe.filter(might)
    # no distinct(): a semi join's output is identical with duplicate
    # build keys, and deduplicating the build side would add the full
    # shuffle this operator exists to avoid
    return pre.join(build.select(key_col), key_col, "left_semi")

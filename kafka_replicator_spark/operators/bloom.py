"""Bloom-prefiltered semi join — shuffle reduction for big-dim semi joins.

A broadcast semi join needs the dim's key set in memory; a shuffle semi
join moves every fact row.  Between them sits the bloom prefilter: the dim
keys fold into an m-bit filter (k portable-hash bit positions per key,
OR-aggregated into 64-bit blocks — one groupBy of |dim| rows into m/64
blocks), the filter travels to the fact side as a plan literal, and a pure
column expression drops most non-matching fact rows BEFORE the exact semi
join.  No false negatives (every dim key's bits are set), so the final
exact join sees all true matches and kills the false positives — the
result is bit-identical to the plain semi join, only the shuffled volume
changes.  Spark's AQE runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies the same idea
automatically when statistics allow; this operator is the explicit,
plannable form.

Sizing: with k=4 hashes, m ≈ 10 bits/key gives ~2% false positives; the
filter is m/8 bytes regardless of key width (a 100M-key dim → ~128 MB raw
keys vs ~16 MB of blocks at m=2^27).  The block table is metadata-scale
and is collected driver-side like the reference's controller state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.hashing import (
    hash_family_col,
    hash_family_params,
)
from kafka_replicator_spark.functions.litfast import lit_longs

#: default geometry: 2^16 bits (1024 int64 blocks), 4 hash positions
BLOOM_M_BITS = 1 << 16
BLOOM_K = 4


def _positions(key_col, k: int, m_bits: int):
    # xxhash64, NOT the portable md5 hash: bit positions never reach the
    # oracle compare (false positives die in the exact join), so the only
    # requirement is that build and probe agree — and xxhash64 is pure JVM
    # codegen, removing the md5-per-fact-row tax from the probe side.
    h32 = F.pmod(F.xxhash64(key_col.cast("string")), F.lit(4294967296))
    return [hash_family_col(h32, a, b) % F.lit(m_bits) for a, b in hash_family_params(k)]


def bloom_build(dim: DataFrame, key_col: str, k: int = BLOOM_K, m_bits: int = BLOOM_M_BITS) -> list[int]:
    """Fold the dim's keys into m/64 OR-aggregated blocks (dense list)."""
    pos = F.explode(F.array(*_positions(F.col(key_col), k, m_bits))).alias("p")
    blocks = (
        dim.select(pos)
        .select((F.col("p") / 64).cast("long").alias("blk"), F.call_function("shiftleft", F.lit(1).cast("long"), (F.col("p") % 64).cast("int")).alias("m"))
        .groupBy("blk")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in blocks:
        dense[r["blk"]] = r["bits"]
    return dense


def bloom_might_contain(key_col, blocks: list[int], k: int = BLOOM_K, m_bits: int = BLOOM_M_BITS):
    """Pure column predicate: all k bit positions set in the block literal."""
    # litfast: F.lit of the 1024-long block list cost ~1 s of driver time
    # per call (element-wise py4j); the SQL rendering is one gateway call
    # with identical values (r13 optimization, see functions/litfast.py)
    arr = lit_longs(blocks)
    checks = [
        F.element_at(arr, ((p / 64).cast("long") + 1).cast("int")).bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        )
        != 0
        for p in _positions(key_col, k, m_bits)
    ]
    return reduce(lambda a, b: a & b, checks)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """``fact LEFT SEMI JOIN dim`` with a bloom prefilter on the fact side.

    Exact result (false positives are removed by the final semi join); the
    prefilter cuts the fact rows entering the shuffle by ~(1 - selectivity
    - fp_rate).
    """
    blocks = bloom_build(dim, dim_key, k, m_bits)
    pruned = fact.filter(bloom_might_contain(F.col(fact_key), blocks, k, m_bits))
    # NB: both sides hash the string rendering of the key (see _positions)
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates(),
        on=fact_key,
        how="left_semi",
    )

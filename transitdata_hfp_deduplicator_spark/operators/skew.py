"""Skew-handling join strategies for the 100 TB posture.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions.  ``salted_join``
is the explicit fallback for the case AQE can't fix: a single join KEY
so hot that one key's rows exceed an executor (AQE splits partitions,
not keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[tuple[str, str]],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the big side gets a random-ish salt
    (deterministic: hash of all columns mod buckets), the small side is
    EXPLODED once per salt value, and the join key becomes
    (key, salt) — a hot key's rows now spread over ``salt_buckets``
    shuffle partitions instead of one.

    Cost model: small side is replicated ``salt_buckets``x — use only
    when the small side is genuinely small and a specific key is
    hotter than an executor.  Result is identical to the plain join.
    """
    big_keys = [b for b, _ in on]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    cond = big_s["__salt"] == small_s["__salt"]
    for b, s in on:
        cond = cond & (big_s[b] == small_s[s])
    return big_s.join(small_s, cond, how).drop("__salt")

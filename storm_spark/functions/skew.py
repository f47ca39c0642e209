"""Skew-handling utilities: salted two-phase aggregation and salted joins.

Spark already neutralizes most skew: decomposable aggregates partial-combine
map-side before the shuffle, and AQE splits oversized sort-merge join
partitions at runtime. These helpers are the explicit overrides for the
cases that remain:

- :func:`replicated_join` — a hot join key that AQE can't split (broadcast
  ineligible, stream-static joins, bucketed inputs): salt the big side and
  replicate the small side across the salt domain, so one hot key fans out
  over ``salt`` co-located tasks.
- :func:`salted_aggregate` — aggregation pipelines whose reduce state is too
  heavy to funnel hot keys into one reducer (large collect-style state, or a
  final shuffle dominated by a handful of keys): spread each key over
  ``salt`` sub-keys, then merge the partials.

Salts are ``rand(seed)``-derived: deterministic given the input partitioning,
uniform within a partition, and correctness never depends on the assignment —
the merge phase is assignment-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregates with a (partial, merge) decomposition usable under salting:
#: name -> (partial expr fn, merge expr fn)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "collect_list": (F.collect_list, lambda c: F.flatten(F.collect_list(c))),
    "collect_set": (F.collect_set, lambda c: F.array_distinct(F.flatten(F.collect_list(c)))),
}


def _salt(salt: int, seed: int = 42):
    return (F.rand(seed) * salt).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt on the group key.

    ``aggs`` maps output column name -> (agg name, input column), where agg
    name is one of ``sum/count/min/max/collect_list/collect_set`` (avg etc.
    compose from sum+count). Phase 1 groups by (keys..., salt) — a hot key
    spreads over ``salt`` reducers; phase 2 merges the ``salt`` partials per
    key. Result equals ``df.groupBy(keys).agg(...)`` for any input (list
    order within collect_list is partition-dependent in both forms).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"{fn!r} is not salt-decomposable: {sorted(_MERGEABLE)}")
    partial_exprs = [
        _MERGEABLE[fn][0](F.col(col)).alias(f"__p_{name}__")
        for name, (fn, col) in aggs.items()
    ]
    partial = df.withColumn("__salt__", _salt(salt)).groupBy(*keys, "__salt__").agg(*partial_exprs)
    merge_exprs = [
        _MERGEABLE[fn][1](F.col(f"__p_{name}__")).alias(name) for name, (fn, _c) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*merge_exprs)


def replicated_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys: salt the big side's rows
    into ``salt`` sub-keys and replicate every small-side row across the full
    salt domain, so one hot key becomes ``salt`` co-located tasks.

    Semantically identical to ``big.join(small, on, how)`` for inner/left
    joins. Cost: the small side shuffles ``salt``× — use only when the big
    side's skew dominates.
    """
    if how not in ("inner", "left"):
        raise ValueError("replicated_join supports inner/left joins")
    big_s = big.withColumn("__salt__", _salt(salt))
    small_s = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, on + ["__salt__"], how).drop("__salt__")


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    how: str = "inner",
    bits_per_key: int = 12,
    n_hashes: int = 5,
) -> DataFrame:
    """Join after pruning the big side with a Bloom filter built from the
    small side's keys — result-identical to the plain join (false positives
    only let extra rows REACH the exact join, never through it), but the big
    side's shuffle carries just the rows that can match.

    The 100 TB case: joining a huge fact table against a filtered dimension
    too selective for the planner to see — the bloom (~1.5 bytes/key at 12
    bits/key, fp ≈ 0.3%) rides into the scan stage and drops the fact-side
    shuffle from |fact| to ~|matching|. Spark's own runtime bloom injection
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default) does
    this automatically for eligible equi-joins; this verb is the explicit
    override for shapes the rule skips (stream-static joins, pre-filtered
    dims behind non-pushable predicates, bucketed scans).

    Implementation is expression-only on the probe side: k = ``n_hashes``
    bit positions per key via seeded ``xxhash64`` double-hashing; the build
    side's DISTINCT positions collect once to the driver (bounded by the
    bitmap size, not the key count) into a BINARY bitmap embedded as a plan
    literal, and membership tests are byte-slice + ``getbit`` — no Python,
    no extra shuffle, fully codegen'd. Driver memory bounds this at ~1M-key
    filters (~2 MB literal); past that, rely on the native injection rule.

    Only ``inner`` and ``left_semi`` joins can prune the big side safely
    (outer joins must keep non-matching rows).
    """
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError("bloom pruning only applies to inner/left_semi joins")
    small_key = small_key or big_key
    # the build side runs two actions (count, positions) before the join —
    # persist so an expensive dim subtree computes once, not three times
    small = small.persist()
    n = small.count() or 1
    m = max(((n * bits_per_key + 63) // 64) * 64, 1024)  # bits, 64-aligned

    def positions(col):
        # double hashing: pos_i = (h1 + i*h2) mod m; reduce each hash mod m
        # FIRST so the combination never overflows long under ANSI mode.
        # Keys hash AS STRINGS: xxhash64 is type-sensitive (int 5 and bigint
        # 5 hash differently), so mixed-width key columns that the exact
        # join would coerce and match must hash identically here too.
        c = col.cast("string")
        h1 = F.pmod(F.xxhash64(c, F.lit(1)), F.lit(m))
        h2 = F.pmod(F.xxhash64(c, F.lit(2)), F.lit(m))
        return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(n_hashes)]

    try:
        pos_rows = (
            small.select(F.explode(F.array(*positions(F.col(small_key)))).alias("p"))
            .distinct()
            .collect()
        )
    finally:
        # the bitmap is now a literal; the returned join can recompute the
        # small side, so don't leak cache in long-lived sessions
        small.unpersist()
    # Pack the bitmap into a BINARY literal: ONE py4j call regardless of
    # size. (The previous long[]-array F.lit walked py4j per element —
    # ~0.8 ms each, so the documented ~1M-key bound would have spent ~1 min
    # just SHIPPING the literal; bytes cross in a single call.) Bit p lives
    # at byte p//8, LSB-first.
    buf = bytearray(m // 8)
    for r in pos_rows:
        p = r["p"]
        buf[p // 8] |= 1 << (p % 8)
    bitmap = F.lit(bytes(buf))

    def might_contain(col):
        cond = None
        for p in positions(col):
            # 1-byte binary slice -> hex pair -> int; all codegen'd
            byte = F.conv(
                F.hex(bitmap.substr((p / 8).cast("int") + 1, F.lit(1))), 16, 10
            ).cast("int")
            bit = F.call_function("getbit", byte, (p % 8).cast("int")) == 1
            cond = bit if cond is None else cond & bit
        return cond

    pruned = big.filter(might_contain(F.col(big_key)))
    resolved = "left_semi" if how in ("left_semi", "semi") else how
    if big_key == small_key:
        # on=[key] merges the key column — same shape as the plain join
        return pruned.join(small, on=[big_key], how=resolved)
    return pruned.join(small, pruned[big_key] == small[small_key], resolved)

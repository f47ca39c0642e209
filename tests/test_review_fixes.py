"""Regression tests for the round-2 code-review findings (core engine)."""

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from storm_spark.operations import Count, SnapshotGet, Sum
from storm_spark.state import MemoryMapState
from storm_spark.state.base import StateType
from storm_spark.topology import FeederSource, LocalCluster, Topology


def _mk_memory(state_type=StateType.OPAQUE):
    return MemoryMapState(
        StructType().add("k", "string"), "count", "bigint", state_type
    )


def test_global_persistent_aggregate_three_arg_overload(spark):
    """The documented (state_factory, agg, out_fields) overload — previously
    remapped on the wrong sentinel and crashed."""
    topo = Topology(spark)
    feeder = FeederSource(["word"])
    total = topo.new_stream("w", feeder).persistent_aggregate(
        MemoryMapState.factory(), Count(), ["count"]
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["a"], ["b"], ["a"]])
    snap = total.state.multi_get([(0,)])
    assert snap == [3]


def test_snapshot_get_on_empty_state_emits_null(spark):
    """SnapshotGet before any batch: the reference emits the null snapshot
    value, not zero rows."""
    topo = Topology(spark)
    feeder = FeederSource(["x"], ["bigint"])
    total = topo.new_stream("t", feeder).persistent_aggregate(
        MemoryMapState.factory(), ["x"], Sum("bigint"), ["total"]
    )
    topo.new_drpc_stream("gettotal").state_query(total, None, SnapshotGet(), ["total"])
    cluster = LocalCluster(topo)
    assert cluster.execute_drpc("gettotal", "ignored") == [["ignored", None]]
    cluster.feed(feeder, [[2], [3]])
    assert cluster.execute_drpc("gettotal", "ignored") == [["ignored", 5]]


def test_new_values_stream_empty_after_empty_batch(spark):
    """An empty batch must reset the touched-key set — new_values_stream
    reports the MOST RECENT batch's updates, which are none."""
    topo = Topology(spark)
    feeder = FeederSource(["word"])
    wc = (
        topo.new_stream("w", feeder)
        .group_by(["word"])
        .persistent_aggregate(MemoryMapState.factory(), ["word"], Count(), ["count"])
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [["a"], ["b"]])
    assert wc.new_values_stream().df.count() == 2
    cluster.feed(feeder, [])
    assert wc.new_values_stream().df.count() == 0


def test_memory_multi_put_replay_preserves_original_prev():
    """multi_put on a replayed txid must keep the PRE-BATCH prev, not the
    prior attempt's own write, and must register the key as batch-updated."""
    st = _mk_memory()
    st.begin_commit(1)
    st.multi_put([("k",)], [10])
    st.commit(1)
    st.begin_commit(2)
    st.multi_put([("k",)], [20])
    st.commit(2)
    # replay txid 2 (crash before commit landed downstream)
    st.begin_commit(2)
    st.multi_put([("k",)], [25])
    # the replay's prev must still be txid 1's value...
    assert st._map[("k",)].prev == 10
    # ...and the put registered as batch-updated: reads see the new value
    assert st.multi_get([("k",)]) == [25]
    st.commit(2)


def test_legacy_partition_persist_reordered_in_fields(spark):
    """Legacy StateUpdater tuples index by spec.in_fields order, not the
    stream's column order — by-name access must return the right values."""
    captured = []

    class Capture:
        def __call__(self, state, tuples, collector):
            for t in tuples:
                captured.append((t["b"], t["a"]))

    topo = Topology(spark)
    feeder = FeederSource(["a", "b", "c"], ["bigint", "string", "bigint"])
    topo.new_stream("s", feeder).partition_persist(
        MemoryMapState.factory(), ["b", "a"], Capture()
    )
    cluster = LocalCluster(topo)
    cluster.feed(feeder, [[1, "x", 9], [2, "y", 8]])
    assert sorted(captured) == [("x", 1), ("y", 2)]


def test_multi_reduce_grouped_reordered_keys(spark):
    """Grouped multiReduce with grouping keys NOT in the stream's natural
    column order: key columns must come out correctly typed and valued."""
    class SumBoth:
        out_types = ["bigint"]

        def init(self, collector):
            return {"sum": 0}

        def execute(self, state, stream_index, tup, collector):
            state["sum"] += tup["v"]

        def complete(self, state, collector):
            collector.emit([state["sum"]])

    topo = Topology(spark)
    a = topo.new_stream(
        "a", spark.createDataFrame([(1, "x", 10), (2, "y", 20)], "v int, g string, h int")
    )
    b = topo.new_stream(
        "b", spark.createDataFrame([(5, "x", 10)], "v int, g string, h int")
    )
    # TWO grouping keys in the REVERSE of the streams' column order (h, g):
    # the key schema must follow the grouping order, or the int/string
    # columns come out swapped (Arrow type error / corrupted keys)
    out = topo.multi_reduce(
        [a.group_by(["h", "g"]), b.group_by(["h", "g"])], SumBoth(), ["h", "g", "total"]
    )
    got = sorted(map(tuple, out.df.collect()))
    assert got == [(10, "x", 6), (20, "y", 2)]


def test_rollup_count_rolls_up_by_summing(spark, tmp_path):
    """Coarse recompute of a Count rollup must SUM the fine counts, not
    count the fine rows (count-of-counts was silently wrong)."""
    from storm_spark.operations import Count
    from storm_spark.plans.rollup import ContinuousRollup
    from storm_spark.state import ParquetMapState

    def factory(name, key_schema, value_field, value_type):
        return ParquetMapState(
            spark, str(tmp_path / name), key_schema, value_field, value_type
        )

    r = ContinuousRollup(
        spark,
        factory,
        keys=["k"],
        ts_col="ts",
        value_expr=F.lit(1),
        fine_bucket=lambda ts: (ts / 3600).cast("long"),
        coarse_bucket_of_fine=lambda fb: (fb / 24).cast("long"),
        agg=Count(),
        fine_range_of_coarse=lambda cb: (cb * 24, cb * 24 + 23),
    )
    # 3 events in hour 0, 2 in hour 1 — same day
    df = spark.createDataFrame(
        [("a", 100), ("a", 200), ("a", 300), ("a", 3700), ("a", 3800)],
        "k string, ts bigint",
    )
    r.process_epoch(df, txid=1)
    coarse = {(x["coarse_bucket"], x["k"]): x["value"] for x in r.coarse().collect()}
    assert coarse == {(0, "a"): 5}  # count-of-counts would report 2


def test_rollup_composite_agg_requires_coarse_from_fine(spark, tmp_path):
    from storm_spark.operations import Avg
    from storm_spark.plans.rollup import ContinuousRollup
    from storm_spark.state import ParquetMapState
    import pytest as _pytest

    def factory(name, key_schema, value_field, value_type):
        return ParquetMapState(
            spark, str(tmp_path / name), key_schema, value_field, value_type
        )

    with _pytest.raises(ValueError, match="coarse_from_fine"):
        ContinuousRollup(
            spark, factory, keys=["k"], ts_col="ts", value_expr=F.col("v"),
            fine_bucket=lambda ts: (ts / 3600).cast("long"),
            coarse_bucket_of_fine=lambda fb: (fb / 24).cast("long"),
            agg=Avg(),
        )


def test_asof_join_null_timestamps_pad_not_crash(spark):
    """Null-ts left rows pad null right columns (matching asof_join_ranked);
    null-ts right rows are unmatchable. Previously: merge_asof ValueError."""
    from storm_spark.functions.temporal import asof_join

    left = spark.createDataFrame(
        [("a", 10, 1), ("a", None, 2)], "k string, ts bigint, lv int"
    )
    right = spark.createDataFrame(
        [("a", 5, 100), ("a", None, 999)], "k string, rts bigint, rv int"
    )
    got = {r.lv: (r.rts, r.rv) for r in asof_join(left, right, "k", "ts", "rts").collect()}
    assert got == {1: (5, 100), 2: (None, None)}


def test_asof_join_rejects_colliding_columns(spark):
    """A shared non-key column would silently carry LEFT values under the
    right column's name; refuse instead."""
    import pytest as _pytest

    from storm_spark.functions.temporal import asof_join

    left = spark.createDataFrame([("a", 10, 1)], "k string, ts bigint, price int")
    right = spark.createDataFrame([("a", 5, 2)], "k string, rts bigint, price int")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "ts", "rts")


def test_range_join_inverted_interval_emits_nothing(spark):
    """end <= start (bad data) must yield zero buckets, not a descending
    sequence exploding thousands of rows."""
    from storm_spark.functions.temporal import range_join

    pts = spark.createDataFrame([(50,)], "ts bigint")
    iv = spark.createDataFrame(
        [(1700000000, 0), (40, 60)], "s bigint, e bigint"
    )
    out = range_join(pts, iv, "ts", "s", "e", bucket_seconds=86400).collect()
    assert [(r.s, r.e) for r in out] == [(40, 60)]


def test_cms_estimate_reads_stamped_params(spark):
    """cms_estimate must probe with the BUILD's depth/width (stamped on the
    sketch); defaults that disagree silently break the >=-true guarantee."""
    from storm_spark.functions.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, "k string")
    sk = cms_build(df, "k", depth=3, width=1024)
    est = {r.k: r.est for r in cms_estimate(sk, df.distinct(), "k").collect()}
    assert est["a"] >= 7 and est["b"] >= 3


def test_partitioned_source_corrupt_hwm_raises(spark, tmp_path):
    """A corrupt high-water-mark file must raise, not silently reset every
    partition's offsets to zero."""
    import pytest as _pytest

    from storm_spark.io.sources import PartitionedOffsetSource

    src = PartitionedOffsetSource(spark, str(tmp_path), n_partitions=2)
    src.produce(0, 5)
    with open(src._hwm_path(), "w") as f:
        f.write("{not json")
    with _pytest.raises(ValueError):
        src._hwm()


def test_cosine_paths_survive_zero_vectors(spark):
    """An all-zeros embedding (padding/failed-embed row) must score ~0, not
    throw DIVIDE_BY_ZERO under ANSI or surface as a NaN rank-1 neighbor."""
    from storm_spark.functions import similarity

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = similarity.cosine_topk(df, df.filter("vec_id = 1"), k=2).collect()
    ranked = [(r.rank, r.neighbor_id) for r in sorted(got, key=lambda r: r.rank)]
    # the zero vector ranks LAST (cos 0), never first
    assert ranked == [(1, 2), (2, 3)]


def test_bloom_join_mixed_key_widths(spark):
    """int vs bigint key columns: the exact join coerces and matches, so the
    bloom must too (xxhash64 is type-sensitive — keys hash as strings)."""
    from storm_spark.functions.skew import bloom_pruned_join

    big = spark.createDataFrame([(5, "x"), (6, "y")], "k bigint, v string")
    small = spark.createDataFrame([(5,)], "sk int")
    got = bloom_pruned_join(big, small, "k", "sk").collect()
    assert [(r.k, r.v) for r in got] == [(5, "x")]


def test_simhash_rejects_zero_width_blocks(spark):
    from storm_spark.functions import dedup
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="blocks"):
        dedup.simhash_near_pairs(df, "doc_id", "text", bits=4, max_hamming=5)


def test_multimodal_null_content_rows(spark):
    """NULL binary cells decode as empty assets, not task-killing TypeErrors."""
    from storm_spark.functions import multimodal

    df = spark.createDataFrame(
        [(1, bytes(range(64))), (2, None)], "doc_id bigint, content binary"
    )
    imgs = multimodal.image_features(df, "content", "doc_id").collect()
    assert {r.doc_id for r in imgs} == {1, 2}
    auds = multimodal.audio_features(df, "content", "doc_id").collect()
    assert {r.doc_id for r in auds} == {1, 2}


def test_bounded_persist_one_live_cache_per_tag(spark):
    """Each call releases the previous cache under the same tag; the
    registry lives on the session (GC'd with it), never module-level."""
    from storm_spark.session import bounded_persist

    a = bounded_persist(spark.range(5), "review_fix_probe")
    assert a.storageLevel.useMemory
    b = bounded_persist(spark.range(6), "review_fix_probe")
    assert not a.storageLevel.useMemory  # previous cache released
    assert b.storageLevel.useMemory
    assert "review_fix_probe" in spark._storm_bounded_caches
    b.unpersist()
    spark._storm_bounded_caches.pop("review_fix_probe", None)


def test_fuzzy_pairs_thresholded_levenshtein_same_results(spark):
    """The banded (thresholded) levenshtein path returns the same pairs
    and distances as an unbounded computation filtered afterwards."""
    from pyspark.sql import functions as F

    from storm_spark.functions.dedup import fuzzy_pairs

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jmups over the lazy dog"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "totally unrelated text that shares no prefix"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_pairs(df, "doc_id", "text", max_dist=5).collect()}
    # brute-force check on the same normalized 40-char snippets
    import itertools

    snips = {i: " ".join(t.lower().split())[:40] for i, t in docs}
    exp = {}
    for x, y in itertools.combinations(sorted(snips), 2):
        if snips[x][:8] == snips[y][:8]:
            d = spark.createDataFrame([(snips[x], snips[y])], "a string, b string") \
                .select(F.levenshtein("a", "b").alias("d")).collect()[0].d
            if d <= 5:
                exp[(x, y)] = d
    assert got == exp

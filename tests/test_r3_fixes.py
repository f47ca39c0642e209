"""Round-3 regression tests for the ADVICE.md findings.

1-2. Zero-norm embeddings reach the bucket-join cosine in ``lsh_bucket_topk``
     and ``embedding_near_dup_pairs`` (two all-zeros vectors collide in EVERY
     signature table — sign(0·plane) is constant) and must score ~0, not
     throw DIVIDE_BY_ZERO under Spark 4's default ANSI mode.
3.   ``ngram_jaccard_pairs`` warns once when silently relying on the capped
     production default.
4.   ``bloom_pruned_join`` must not leak cache: the build side unpersists
     after the positions collect.
5.   A multi-stream bolt executes ONCE per ``complete_topology`` run — its
     named output streams are mutually consistent even when the bolt is
     stateful/nondeterministic (reference: one bolt execution feeds all
     declared streams).
"""

import warnings

import pytest


def test_lsh_bucket_topk_survives_zero_vectors(spark):
    from storm_spark.functions import similarity

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 0.0]),  # zero-norm: collides with every other zero vector
        (4, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = similarity.lsh_bucket_topk(df, df, k=4, dim=2)
    rows_out = got.collect()  # must not raise DIVIDE_BY_ZERO
    by_q = {}
    for r in rows_out:
        by_q.setdefault(r.query_id, {})[r.neighbor_id] = r.cos_sim
    # the two zero vectors meet in every table; their similarity is ~0
    assert by_q.get(3, {}).get(4, 0.0) == pytest.approx(0.0, abs=1e-6)


def test_embedding_near_dup_survives_zero_vectors(spark):
    from storm_spark.functions import similarity

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.001]),
        (3, [0.0, 0.0]),
        (4, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = similarity.embedding_near_dup_pairs(df, threshold=0.95, dim=2).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (1, 2) in pairs  # the genuine near-dup survives
    assert (3, 4) not in pairs  # zero-vectors score ~0, below threshold


def test_jaccard_default_cap_warns_once(spark):
    from storm_spark.functions import dedup

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id bigint, text string",
    )
    dedup._warned_default_cap = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=2).collect()
        assert any("max_shingle_df" in str(x.message) for x in w)
    # explicit cap (or None): silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=2, max_shingle_df=None).collect()
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=2, max_shingle_df=1000).collect()
        assert not [x for x in w if "max_shingle_df" in str(x.message)]


def test_bloom_join_unpersists_build_side(spark):
    from pyspark import StorageLevel

    from storm_spark.functions.skew import bloom_pruned_join

    big = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k bigint, v string")
    small = spark.createDataFrame([(1,), (3,)], "k bigint")
    got = bloom_pruned_join(big, small, "k")
    assert sorted(r.k for r in got.collect()) == [1, 3]
    # no cache leaked: the build side is back to NONE storage
    assert small.storageLevel == StorageLevel.NONE


def test_multistream_bolt_executes_once(spark):
    """A stateful bolt tagging rows with an execution-local counter must
    produce consistent named streams: stream 'evens' and 'odds' partition
    one run's sequence numbers exactly (re-execution would restart the
    counter per stream and double-count)."""
    from storm_spark.builder import BasicBolt, TopologyBuilder, complete_topology
    from storm_spark.topology import Topology

    class SeqBolt(BasicBolt):
        def declare_streams(self):
            return {
                "evens": (["word", "seq"], ["string", "bigint"]),
                "odds": (["word", "seq"], ["string", "bigint"]),
            }

        def prepare(self):
            self._n = 0

        def execute(self, tup, collector):
            sid = "evens" if self._n % 2 == 0 else "odds"
            collector.emit(sid, [tup.get_string(0), self._n])
            self._n += 1

    topo = Topology(spark)
    builder = TopologyBuilder(topo)
    rows = [["a"], ["b"], ["c"], ["d"], ["e"], ["f"]]
    df = spark.createDataFrame([tuple(r) for r in rows], "word string")
    builder.set_spout("words", df.coalesce(1))
    builder.set_bolt("seq", SeqBolt()).global_grouping("words")
    out = complete_topology(builder)
    seqs = sorted(
        [t[1] for t in out["seq:evens"]] + [t[1] for t in out["seq:odds"]]
    )
    # one execution: the union of both streams is exactly one 0..5 sequence
    assert seqs == [0, 1, 2, 3, 4, 5]
    assert all(s % 2 == 0 for _, s in out["seq:evens"])
    assert all(s % 2 == 1 for _, s in out["seq:odds"])

#!/usr/bin/env python3
"""Round-14 phase profiler: times each lifecycle phase of the dedup index
gates and A/Bs star-emission shapes, with per-phase Spark job counts.

Usage: python tools/r14_phase_profile.py [delete|stars|emission] ...
"""
from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from storm_spark.session import get_spark  # noqa: E402
from storm_spark.functions import dedup  # noqa: E402
from storm_spark.queries import _t, gate_tmp  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _job_count(spark):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    return max([*tracker.getJobIdsForGroup(None), -1]) + 1


class Phase:
    def __init__(self, spark):
        self.spark = spark
        self.rows = []

    def run(self, name, fn):
        j0 = _job_count(self.spark)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        j1 = _job_count(self.spark)
        self.rows.append((name, dt, j1 - j0))
        print(f"  {name:28s} {dt:7.3f}s  jobs +{j1 - j0}")
        return out

    def total(self, label):
        print(
            f"  {'TOTAL ' + label:28s} {sum(r[1] for r in self.rows):7.3f}s  "
            f"jobs {sum(r[2] for r in self.rows)}"
        )
        self.rows = []


def profile_delete(spark):
    docs = _t(spark, SF_DIR, "documents").select("doc_id", "text")
    for rep in range(2):
        print(f"dedup_index_delete phases (rep {rep}):")
        ph = Phase(spark)
        table = "dixprof_idx_" + uuid.uuid4().hex[:8]
        idx = dedup.IncrementalLSHIndex(
            "doc_id", "text", n=3, num_perm=12, bands=4,
            index_table=table,
            index_path=os.path.join(
                gate_tmp.mkdtemp(prefix="storm_spark_dixprof_"), "idx"
            ),
            emit="edges",
        )
        half = F.pmod(F.col("doc_id"), F.lit(2))
        ph.run("add_docs epoch1", lambda: idx.add_docs(docs.filter(half == 0)))
        ph.run("add_docs epoch2", lambda: idx.add_docs(docs.filter(half == 1)))
        ph.run(
            "remove_docs",
            lambda: idx.remove_docs(
                docs.filter(F.pmod(F.col("doc_id"), F.lit(7)) == 3).select("doc_id")
            ),
        )
        ph.run("compact_index", idx.compact_index)
        out = ph.run(
            "cluster",
            lambda: dedup.near_dup_clusters(idx.pairs())
            .select(
                F.col("id").cast("bigint").alias("doc_id"),
                F.col("cluster_id").cast("bigint").alias("cluster_id"),
            )
            .localCheckpoint(),
        )
        ph.run(
            "noop sink", lambda: out.write.format("noop").mode("overwrite").save()
        )
        for t in (table, f"{table}__ids", f"{table}__g1", f"{table}__g1__ids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        ph.total("delete gate")
        spark.catalog.clearCache()


def profile_stars(spark):
    docs = _t(spark, SF_DIR, "documents")
    for rep in range(3):
        print(f"dedup_cluster_stars phases (rep {rep}):")
        ph = Phase(spark)
        edges = ph.run(
            "build edges (lazy)",
            lambda: dedup.minhash_lsh_edges(
                docs, "doc_id", "text", n=3, num_perm=12, bands=4
            ),
        )
        out = ph.run("near_dup_clusters", lambda: dedup.near_dup_clusters(edges))
        ph.run(
            "noop sink",
            lambda: out.select(
                F.col("id").cast("bigint").alias("doc_id"),
                F.col("cluster_id").cast("bigint").alias("cluster_id"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        ph.total("stars")
        spark.catalog.clearCache()


def profile_emission(spark):
    """A/B the raw emission shapes, noop-sunk, interleaved."""
    docs = _t(spark, SF_DIR, "documents")

    def mk(salt_threshold):
        return dedup.minhash_lsh_edges(
            docs, "doc_id", "text", n=3, num_perm=12, bands=4,
            salt_threshold=salt_threshold,
        )

    variants = {
        "auto(adaptive+persist)": lambda: mk("auto"),
        "none(plain star)": lambda: mk(None),
    }
    for rep in range(3):
        for name, fn in variants.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            print(f"  rep{rep} {name:26s} {dt:7.3f}s")
            spark.catalog.clearCache()


def profile_ann_update(spark):
    from storm_spark.functions import similarity

    emb = _t(spark, SF_DIR, "embeddings")
    for rep in range(2):
        print(f"ann_index_update phases (rep {rep}):")
        ph = Phase(spark)
        cbs = ph.run(
            "pq_codebooks",
            lambda: similarity.pq_codebooks(
                emb, "vec_id", "embedding", m=4, ksub=4, n_iters=1
            ),
        )
        cents = ph.run(
            "centroids",
            lambda: similarity._ivf_default_centroids(emb, "vec_id", "embedding", 4),
        )
        path = os.path.join(gate_tmp.mkdtemp(prefix="storm_spark_annprof_"), "idx")
        half = F.pmod(F.col("vec_id"), F.lit(2))
        idx_box = {}
        ph.run(
            "build(half)",
            lambda: idx_box.setdefault(
                "idx",
                similarity.IVFPQIndex(path, "vec_id", "embedding").build(
                    emb.filter(half == 0), m=4, ksub=4, n_lists=4,
                    centroids=cents, codebooks=cbs,
                ),
            ),
        )
        ph.run(
            "add_vectors(half)",
            lambda: idx_box["idx"].add_vectors(emb.filter(half == 1)),
        )
        out = ph.run(
            "search",
            lambda: idx_box["idx"].search(
                emb.filter(F.col("vec_id") < 20), k=5, n_probe=2, shortlist=20
            ),
        )
        ph.run(
            "noop sink", lambda: out.write.format("noop").mode("overwrite").save()
        )
        ph.total("ann_update")
        spark.catalog.clearCache()


def main():
    which = sys.argv[1:] or ["delete", "stars", "emission"]
    spark = get_spark("r14_phase_profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    if "delete" in which:
        profile_delete(spark)
    if "stars" in which:
        profile_stars(spark)
    if "emission" in which:
        profile_emission(spark)
    if "ann" in which:
        profile_ann_update(spark)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Hot-bucket epoch-cost harness (r10 — the measurement behind the
star-edge directive, VERDICT r9 #1): stream a deliberately degenerate
corpus — every epoch adds `--delta` docs whose text is the SAME
boilerplate page (one band bucket absorbs them all) plus `--delta`
normal docs — through IncrementalLSHIndex in BOTH emission modes and
record per-epoch wall time and emitted row count.

Expected shape: emit="pairs" emits ~delta x (stored hot members) rows in
epoch t (linear growth per epoch, QUADRATIC total — the crawl-scale
failure mode); emit="edges" stays ~flat at O(delta) rows per epoch with
an identical final clustering (asserted at the end against the pairs
run's connected components).

Usage::

    python tools/epochs_stars.py [--delta 500] [--epochs 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--delta", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args()

    from storm_spark.functions.dedup import IncrementalLSHIndex, near_dup_clusters
    from storm_spark.session import get_spark

    spark = get_spark("epochs_stars", cpus=32)
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    hot = "exactly the same boilerplate footer text on every crawled page"

    def batch(epoch: int):
        base = epoch * 2 * args.delta
        rows = [(base + i, hot) for i in range(args.delta)]
        rows += [
            (base + args.delta + i, f"unique document body {base + i} with its own words {base + i}")
            for i in range(args.delta)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    finals = {}
    for emit in ("pairs", "edges"):
        idx = IncrementalLSHIndex(
            "doc_id", "text", n=3, num_perm=12, bands=4,
            emit=emit, enforce_unique=False,
        )
        print(f"--- emit={emit} ---")
        for e in range(args.epochs):
            t0 = time.time()
            out = idx.add_docs(batch(e))
            n = out.count()
            print(f"epoch {e}: {time.time() - t0:6.2f}s  emitted {n:>9} rows")
        finals[emit] = {
            (r.id, r.cluster_id) for r in near_dup_clusters(idx.pairs()).collect()
        }
    assert finals["pairs"] == finals["edges"], "clusterings diverged!"
    print("final clusterings identical:", len(finals["pairs"]), "labeled docs")


if __name__ == "__main__":
    main()

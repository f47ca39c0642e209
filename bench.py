#!/usr/bin/env python3
"""Benchmark harness — runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop writer (full computation, no
driver collect) so timings measure the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# 80g (measured vs 48g over full-suite runs — 50 queries at 48g, 51 at
# 80g, the catalog grew between runs): text-heavy queries
# stop billing each other's old-gen garbage — corpus_clean 6.2→4.9 s,
# pmi_collocations 0.67×, ann_lsh 0.76×, suite total −3 s; sub-second
# queries wiggle both ways within run noise. Headroom still leaves ~45 GiB
# for the Arrow python workers on the 128 GiB box.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "80g")

HEADLINE = [
    "q1",
    "each_compute",
    "wordcount",
    "groupby_sum",
    "join_inner",
    "join_nway",
    "topk_per_group",
    "first_n",
    "window_hourly",
    "sessionize",
    "json_extract",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_jaccard_capped",
    "ann_lsh",
    "minhash_lsh",
    "simhash",
    "cosine_topk",
    "text_profile",
    "asof_join",
    "ann_ivf",
    "percentile_exact",
    "embedding_near_dup",
    "winnow_fingerprint",
    "window_sliding",
    "range_join",
    "cms_heavy_hitters",
    "salted_groupby",
    "dataset_split",
    "chunk_tokens",
    "multimodal_frames",
    "corpus_clean",
    "redact_pii",
    "domain_stats",
    "tfidf_top_terms",
    "rolling_active",
    "unigram_surprisal",
    "quota_sample",
    "semantic_dedup",
    "substring_dedup",
    "pmi_collocations",
    "training_order",
    "quality_gate",
    "mixture_weights",
    "bm25_topk",
    "funnel",
    "retention",
    "outlier_mad",
    "gap_fill",
    "weighted_sample",
    "prototype_prune",
    "multimodal_resize",
    "winsorize",
    "profile_table",
    "corpus_diff",
    "event_transitions",
    "ann_rescore",
    "outlier_mad_hist",
    "series_similarity",
    "trailing_zscore",
    "frequent_pairs",
    "pagerank",
    "fuzzy_pairs",
    "scd2",
    "centroid_classify",
    "psi_drift",
    "event_paths",
    # r5: the previously-unbenched tail with nontrivial cost — two-pass
    # fuzzy candidate generation, the continuous rollup's epoch loop
    # (slowest single query observed in r4's oracle harness), the verb-
    # chain/state/cogroup gate queries, graph clustering, decontamination
    "fuzzy_pairs_two_pass",
    "rollup_continuous",
    "multi_reduce",
    "repartition_verbs",
    "state_scan",
    "partition_persist",
    "dedup_cluster",
    "decontaminate",
    "quality_gate_approx",
    # r5 operator additions (streaming gates exempt from the wall-time list)
    "pit_join",
    "group_corr",
    "user_entropy",
    "k_anonymize",
    "tpch_q3",
    "tpch_q6",
    "lm_perplexity",
    "tpch_q5",
    "equi_depth_bins",
    "contamination_pairs",
    "triangle_count",
    "trailing_corr",
    # r6 TPC-H depth gates
    "tpch_q4",
    "tpch_q16",
    "tpch_q18",
    "tpch_q13",
    "tpch_q22",
    "tpch_q10",
    "tpch_q14",
    "tpch_q7",
    "tpch_q8",
    "tpch_q15",
    "tpch_q17",
    "ks_drift",
    "dedup_jaccard_prefix",
    "sessionize_native",
    "set_intersect",
    "set_except",
    # late-r6 operators
    "graph_bfs",
    "dedup_merge",
    "trailing_ewma",
    "k_core",
    "unpivot",
    "quantile_normalize",
    "weighted_median",
    "grouping_sets",
    "user_streaks",
    # r7 operators
    "js_drift",
    "merge_intervals",
    "group_mode",
    "bpe_train",
    "rolling_median",
    "seasonal_baseline",
    "ann_pq",
    "ann_ivf_pq",
    "multimodal_features",
    "hll_distinct",
    "zorder_stats",
    "bpe_segment",
    # r9: cluster-keyed train/eval split (per-doc membership gate)
    "leakage_safe_split",
    # r10: star-edge clustering (O(m) hot buckets) and the persisted
    # train-once/probe-many IVF-PQ index (streaming gates stay exempt)
    "dedup_cluster_stars",
    "ann_index_persist",
    "ann_index_update",
    "ann_index_delete",
    "dsir_sample",
    "gopher_quality",
    "schema_evolution",
    # r11: LSH-index delete lifecycle, ANN quantizer refresh, and the
    # six-stage pretraining capstone (streaming_dsir stays exempt)
    "dedup_index_delete",
    "ann_index_retrain",
    "pretrain_pipeline",
    # r12: LSH-index parameter migration; sample-bounded quantizer
    # training (streaming_pretrain_pipeline's re-selection stays exempt)
    "dedup_index_rebuild",
    "ann_ivf_sampled",
    "ann_pq_sampled",
    # r13: auto_compact_every maintenance-cadence gates (the streaming
    # pipeline gates stay exempt)
    "dedup_index_autocompact",
    "ann_index_autocompact",
]

# Index-LIFECYCLE gates (multi-build, multi-write, multi-phase tests of
# the persisted-index maintenance story) — real operators, benched every
# round, but reported under their OWN total (r12, VERDICT r11 #4): they
# were 50s of the 206s r11 headline and growing one gate per round,
# eroding round-over-round comparability of the per-QUERY headline and
# the 2x-of-baseline gate. Both totals are recorded and both are gated.
LIFECYCLE = [
    "ann_index_persist",
    "ann_index_update",
    "ann_index_autocompact",
    "ann_index_delete",
    "ann_index_retrain",
    "dedup_index_delete",
    "dedup_index_rebuild",
    "dedup_index_autocompact",
]

# The round's new/touched queries — what `--changed-only` runs while
# iterating (the full list dominates round wall-clock at 135+ queries;
# the close-out still runs everything). Update each round.
CHANGED_THIS_ROUND = [
    # r14: linear salted star + one-scan closure + narrowed pretrain
    # persist (dedup family), overlapped ANN index lifecycle jobs
    "dedup_cluster_stars",
    "dedup_cluster",
    "dedup_index_delete",
    "dedup_index_rebuild",
    "dedup_index_autocompact",
    "pretrain_pipeline",
    "ann_index_persist",
    "ann_index_update",
    "ann_index_delete",
    "ann_index_retrain",
    "ann_index_autocompact",
    "dedup_jaccard_prefix",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # --changed-only: bench just this round's new/touched queries (fast
    # iteration loop); --only a,b,c: an explicit subset. Either way the
    # output is MARKED as a subset so a partial run can never pass for
    # the round's full record (the driver's BENCH_r{N}.json must come
    # from a no-args run).
    subset = None
    subset_label = None
    argv = sys.argv[1:]
    if "--changed-only" in argv:
        subset = [q for q in CHANGED_THIS_ROUND if q in set(HEADLINE)]
        subset_label = "changed-only"
    for a in argv:
        if a.startswith("--only="):
            subset = [q.strip() for q in a.split("=", 1)[1].split(",") if q.strip()]
            subset_label = "only"  # a hand-picked list is NOT changed-only
    headline = subset if subset is not None else HEADLINE

    from storm_spark.queries import QUERIES
    from storm_spark.session import get_spark

    spark = get_spark("storm_spark_bench")
    # JVM/codegen warmup on a trivial action
    spark.range(1000).selectExpr("sum(id)").collect()

    # Three timed passes per query: the first pays one-off codegen
    # compilation and stage warmup, and some plans need a second pass before
    # the JIT reaches steady state (measured: percentile_exact runs
    # 3.6 → 1.1 → 0.7 s in a fresh session) — min-of-three is the
    # steady-state plan cost, the number that scales to repeated production
    # runs. Report steady-state per query; keep the cold total as a side
    # channel for honesty.
    # Per-query fault isolation: one broken query must never erase the whole
    # round's perf evidence — record its error and keep measuring the rest.
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline:
        per_run = []
        try:
            for _ in range(3):
                t0 = time.time()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                per_run.append(time.time() - t0)
                spark.catalog.clearCache()  # drop per-query persisted indexes
            # NO System.gc() between queries: tried in r4 to stop one
            # query's garbage billing the next as a GC pause — it fixed that
            # (multimodal_frames 2.2→0.7 s) but forced class-unload/code-
            # cache sweeps that DEOPTIMIZED the shared HOF/md5 interpreter
            # paths: dedup_jaccard_capped ran a consistent 2.5× slower
            # (5.99 s, all three passes) in the gc() run. Occasional GC
            # noise is the lesser evil; min-of-three absorbs most of it.
        except Exception as exc:  # noqa: BLE001 — isolate, report, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            # a query can fail AFTER materializing its internal persist()
            # (e.g. pass 1 ok, pass 2 throws) — drop the leaked cache so it
            # can't occupy executor memory for the remaining queries
            spark.catalog.clearCache()
            continue
        cold[name] = round(per_run[0], 3)
        times[name] = round(min(per_run), 3)
        print(f"# {name}: cold {cold[name]}s warm {times[name]}s", file=sys.stderr)

    # split the headline (r12, VERDICT r11 #4): "value" is the per-QUERY
    # total — comparable round-over-round and against the 2x baseline
    # gate — while the index-lifecycle gates report under their own
    # total. Both measured in the same run, both recorded, both gated.
    lifecycle_set = set(LIFECYCLE)
    q_total = round(sum(v for k, v in times.items() if k not in lifecycle_set), 3)
    lc_total = round(sum(v for k, v in times.items() if k in lifecycle_set), 3)
    total = q_total
    out = {
        # renamed from headline_query_wall_sec at the r12 split (ADVICE
        # r12): pre-split records summed the lifecycle gates into
        # "value", so keeping the old name would let tooling compare
        # different query sets silently; the schema field makes the
        # record shape machine-checkable
        "metric": "headline_query_only_wall_sec",
        "schema": 2,
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
        "cold_total_sec": round(sum(cold.values()), 3),
        "lifecycle_total_sec": lc_total,
        "lifecycle_queries": sorted(k for k in times if k in lifecycle_set),
        "combined_total_sec": round(q_total + lc_total, 3),
    }
    if subset is not None:
        out["subset"] = subset_label
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    # Durable copy: BENCH_r05.json was lost to a truncated stdout capture
    # (the driver's tail cut the head off this single long line), so the
    # record must never depend on how much of stdout a harness keeps.
    default_out = "bench_out.json" if subset is None else "bench_out_subset.json"
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), default_out),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError as exc:
        print(f"# bench_out write failed: {exc}", file=sys.stderr)
    print(line)
    # The full line above outgrows the driver's stdout tail capture (every
    # BENCH_r0N.json so far has "parsed": null) — so the LAST stdout line is
    # a compact totals-only summary that always fits: per-query detail lives
    # in bench_out.json / the long line above.
    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:5]
    compact = {
        "metric": "headline_query_only_wall_sec",
        # schema 3 (r14, VERDICT r13 #2): the compact final line carries the
        # per-query map again — PERF_r13's per_query/geomean/scaling blocks
        # were all empty because the driver parses ONLY the last stdout line
        # and the map lived on the long first line / bench_out.json. At ms
        # rounding the 141-entry map is ~3 KB, well inside the ≥2.5 KB tail
        # the r13 record demonstrably kept. Nothing removed or renamed.
        "schema": 3,
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(times),
        "n_errors": len(errors),
        "queries": times,
        "cold_total_sec": round(sum(cold.values()), 3),
        "lifecycle_total_sec": lc_total,
        "combined_total_sec": round(q_total + lc_total, 3),
        "slowest5": {k: v for k, v in slowest},
        "queries_detail": "bench_out.json",
    }
    if subset is not None:
        compact["subset"] = subset_label
    print(json.dumps(compact))


if __name__ == "__main__":
    main()

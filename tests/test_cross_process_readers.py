"""Cross-process reader continuity (r13, VERDICT r12 #4).

The N−1-generation retention story (`IVFPQIndex.retrain`/`compact`,
`IncrementalLSHIndex.rebuild`/`compact_index`) was argued from the
pointer-file design and pinned in-process only: the OLD generation's
files survive until the NEXT maintenance pass's sweep, so a reader that
attached before a swap finishes green on the old generation and picks
up the new one on re-load. These tests exercise that contract from a
REAL second OS process:

- the ANN test spawns a subprocess with its own SparkSession that
  `IVFPQIndex.load()`s the index and runs a search loop while the
  parent retrains mid-loop — the reference shape the verdict asked for;
- the LSH test's child reads the index the way any external reader
  does — resolve the `{path}__meta.json` pointer, scan the named
  generation's parquet — via DuckDB (no second JVM needed: the LSH
  reader surface IS the pointer + parquet files; the metastore table
  names are a single-session convenience, not the cross-process
  contract).

Single-WRITER is still assumed everywhere (documented contract); these
tests add the multi-READER half.
"""

import json
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ANN_CHILD = """
import json, os, sys, time
sys.path.insert(0, "@@REPO@@")
from pyspark.sql import SparkSession

idx_path, qpath, outpath, flip_sentinel, ready_sentinel = sys.argv[1:6]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "2g")
    .config("spark.sql.warehouse.dir", outpath + "_wh")
    .getOrCreate()
)
from storm_spark.functions.similarity import IVFPQIndex

idx = IVFPQIndex.load(idx_path)
gen0 = idx.generation
queries = spark.read.parquet(qpath)


def one(i):
    return sorted(
        map(tuple, i.search(queries, k=3, n_probe=2, shortlist=10).collect())
    )


base = one(idx)
with open(ready_sentinel, "w") as fh:
    fh.write("ok")
pre_iters, seen_flip, post_flip_old_ok = 0, False, False
deadline = time.time() + 240
while time.time() < deadline:
    assert one(idx) == base, "old-generation result changed mid-loop"
    pre_iters += 1
    if os.path.exists(flip_sentinel):
        seen_flip = True
        # the swap already happened in the parent: the loaded reader
        # must STILL answer identically from the old generation
        for _ in range(3):
            assert one(idx) == base, "old generation unreadable after flip"
        post_flip_old_ok = True
        break
    time.sleep(0.2)
idx2 = IVFPQIndex.load(idx_path)
rows2 = len(one(idx2))
json.dump(
    {
        "gen0": gen0,
        "gen1": idx2.generation,
        "pre_iters": pre_iters,
        "seen_flip": seen_flip,
        "post_flip_old_ok": post_flip_old_ok,
        "reload_rows": rows2,
    },
    open(outpath, "w"),
)
spark.stop()
"""

_LSH_CHILD = """
import json, os, sys, time
import duckdb

index_path, outpath, flip_sentinel, ready_sentinel = sys.argv[1:5]


def resolve():
    with open(index_path + "__meta.json") as fh:
        return json.load(fh)["generation"]


def count(gen):
    p = f"{index_path}__g{gen}"
    return duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{p}/*.parquet')"
    ).fetchone()[0]


g0 = resolve()
base = count(g0)
with open(ready_sentinel, "w") as fh:
    fh.write("ok")
pre_iters, seen_flip, post_flip_old_ok = 0, False, False
deadline = time.time() + 240
while time.time() < deadline:
    assert count(g0) == base, "old-generation row count changed mid-loop"
    pre_iters += 1
    if os.path.exists(flip_sentinel):
        seen_flip = True
        for _ in range(3):
            assert count(g0) == base, "old generation unreadable after flip"
        post_flip_old_ok = True
        break
    time.sleep(0.1)
g1 = resolve()
json.dump(
    {
        "gen0": g0,
        "gen1": g1,
        "pre_iters": pre_iters,
        "seen_flip": seen_flip,
        "post_flip_old_ok": post_flip_old_ok,
        "reload_rows": count(g1),
    },
    open(outpath, "w"),
)
"""


def _spawn(script_body, tmp_path, name, args):
    script = tmp_path / f"{name}.py"
    script.write_text(script_body)
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        [sys.executable, str(script), *map(str, args)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


def _await(path, proc, timeout, what):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if os.path.exists(path):
            return
        if proc.poll() is not None:
            raise AssertionError(
                f"child exited before {what}:\n"
                + proc.stdout.read().decode(errors="replace")[-4000:]
            )
        time.sleep(0.2)
    proc.kill()
    raise AssertionError(f"timed out waiting for {what}")


def _finish(proc, timeout=300):
    out = proc.stdout.read().decode(errors="replace")
    rc = proc.wait(timeout=timeout)
    assert rc == 0, f"child failed rc={rc}:\n{out[-4000:]}"
    return out


def test_ann_index_reader_survives_retrain_cross_process(spark, tmp_path):
    """A second OS process load()s the IVFPQIndex and searches in a loop;
    the parent retrain()s mid-loop (generation swap + pointer flip). The
    reader must (a) answer identically from the OLD generation before
    AND after the flip — its files survive until the NEXT maintenance
    pass's sweep — and (b) pick up the new generation on re-load."""
    from storm_spark.functions import similarity

    # a small clustered corpus (the test_similarity fixture shape)
    corpus = spark.range(120).select(
        F.col("id").cast("bigint").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (
                F.col("id") % 4 + F.sin(F.col("id") * i).cast("double") * 0.1
            ),
        ).alias("embedding"),
    )
    path = str(tmp_path / "annidx")
    idx = similarity.IVFPQIndex(path, "vec_id", "embedding").build(
        corpus, m=4, ksub=4, n_lists=4, n_iters=1
    )
    qpath = str(tmp_path / "queries")
    corpus.filter(F.col("vec_id") < 6).write.parquet(qpath)
    outpath = str(tmp_path / "child_out.json")
    flip, ready = str(tmp_path / "flip"), str(tmp_path / "ready")
    proc = _spawn(
        _ANN_CHILD.replace("@@REPO@@", REPO), tmp_path, "ann_child",
        [path, qpath, outpath, flip, ready],
    )
    try:
        _await(ready, proc, 240, "child first search")
        idx.retrain(n_iters=1)  # the swap, while the child loops
        assert idx.generation == "g1"
        with open(flip, "w") as fh:
            fh.write("flipped")
        _finish(proc)
    finally:
        if proc.poll() is None:
            proc.kill()
    got = json.load(open(outpath))
    assert got["gen0"] is None and got["gen1"] == "g1", got
    assert got["seen_flip"] and got["post_flip_old_ok"], got
    assert got["pre_iters"] >= 1 and got["reload_rows"] > 0, got


def test_lsh_index_reader_survives_rebuild_cross_process(spark, tmp_path):
    """A second OS process reads the LSH index the external-reader way —
    resolve the stable pointer, scan the named generation's parquet —
    while the parent rebuild()s to new parameters mid-loop. The old
    generation must stay readable through and after the flip (N−1
    retention), and re-resolving the pointer lands on the new one."""
    from storm_spark.functions.dedup import IncrementalLSHIndex

    rows = [
        (i, f"the quick brown fox {i % 5} jumps over the lazy dog {i % 5}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "lshidx")
    kw = dict(n=3, num_perm=12, bands=4, n_buckets=8,
              index_table="lsh_xproc_test", index_path=path)
    try:
        idx = IncrementalLSHIndex("doc_id", "text", **kw)
        idx.add_docs(docs).collect()
        idx.compact_index()  # creates the pointer + g1
        assert idx.generation == 1
        outpath = str(tmp_path / "child_out.json")
        flip, ready = str(tmp_path / "flip"), str(tmp_path / "ready")
        proc = _spawn(
            _LSH_CHILD, tmp_path, "lsh_child", [path, outpath, flip, ready]
        )
        try:
            _await(ready, proc, 120, "child first read")
            idx.rebuild(docs, bands=2)  # parameter migration → g2
            assert idx.generation == 2
            with open(flip, "w") as fh:
                fh.write("flipped")
            _finish(proc, timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
        got = json.load(open(outpath))
        assert got["gen0"] == 1 and got["gen1"] == 2, got
        assert got["seen_flip"] and got["post_flip_old_ok"], got
        # new generation readable and bands-2 sized: 30 docs × 2 bands
        assert got["reload_rows"] == 60, got
    finally:
        for t in ("lsh_xproc_test", "lsh_xproc_test__ids",
                  "lsh_xproc_test__g1", "lsh_xproc_test__g1__ids",
                  "lsh_xproc_test__g2", "lsh_xproc_test__g2__ids"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

"""End-to-end proof that the graded bench is unkillable by a single
failing query (VERDICT r11 #1: BENCH_r11.json landed parsed:null because
one transient worker-spawn flake in an ext-lane query escaped an
unguarded trial loop and took the whole run down before the one JSON
line).

Runs ``bench.py`` as a subprocess — the driver's exact invocation shape —
restricted to one headline + one ext query via SPARK_GRAFT_BENCH_ONLY,
with SPARK_GRAFT_BENCH_FAILPOINT making the ext query raise on every
call. The bench must exit 0, print exactly one parseable JSON line, time
the healthy query, and record the failure — and must write its sidecar
artifacts into SPARK_GRAFT_BENCH_OUT_DIR, never the repo's committed
copies.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_bench_survives_injected_failing_query(tmp_path):
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": SF_DIR,
            "SPARK_GRAFT_BENCH_ONLY": (
                "tpch_q6_forecast_revenue,sketch_kmv_distinct"
            ),
            "SPARK_GRAFT_BENCH_FAILPOINT": "sketch_kmv_distinct",
            "SPARK_GRAFT_BENCH_TRIALS": "1",
            "SPARK_GRAFT_BENCH_EXT_TRIALS": "1",
            "SPARK_GRAFT_BENCH_STREAM_OPSEC": "0",
            # the window gate is irrelevant here — never sleep-retry
            "SPARK_GRAFT_CALIB_MAX": "999",
            "SPARK_GRAFT_CALIB_RETRIES": "0",
            "SPARK_GRAFT_BENCH_OUT_DIR": str(tmp_path),
            "SPARK_GRAFT_CPUS": "8",
        }
    )
    before = {
        f: os.stat(os.path.join(REPO, f)).st_mtime_ns
        for f in ("BENCH_DETAIL.json", "BENCH_FLOOR.json")
        if os.path.exists(os.path.join(REPO, f))
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout  # exactly one line for the driver
    report = json.loads(lines[0])  # ... and it parses
    assert report["metric"] == "headline_query_wall_sec"
    assert "tpch_q6_forecast_revenue" in report["queries"]
    assert report["n_failed"] == 1
    assert report["failed"] == ["sketch_kmv_distinct"]
    # the failure is visible with its error in the sidecar, which landed
    # in OUT_DIR — the committed artifacts are untouched
    with open(tmp_path / "BENCH_DETAIL.json") as f:
        detail = json.load(f)
    assert "injected bench failpoint" in detail["query_failures"][
        "sketch_kmv_distinct"
    ]
    assert "sketch_kmv_distinct" not in detail["queries_ext"]
    after = {
        f: os.stat(os.path.join(REPO, f)).st_mtime_ns
        for f in before
    }
    assert after == before


def test_no_derived_cross_run_cache_in_timed_lanes():
    """Bench lint (VERDICT r13 what's-wrong #2): a query whose builder
    reads a cross-run /tmp cache carrying DERIVED engine compute (vs the
    accepted input-synthesis staging) must never be wall-clock timed —
    repeat trials would amortize real work across runs, which the brief
    bans as result caching. The registry declares the classification
    (``QueryDef.staged_cache``); this test pins both the ban and the
    declaration that makes it enforceable."""
    import importlib.util

    from aws_localstack_stream_processing_spark.plans import all_queries

    spec = importlib.util.spec_from_file_location(
        "bench_lint", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    qs = all_queries()
    timed = list(bench.HEADLINE) + list(bench.EXT)
    derived = sorted(
        q for q in timed
        if q in qs and qs[q].staged_cache == "derived"
    )
    assert derived == [], (
        f"wall-clock lanes must not time derived-cache queries: {derived}"
    )
    # the tripwire: the known derived-cache builder stays declared, so a
    # future ext-list edit cannot silently make it timeable
    assert qs["stream_dedup_lsh"].staged_cache == "derived"

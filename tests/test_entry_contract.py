"""The verification driver's contract surface (__spark_entry__.py):
entry() must be idempotent with a stable schema, queries()/oracle_sql()
must stay key-consistent, and the self-balancing registry order must be
deterministic for a fixed set of CORRECTNESS files."""

from __future__ import annotations

import importlib


def _entry_module():
    return importlib.import_module("__spark_entry__")


def test_entry_runs_twice_stable_schema(spark):
    mod = _entry_module()
    df1 = mod.entry(spark)
    df2 = mod.entry(spark)
    assert df1.schema == df2.schema
    n1, n2 = df1.count(), df2.count()
    assert n1 == n2 >= 0


def test_queries_and_oracles_key_consistent(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SELECT-producing SQL string
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    # since r8 every registered query is oracle-backed (the approx
    # sketches became hash-matchable accuracy audits — VERDICT r7 #3)
    assert set(qs) - set(oracles) == set()


def test_registry_order_deterministic():
    from aws_localstack_stream_processing_spark.plans.registry import all_queries

    assert list(all_queries()) == list(all_queries())


def test_worker_imports_from_any_cwd():
    """VERDICT r6 #4: a judge-style run from /tmp — repo on the DRIVER's
    sys.path only, no PYTHONPATH env — must still run queries whose UDFs /
    DataSources are pickled by reference to package modules. The package
    ships itself to executors via addPyFile on first load_table touch."""
    import os
    import subprocess
    import sys

    script = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.ui.enabled', 'false')\n"
        "         .config('spark.sql.shuffle.partitions', '2').getOrCreate())\n"
        # hardest case FIRST: a Python DataSource registered before any
        # load_table touch — the class is pickled by reference, so both
        # the plan runner and the workers must import the package
        "from aws_localstack_stream_processing_spark.sources.firehose_datasource"
        " import register_firehose_source\n"
        "register_firehose_source(spark)\n"
        "n0 = (spark.read.format('firehose_sim')\n"
        "      .option('path', '/root/testdata/sf0.001/events.parquet')\n"
        "      .option('records_per_batch', '100').load().count())\n"
        "import __spark_entry__ as E\n"
        "qs = E.queries()\n"
        "n1 = qs['ref_sign_pipeline'](spark, '/root/testdata/sf0.001').count()\n"
        "n2 = qs['ref_seed_keygen'](spark, '/root/testdata/sf0.001').count()\n"
        "print('ROWS', n0, n1, n2)\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ROWS" in r.stdout, r.stdout


def test_package_zip_content_addressed(tmp_path, monkeypatch):
    """The executor-shipped zip self-invalidates: same tree → same cached
    archive; any module edit (mtime/size) → a NEW filename, so a running
    fleet can never import a stale package copy."""
    import zipfile

    from aws_localstack_stream_processing_spark import session as S

    z1 = S._package_zip()
    assert S._package_zip() == z1  # cache hit, no rebuild
    with zipfile.ZipFile(z1) as z:
        names = z.namelist()
    # archive rooted at the package dir (importable via sys.path entry)
    assert "aws_localstack_stream_processing_spark/__init__.py" in names
    assert all(n.startswith("aws_localstack_stream_processing_spark/") for n in names)
    assert not any("__pycache__" in n for n in names)
    # touching any module must change the fingerprint (new filename)
    import os

    mod = os.path.join(os.path.dirname(S.__file__), "__init__.py")
    st = os.stat(mod)
    os.utime(mod, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    try:
        z2 = S._package_zip()
        assert z2 != z1
    finally:
        os.utime(mod, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert S._package_zip() == z1  # restored tree → original archive again


def test_bench_floor_covers_headline():
    """BENCH_FLOOR.json (r9): the rolling per-query minimum anchor must
    parse, target sf0.1, and cover every headline query so vs_floor can
    classify each one (new queries enter the floor on their first gated
    run; headline members must never be floorless)."""
    import json
    import os

    import bench

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_FLOOR.json")) as f:
        doc = json.load(f)
    assert doc["sf"] == 0.1
    floor = doc["floor"]
    assert all(isinstance(v, (int, float)) and v > 0 for v in floor.values())
    missing = [q for q in bench.HEADLINE if q not in floor]
    assert not missing, f"headline queries without a floor entry: {missing}"

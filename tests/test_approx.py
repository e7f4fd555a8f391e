"""Accuracy bounds for sketch-based operators. Since round 8 the two
sketch queries ship as sketch-accuracy AUDITS (exact anchor + deterministic
``within_bound`` verdict — VERDICT r7 #3) so the DuckDB oracle can
hash-match them; these tests pin (a) the audit verdicts are TRUE, (b) the
anchors equal independently-computed exact answers, and (c) the raw sketch
values (which never leave the query plan) actually sit within the published
error bound of the exact answer."""

from __future__ import annotations

import math

from .conftest import SF_DIR


def test_approx_distinct_audit_and_raw_sketch_bound(spark):
    from aws_localstack_stream_processing_spark.plans import all_queries

    qd = all_queries()["sql_approx_distinct"]
    rows = {r.event_type: r for r in qd.fn(spark, SF_DIR).collect()}
    exact = {
        r.event_type: (r.nu, r.ne)
        for r in spark.sql(
            """
            SELECT event_type, COUNT(DISTINCT user_id) AS nu,
                   COUNT(DISTINCT event_id) AS ne
            FROM slsp_events GROUP BY event_type
            """
        ).collect()
    }
    approx = {
        r.event_type: (r.au, r.ae)
        for r in spark.sql(
            """
            SELECT event_type, approx_count_distinct(user_id) AS au,
                   approx_count_distinct(event_id) AS ae
            FROM slsp_events GROUP BY event_type
            """
        ).collect()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        eu, ee = exact[et]
        assert (r.exact_users, r.exact_events) == (eu, ee)
        assert r.users_within_bound and r.events_within_bound, et
        au, ae = approx[et]
        # HLL++ default rsd is 5%; allow 3 sigma
        assert abs(au - eu) <= max(3, 0.15 * eu), (et, au, eu)
        assert abs(ae - ee) <= max(3, 0.15 * ee), (et, ae, ee)


def test_approx_percentile_audit_and_raw_rank_error(spark):
    """approx_percentile(accuracy=10000) guarantees rank error <= n/10000;
    the audit query's anchors must equal the value at rank ceil(p*n), its
    verdicts must be TRUE, and the raw sketch value's true rank must be
    within the bound of the target rank for every group and quantile."""
    from aws_localstack_stream_processing_spark.plans import all_queries

    qd = all_queries()["sql_approx_percentile"]
    rows = qd.fn(spark, SF_DIR).collect()
    exact = {
        r.o_orderpriority: r.vals
        for r in spark.sql(
            """
            SELECT o_orderpriority,
                   sort_array(collect_list(o_totalprice)) AS vals
            FROM slsp_orders GROUP BY o_orderpriority
            """
        ).collect()
    }
    sk = {
        r.o_orderpriority: (r.a50, r.a90, r.a99)
        for r in spark.sql(
            """
            SELECT o_orderpriority,
                   approx_percentile(o_totalprice, 0.5, 10000) AS a50,
                   approx_percentile(o_totalprice, 0.9, 10000) AS a90,
                   approx_percentile(o_totalprice, 0.99, 10000) AS a99
            FROM slsp_orders GROUP BY o_orderpriority
            """
        ).collect()
    }
    assert {r.o_orderpriority for r in rows} == set(exact)
    for r in rows:
        vals = exact[r.o_orderpriority]
        n = len(vals)
        assert r.n == n
        # anchors = exact disc percentile at 1-indexed rank ceil(p*n)
        for p, anchor in ((50, r.p50_exact), (90, r.p90_exact), (99, r.p99_exact)):
            assert anchor == vals[math.ceil(n * p / 100) - 1], (p, n)
        assert r.p50_within_bound and r.p90_within_bound and r.p99_within_bound
        tol = max(1.0, n / 10000)
        for q, v in zip((0.5, 0.9, 0.99), sk[r.o_orderpriority]):
            lo = sum(1 for x in vals if x < v)
            hi = sum(1 for x in vals if x <= v)
            target = q * (n - 1)
            assert lo - tol <= target <= hi + tol, (
                r.o_orderpriority, q, v, lo, hi, target, n
            )


def test_ivf_recall_floor_vs_exact(spark):
    """ANN evaluation harness: IVF(nprobe=2, 50 cells) recall@5 against the
    exact brute-force top-5 for the same query set. The pipeline is fully
    deterministic, so mean recall is a constant at this SF (0.71) — the
    floor guards against silent candidate-generation regressions while
    documenting the recall/efficiency trade-off."""
    import collections

    from aws_localstack_stream_processing_spark.plans import all_queries
    from aws_localstack_stream_processing_spark.plans.dialect import dot, to_double_arr

    ivf = all_queries()["sim_ann_ivf"].fn(spark, SF_DIR)
    got = collections.defaultdict(set)
    for r in ivf.collect():
        got[r.query_id].add(r.neighbor_id)

    exact = spark.sql(
        f"""
WITH base AS (SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb FROM slsp_embeddings),
normed AS (SELECT vec_id, emb, sqrt({dot('emb', 'emb', 64, 'spark')}) AS nrm FROM base),
q AS (SELECT * FROM normed WHERE vec_id % 25 = 0),
pairs AS (SELECT q.vec_id qid, n.vec_id nid,
                 {dot('q.emb', 'n.emb', 64, 'spark')} / (q.nrm * n.nrm) cs
          FROM q JOIN normed n ON q.vec_id <> n.vec_id),
r AS (SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cs DESC, nid) rnk FROM pairs)
SELECT qid, nid FROM r WHERE rnk <= 5
"""
    ).collect()
    ex = collections.defaultdict(set)
    for r in exact:
        ex[r.qid].add(r.nid)
    recalls = [len(got[q] & ex[q]) / len(ex[q]) for q in ex]
    assert len(recalls) >= 10
    assert sum(recalls) / len(recalls) >= 0.6


def test_ivf_recall_eval_query_floor(spark):
    """The driver-checked ``sim_ann_ivf_recall_eval`` query reports the
    same metric as the harness above — per-query recall@5 at nprobe=2 —
    and its mean must clear the same fixed floor (deterministic pipeline:
    a drop means candidate generation regressed, not noise)."""
    from aws_localstack_stream_processing_spark.plans import all_queries

    rows = all_queries()["sim_ann_ivf_recall_eval"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 10
    assert all(r.k == 5 and 0.0 <= r.recall_at_k <= 1.0 for r in rows)
    assert sum(r.recall_at_k for r in rows) / len(rows) >= 0.6


def test_ivfpq_recall_eval_query_floor(spark):
    """IVF-PQ recall@5 is intentionally coarse at test SF (~N/50-entry
    codebooks), but it is deterministic — the floor catches a silent
    break in cell probing or code assignment, and the ceiling guards
    against the eval accidentally comparing the exact side to itself."""
    from aws_localstack_stream_processing_spark.plans import all_queries

    rows = all_queries()["sim_ann_ivfpq_recall_eval"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 10
    assert all(r.k == 5 and 0.0 <= r.recall_at_k <= 1.0 for r in rows)
    mean = sum(r.recall_at_k for r in rows) / len(rows)
    assert 0.05 <= mean < 1.0


def test_kmv_estimate_within_bound(spark):
    """KMV with k=64 has relative standard error ~1/sqrt(k-2) ≈ 12.7%;
    assert every group's estimate is within 4 standard errors (plus the
    exact-below-k case, which must be exactly right)."""
    from aws_localstack_stream_processing_spark.plans import all_queries

    from .conftest import SF_DIR

    df = all_queries()["sketch_kmv_distinct"].fn(spark, SF_DIR)
    rows = {r["event_type"]: r for r in df.collect()}
    assert "__all__" in rows
    for et, r in rows.items():
        if r["n_kept"] < 64:
            assert r["kmv_estimate"] == float(r["exact_distinct"]), et
        else:
            rel = abs(r["kmv_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
            assert rel < 4 / (64 - 2) ** 0.5, (et, rel)


def test_ivfpq_refine_recall_strictly_above_pq_only(spark):
    """VERDICT r6 #8: the exact-rescore refine stage must repair PQ
    distance distortion — recall@5 vs the exact ranking strictly above
    the PQ-only number, with a pinned absolute floor (deterministic
    pipeline: 0.19 → 0.45 at sf0.001)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_localstack_stream_processing_spark.plans import all_queries
    from aws_localstack_stream_processing_spark.plans.dialect import (
        tbl,
        to_double_arr,
        views,
    )
    from aws_localstack_stream_processing_spark.plans.pipeline_ops import (
        _IVFPQ_QUERY_MOD,
        _IVFPQ_TOPK,
        _PQ_M,
        _PQ_SUB,
        _l2sq_range,
    )

    views(spark, SF_DIR, "embeddings")
    base = spark.sql(
        f"SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb "
        f"FROM {tbl('embeddings', 'spark')}"
    )
    q = base.filter(F.col("vec_id") % _IVFPQ_QUERY_MOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    l2 = F.expr(_l2sq_range("qemb", "emb", 0, _PQ_M * _PQ_SUB, "spark"))
    we = Window.partitionBy("qid").orderBy(F.col("d"), F.col("vec_id"))
    truth: dict[int, set[int]] = {}
    for r in (
        F.broadcast(q)
        .join(base, F.col("qid") != F.col("vec_id"))
        .withColumn("d", l2)
        .withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= _IVFPQ_TOPK)
        .select("qid", F.col("vec_id").alias("nid"))
        .collect()
    ):
        truth.setdefault(r.qid, set()).add(r.nid)

    def mean_recall(name: str) -> float:
        got: dict[int, set[int]] = {}
        for r in all_queries()[name].fn(spark, SF_DIR).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        recs = [
            len(truth[k] & got.get(k, set())) / len(truth[k]) for k in truth
        ]
        return sum(recs) / len(recs)

    pq_only = mean_recall("emb_ivfpq_search")
    refined = mean_recall("emb_ivfpq_refine")
    assert refined > pq_only, (refined, pq_only)
    assert refined >= 0.35  # pinned floor (measured 0.45 at sf0.001)
    # refine can only reorder within the probed-cell pool: it must not
    # fabricate neighbors outside it, so it stays below perfect recall
    # at this codebook size
    assert refined < 1.0


def test_incremental_ivf_upsert_equals_batch_rebuild_and_keeps_recall(spark):
    """VERDICT r11 #4 done-criteria. (1) The incrementally-grown IVF
    index — retained-corpus pass plus a SEPARATE delta pass over the new
    arrivals, both against the frozen centroid set — assigns every
    vector to exactly the cell a from-scratch rebuild would (per-vector
    assignment under frozen centroids is independent of every other
    vector: the theorem that makes grow-only IVF exact, checked here on
    data, not assumed). (2) The registered query's merged cell sizes
    equal the batch-built index's (``emb_ivf_balance_stats``, same
    centroid rule). (3) recall@5 (nprobe=2) of search over the
    incremental index clears the same 0.6 floor as the batch index —
    identical contents ⇒ identical recall, measured independently in
    numpy so a future divergence in either path trips it."""
    import numpy as np
    from pyspark.sql import functions as F

    from aws_localstack_stream_processing_spark.plans import all_queries
    from aws_localstack_stream_processing_spark.plans.curation_ops import (
        _IVF_CENT_MOD,
        _IVF_NEW_MOD,
        _IVF_NEW_REM,
        ivf_assign,
    )
    from aws_localstack_stream_processing_spark.plans.dialect import (
        dot,
        to_double_arr,
        views,
    )

    views(spark, SF_DIR, "embeddings")
    normed = spark.sql(
        f"""
SELECT vec_id, emb, sqrt({dot('emb', 'emb', 64, 'spark')}) AS nrm
FROM (SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb
      FROM slsp_embeddings)
"""
    )
    cents = F.broadcast(
        normed.filter(F.col("vec_id") % _IVF_CENT_MOD == 0).select(
            F.col("vec_id").alias("cid"),
            F.col("emb").alias("cemb"),
            F.col("nrm").alias("cnrm"),
        )
    )
    is_new = F.col("vec_id") % _IVF_NEW_MOD == _IVF_NEW_REM
    # (1) incremental (two independent passes) ≡ batch (one pass)
    inc = {
        r.vec_id: r.cid
        for r in ivf_assign(normed.filter(~is_new), cents).collect()
    }
    n_retained = len(inc)
    inc.update(
        (r.vec_id, r.cid)
        for r in ivf_assign(normed.filter(is_new), cents).collect()
    )
    batch = {r.vec_id: r.cid for r in ivf_assign(normed, cents).collect()}
    assert len(inc) > n_retained  # the delta slice is non-empty
    assert inc == batch
    # (2) the registered query's merged cells == the batch-built index's
    up = all_queries()["emb_ivf_incremental_upsert"].fn(spark, SF_DIR)
    merged = {r.cid: (r.n_base, r.n_added, r.n_total) for r in up.collect()}
    bal = {
        r.cid: r.n_vecs
        for r in all_queries()["emb_ivf_balance_stats"].fn(spark, SF_DIR).collect()
    }
    assert {c: t for c, (_, _, t) in merged.items()} == bal
    assert all(b + a == t for b, a, t in merged.values())
    # (3) recall@5 at nprobe=2 over the INCREMENTAL index, vs exact
    rows = spark.sql(
        f"SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb "
        f"FROM slsp_embeddings"
    ).collect()
    V = {r.vec_id: np.asarray(r.emb, dtype=np.float64) for r in rows}
    U = {k: v / np.linalg.norm(v) for k, v in V.items()}
    cent_ids = sorted(k for k in U if k % _IVF_CENT_MOD == 0)
    qids = sorted(k for k in U if k % 25 == 0)
    recalls = []
    for q in qids:
        probe = sorted(
            cent_ids, key=lambda c: (-(U[q] @ U[c]), c)
        )[:2]
        cand = [v for v, c in inc.items() if c in probe and v != q]
        got = set(
            sorted(cand, key=lambda v: (-(U[q] @ U[v]), v))[:5]
        )
        exact = set(
            sorted(
                (v for v in U if v != q),
                key=lambda v: (-(U[q] @ U[v]), v),
            )[:5]
        )
        recalls.append(len(got & exact) / len(exact))
    assert len(recalls) >= 10
    assert sum(recalls) / len(recalls) >= 0.6


def test_recluster_hot_cells_equals_restricted_retrain_and_recall(spark):
    """VERDICT r12 #3 done-criteria for ``emb_ivf_recluster_hot_cells``.

    (1) The registered query's split populations equal an INDEPENDENT
    numpy re-train restricted to the affected cells — same integerized
    exact arithmetic, same data-point init, same tie-breaks — so the
    oracle equivalence (Spark ≡ DuckDB) is additionally anchored outside
    both SQL engines.
    (2) Recall@5 over the post-split index: at cell-count-proportional
    nprobe (FAISS's standard scaling — probe budget tracks ncells) it is
    NOT WORSE than the pre-split index at its own nprobe=2; at fixed
    nprobe=2 it still clears the family's 0.6 floor. Measured: pre 0.71,
    post 0.75 (proportional) / 0.66 (fixed) at sf0.001."""
    import numpy as np
    from collections import Counter

    from aws_localstack_stream_processing_spark.plans import all_queries
    from aws_localstack_stream_processing_spark.plans.dialect import (
        to_double_arr,
        views,
    )
    from aws_localstack_stream_processing_spark.plans.responder_ops import (
        _HOT_TOP,
        _NEW_CID_OFFSET,
        _RC_ITERS,
    )

    views(spark, SF_DIR, "embeddings")
    rows = spark.sql(
        f"SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb "
        f"FROM slsp_embeddings"
    ).collect()
    V = {r.vec_id: np.asarray(r.emb, dtype=np.float64) for r in rows}
    U = {k: v / np.linalg.norm(v) for k, v in V.items()}
    cent_ids = sorted(k for k in U if k % 50 == 0)
    assign = {
        v: max(cent_ids, key=lambda c: (U[v] @ U[c], -c)) for v in U
    }
    sizes = Counter(assign.values())
    hot = sorted(sizes, key=lambda c: (-sizes[c], c))[:_HOT_TOP]

    def lloyd(members):
        X = {
            m: np.floor(V[m] * 1e6 + 0.5).astype(np.int64) for m in members
        }
        init = sorted(members)[:2]
        cents = {s: (X[v], 1) for s, v in enumerate(init)}
        for _ in range(_RC_ITERS):
            a = {}
            for m in members:
                best, bd = None, None
                for s, (ssum, cnt) in cents.items():
                    diff = (cnt * X[m] - ssum).astype(np.float64)
                    dist = float((diff * diff).sum()) / (cnt * cnt)
                    if bd is None or dist < bd or (dist == bd and s < best):
                        best, bd = s, dist
                a[m] = best
            cents = {
                s: (
                    sum(X[m] for m in members if a[m] == s),
                    sum(1 for m in members if a[m] == s),
                )
                for s in set(a.values())
            }
        return a, cents

    post_assign = dict(assign)
    new_cents = {}
    expected = {}
    for h in hot:
        members = [v for v, c in assign.items() if c == h]
        a, cents2 = lloyd(members)
        for m, s in a.items():
            post_assign[m] = (h, s)
        for s, (ssum, cnt) in cents2.items():
            vec = ssum.astype(np.float64) / (1e6 * cnt)
            new_cents[(h, s)] = vec / np.linalg.norm(vec)
        expected[h] = (
            len(members),
            sum(1 for m in members if a[m] == 0),
            sum(1 for m in members if a[m] == 1),
        )

    # (1) query ≡ the independent restricted re-train
    got = {
        r.cid: (r.n_before, r.n_keep, r.n_moved)
        for r in all_queries()["emb_ivf_recluster_hot_cells"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expected
    q_rows = all_queries()["emb_ivf_recluster_hot_cells"].fn(
        spark, SF_DIR
    ).collect()
    assert all(r.minted_cid == r.cid + _NEW_CID_OFFSET for r in q_rows)
    # the split bounds worst-case probe cost
    assert all(r.max_cell_after < r.max_cell_before for r in q_rows)

    # (2) recall before/after
    pre_cents = {c: U[c] for c in cent_ids}
    post_cents = {c: U[c] for c in cent_ids if c not in hot}
    post_cents.update(new_cents)

    def recall(cents_map, amap, nprobe):
        qids = sorted(k for k in U if k % 25 == 0)
        rs = []
        for q in qids:
            probe = sorted(
                cents_map, key=lambda c: (-(U[q] @ cents_map[c]), str(c))
            )[:nprobe]
            cand = [v for v, c in amap.items() if c in probe and v != q]
            got5 = set(
                sorted(cand, key=lambda v: (-(U[q] @ U[v]), v))[:5]
            )
            exact = set(
                sorted(
                    (v for v in U if v != q),
                    key=lambda v: (-(U[q] @ U[v]), v),
                )[:5]
            )
            rs.append(len(got5 & exact) / 5)
        assert len(rs) >= 10
        return sum(rs) / len(rs)

    pre = recall(pre_cents, assign, 2)
    n_pre, n_post = len(pre_cents), len(post_cents)
    prop = math.ceil(2 * n_post / n_pre)
    assert recall(post_cents, post_assign, prop) >= pre
    assert recall(post_cents, post_assign, 2) >= 0.6


def test_ivfpq_fused_adc_equals_two_pass_reference(spark):
    """r13 ADC fusion equivalence (OPTIMIZATION_r13.md wave 2): the fused
    single-cross pipeline (one N×C pass emitting the coarse argmin AND
    the four per-subspace PQ argmins) must return bit-identical search
    results to the pre-fusion two-pass formulation — an independent
    in-test re-derivation: coarse assignment from its own cross, codes
    from the registered emb_pq_codes operator, flat distance-table hash
    joins. Catches a summation-order or argmin-tiebreak drift that the
    DuckDB oracle would also catch, but localized to the fusion."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_localstack_stream_processing_spark.plans import all_queries
    from aws_localstack_stream_processing_spark.plans.dialect import (
        tbl,
        to_double_arr,
        views,
    )
    from aws_localstack_stream_processing_spark.plans.pipeline_ops import (
        _IVFPQ_NPROBE,
        _IVFPQ_QUERY_MOD,
        _IVFPQ_TOPK,
        _PQ_CENT_MOD,
        _PQ_M,
        _PQ_SUB,
        _l2sq_range,
        emb_pq_codes,
    )

    views(spark, SF_DIR, "embeddings")
    base = spark.sql(
        f"SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb "
        f"FROM {tbl('embeddings', 'spark')}"
    ).persist()
    cents = F.broadcast(
        base.filter(F.col("vec_id") % _PQ_CENT_MOD == 0).select(
            F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
        )
    )
    l2full = F.expr(_l2sq_range("emb", "cemb", 0, _PQ_M * _PQ_SUB, "spark"))
    scored = base.join(cents).withColumn("dfull", l2full)
    afull = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct(F.col("dfull"), F.col("cid"))).alias("b"))
        .select("vec_id", F.col("b.cid").alias("cid"))
    )
    codes = emb_pq_codes(spark, SF_DIR).select(
        "vec_id", *[f"code{m}" for m in range(_PQ_M)]
    )
    qscored = scored.filter(F.col("vec_id") % _IVFPQ_QUERY_MOD == 0)
    wq = Window.partitionBy("vec_id").orderBy(F.col("dfull"), F.col("cid"))
    qp = F.broadcast(
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVFPQ_NPROBE)
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    dt = F.broadcast(
        base.filter(F.col("vec_id") % _IVFPQ_QUERY_MOD == 0)
        .select(F.col("vec_id").alias("qid"), F.col("emb").alias("qemb"))
        .join(cents)
        .select(
            "qid",
            F.col("cid").alias("code"),
            *[
                F.expr(
                    _l2sq_range("qemb", "cemb", m * _PQ_SUB, _PQ_SUB, "spark")
                ).alias(f"dq{m}")
                for m in range(_PQ_M)
            ],
        )
    )
    cand = F.broadcast(
        qp.join(afull.withColumnRenamed("vec_id", "nid"), "cid")
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid")
    ).join(codes.withColumnRenamed("vec_id", "nid"), "nid")
    adc = cand
    for m in range(_PQ_M):
        w = dt.select(
            F.col("qid").alias("qid_w"),
            F.col("code").alias(f"wcode{m}"),
            f"dq{m}",
        )
        adc = adc.join(
            w,
            (F.col("qid") == F.col("qid_w"))
            & (F.col(f"code{m}") == F.col(f"wcode{m}")),
        ).drop("qid_w", f"wcode{m}")
    adc_col = F.col("dq0")
    for m in range(1, _PQ_M):
        adc_col = adc_col + F.col(f"dq{m}")
    wr = Window.partitionBy("qid").orderBy(F.col("adc_d"), F.col("nid"))
    ref = (
        adc.withColumn("adc_d", adc_col)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _IVFPQ_TOPK)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rnk").cast("bigint").alias("rnk"),
            F.round("adc_d", 6).alias("adc_dist"),
        )
    )
    ref_rows = sorted(tuple(r) for r in ref.collect())
    base.unpersist()
    spark.catalog.clearCache()
    got = all_queries()["emb_ivfpq_search"].fn(spark, SF_DIR)
    got_rows = sorted(tuple(r) for r in got.collect())
    spark.catalog.clearCache()
    assert got_rows == ref_rows

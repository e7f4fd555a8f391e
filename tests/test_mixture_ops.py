"""Round-6 wave 4 invariants: laws of the training-mix governance ops that
the oracle hash can't express by itself."""

from __future__ import annotations

from aws_localstack_stream_processing_spark.plans import all_queries

from .conftest import SF_DIR

QUERIES = all_queries()


def test_shuffle_shard_audit_covers_and_mixes(spark):
    """Every (epoch, shard) cell exists, per-epoch totals equal the corpus
    size, and the hash shuffle actually mixes: no shard is single-source."""
    rows = QUERIES["data_shuffle_shard_audit"].fn(spark, SF_DIR).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
        assert 0.0 < r.max_source_share <= 1.0
        assert r.n_sources >= 2  # a one-source shard = the shuffle failed
    assert set(by_epoch) == {1, 2}
    n0 = sum(r.n_docs for r in by_epoch[1])
    assert n0 == sum(r.n_docs for r in by_epoch[2]) > 0
    assert all(len(v) == 8 for v in by_epoch.values())


def test_license_gate_partitions_the_corpus(spark):
    """Every doc lands in exactly one license class; keep is derived from
    the class; seeding guarantees every class is populated."""
    rows = QUERIES["web_license_gate"].fn(spark, SF_DIR).collect()
    classes = {r.license for r in rows}
    assert classes == {"cc", "public_domain", "restricted", "unmarked"}
    for r in rows:
        assert r.keep == (r.license in ("cc", "public_domain"))
        assert r.n_docs > 0


def test_dup_quality_interaction_shares_sum_to_one(spark):
    rows = QUERIES["dedup_quality_interaction"].fn(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    # planted duplicates guarantee both dup classes appear
    assert {r.is_dup for r in rows} == {True, False}


def test_threshold_sweep_monotone(spark):
    """Raising the threshold can only shrink pair and doc counts, and the
    planted near-identical pairs keep the top threshold non-empty."""
    rows = sorted(
        QUERIES["emb_dedup_threshold_sweep"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.80, 0.85, 0.90, 0.95, 0.99]
    for lo, hi in zip(rows, rows[1:]):
        assert lo.n_pairs >= hi.n_pairs
        assert lo.n_docs_affected >= hi.n_docs_affected
    assert rows[-1].n_pairs > 0
    # each pair touches 2 docs; distinct docs never exceed 2x pairs
    assert all(r.n_docs_affected <= 2 * r.n_pairs for r in rows)


def test_dp_release_deterministic_and_bounded(spark):
    """The seeded release is reproducible run-to-run, and the Laplace
    noise magnitude is bounded by the inverse-CDF tail at the seed
    granularity: |noise| <= (1/eps) * ln(1048576)."""
    q = QUERIES["privacy_dp_count_release"].fn
    r1 = {r.event_type: r.released_count for r in q(spark, SF_DIR).collect()}
    r2 = {r.event_type: r.released_count for r in q(spark, SF_DIR).collect()}
    assert r1 == r2 and r1
    import math

    bound = (1 / 0.5) * math.log(1048576) + 1e-6
    rows = q(spark, SF_DIR).collect()
    for r in rows:
        assert abs(r.released_count - r.true_count) <= bound
        assert r.epsilon == 0.5


def test_watermark_planner_buckets_complete_and_sane(spark):
    """Bucket counts per type sum to the events row count; lateness is
    non-negative by construction (running max >= own ts); every type has
    an on-time row (each chunk's first-seen max is its own ts)."""
    rows = QUERIES["ops_watermark_planner"].fn(spark, SF_DIR).collect()
    assert rows
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
    assert all(r.max_late_s >= 0 for r in rows)
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, set()).add(r.lateness_bucket)
    assert all("0_on_time" in v for v in by_type.values())


def test_split_leakage_pairs_are_ordered_and_nonempty(spark):
    """Planted exact twins (+2M ids) guarantee at least one cross-split
    leak; pairs are canonical (split_a < split_b)."""
    rows = QUERIES["data_split_leakage"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.split_a < r.split_b
        assert r.n_leaked_contents > 0


def test_survivorship_bounds_and_dup_mass(spark):
    """Kept <= docs per source; the planted duplicates make the overall
    survival rate strictly < 1; every rate is in (0, 1]."""
    rows = QUERIES["dedup_survivorship_audit"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        assert 0.0 < r.survival_rate <= 1.0
    assert sum(r.n_kept for r in rows) < sum(r.n_docs for r in rows)


def test_classifier_sweep_reconciles_with_calibration(spark):
    """Cumulative keep counts must equal the suffix sums of the
    calibration histogram (same bins), keep_rate is monotone decreasing,
    and the lowest cutoff keeps everything."""
    sweep = sorted(
        QUERIES["llm_classifier_threshold_sweep"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.cutoff_bin,
    )
    calib = QUERIES["llm_quality_calibration"].fn(spark, SF_DIR).collect()
    total = sum(r.n_docs for r in calib)
    assert sweep[0].n_keep == total
    for r in sweep:
        assert r.n_keep == sum(c.n_docs for c in calib if c.logit_bin >= r.cutoff_bin)
        assert 0.0 <= r.gate_agreement <= 1.0
    for lo, hi in zip(sweep, sweep[1:]):
        assert lo.n_keep >= hi.n_keep


def test_scene_segments_partition_frames(spark):
    """Scenes tile each asset's frames: contiguous, disjoint, complete —
    and scene count never exceeds frame count (<= 7 frames/asset)."""
    rows = QUERIES["mm_scene_segments"].fn(spark, SF_DIR).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc, segs in by_doc.items():
        segs.sort(key=lambda r: r.scene_id)
        assert segs[0].start_frame == 0
        for a, b in zip(segs, segs[1:]):
            assert b.start_frame == a.end_frame + 1
        assert all(s.n_frames == s.end_frame - s.start_frame + 1 for s in segs)
        assert sum(s.n_frames for s in segs) <= 7


def test_k_suppression_curve_monotone(spark):
    """Suppression cost is monotone in k and consistent with the
    k-anonymity audit's class sizes."""
    rows = sorted(
        QUERIES["privacy_k_suppression_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [2, 5, 10, 20]
    for lo, hi in zip(rows, rows[1:]):
        assert lo.n_classes_suppressed <= hi.n_classes_suppressed
        assert lo.n_rows_suppressed <= hi.n_rows_suppressed
    ka = QUERIES["privacy_k_anonymity"].fn(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_rows_suppressed == sum(g.grp_n for g in ka if g.grp_n < r.k)
        assert 0.0 <= r.suppressed_row_share <= 1.0


def test_dataset_card_reconciles_with_detail_views(spark):
    """Every card column must equal the standalone audit it reuses."""
    card = {r.source: r for r in QUERIES["llm_dataset_card"].fn(spark, SF_DIR).collect()}
    assert card
    # PII density reconciles exactly (same SQL nested)
    pii = {r.source: r.pii_per_1k_tokens
           for r in QUERIES["privacy_pii_density"].fn(spark, SF_DIR).collect()}
    assert all(card[s].pii_per_1k_tokens == pii[s] for s in card)
    # license keep rate reconciles with web_license_gate's grouped counts
    lic = {}
    for r in QUERIES["web_license_gate"].fn(spark, SF_DIR).collect():
        n_keep, n = lic.get(r.source, (0, 0))
        lic[r.source] = (n_keep + (r.n_docs if r.keep else 0), n + r.n_docs)
    for s in card:
        assert abs(card[s].license_keep_rate - round(lic[s][0] / lic[s][1], 6)) < 1e-9
    # rates bounded, tokens positive
    for r in card.values():
        assert 0.0 <= r.dup_rate <= 1.0 and 0.0 <= r.gopher_keep_rate <= 1.0
        assert r.n_tokens > 0 and r.n_docs > 0


def test_nprobe_curve_monotone(spark):
    """Recall can only improve with more probes; denominators are the
    fixed cohort x k; probing every centroid a query's neighbors live in
    keeps recall in (0, 1]."""
    rows = sorted(
        QUERIES["sim_ann_ivf_nprobe_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 4]
    assert all(r.n_possible == 8 * 5 for r in rows)
    for lo, hi in zip(rows, rows[1:]):
        assert lo.recall_at_k <= hi.recall_at_k
    assert 0.0 < rows[-1].recall_at_k <= 1.0


def test_filtered_topk_respects_predicate(spark):
    """Pre-filter semantics: every neighbor shares its query's category,
    never the query itself, and each query gets its full k (the property
    post-filtering silently violates)."""
    rows = QUERIES["sim_ann_filtered_topk"].fn(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id % 4 == r.query_id % 4
        assert r.neighbor_id != r.query_id
    assert len(by_q) == 8
    for q, rs in by_q.items():
        assert sorted(r.rnk for r in rs) == [1, 2, 3, 4, 5]

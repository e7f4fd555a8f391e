"""Round-6 wave 2 invariants: information-theoretic and metric laws the
oracle hash can't express by itself."""

from __future__ import annotations

from aws_localstack_stream_processing_spark.plans import all_queries

from .conftest import SF_DIR

QUERIES = all_queries()


def test_t_closeness_is_a_distance(spark):
    """Total variation lies in [0, 1]; flags match the threshold; class
    sizes are positive."""
    rows = QUERIES["privacy_t_closeness"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.t_distance <= 1.0
        assert r.exceeds_t == (r.t_distance > 0.25)
        assert r.class_size > 0


def test_kl_mix_nonnegative(spark):
    """KL(p_source || p_corpus) >= 0 for every source (Gibbs); the
    smoothing mass uses the ACTUAL vocab size, which is what makes both
    sides proper distributions (the bug a constant cap introduces)."""
    rows = QUERIES["text_unigram_kl_mix"].fn(spark, SF_DIR).collect()
    assert rows
    # round-12 per-term noise bound: tiny negative epsilon only
    assert all(r.kl_nats >= -1e-9 for r in rows)
    assert all(r.n_vocab_tokens > 0 for r in rows)


def test_mmr_rerank_greedy_laws(spark):
    """Ranks 1..4, distinct docs, pick #1 is the relevance argmax, and
    relevance is non-increasing ONLY for pick 1 vs the candidate max
    (later picks may trade relevance for diversity)."""
    rows = sorted(
        QUERIES["rag_mmr_rerank"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == [1, 2, 3, 4]
    docs = [r.doc_id for r in rows]
    assert len(set(docs)) == 4
    assert rows[0].relevance == max(r.relevance for r in rows)


def test_burn_rate_thresholds_hold(spark):
    """Every emitted alert really breaches both windows, and the alert
    table respects its bound. (sf0.001 is too sparse to clear the 5-event
    volume floor — emptiness there is correct; the driver's sf0.01 check
    sees ~200 alert rows.)"""
    rows = QUERIES["ref_slo_burn_rate"].fn(spark, SF_DIR).collect()
    assert len(rows) <= 200
    for r in rows:
        assert r.burn_1h > 2.0 and r.burn_24h > 1.2
        assert r.n_events >= 5 and r.n_errors <= r.n_events


def test_pair_cosine_hist_complete_partition(spark):
    """All 10 bins present (spine), counts sum to the exact pair count of
    the fixed 32-vector sample."""
    rows = QUERIES["emb_pair_cosine_hist"].fn(spark, SF_DIR).collect()
    assert [r.bin for r in sorted(rows, key=lambda r: r.bin)] == list(range(10))
    assert sum(r.n_pairs for r in rows) == 32 * 31 // 2


def test_cluster_size_hist_accounts_for_all_docs(spark):
    """Σ(size × clusters) must equal the corpus row count (plants incl.)."""
    rows = QUERIES["dedup_cluster_size_hist"].fn(spark, SF_DIR).collect()
    assert rows and all(r.n_docs == r.cluster_size * r.n_clusters for r in rows)
    assert any(r.cluster_size >= 2 for r in rows)  # planted dups visible


def test_epoch_mix_plan_shares_and_budget(spark):
    """Shares sum to ~1, planned tokens never exceed the budget, and a
    source drawn above its size shows epochs > 1000 per-mille."""
    rows = QUERIES["data_epoch_mix_plan"].fn(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    assert sum(r.planned_tokens for r in rows) <= 1_000_000
    assert all(r.epochs_x1000 >= 1 for r in rows)


def test_quality_calibration_rates_bounded_and_informative(spark):
    rows = QUERIES["llm_quality_calibration"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 3  # bins actually resolve the logit range
    assert all(0.0 <= r.gate_pass_rate <= 1.0 for r in rows)
    assert sum(r.n_docs for r in rows) > 0


def test_pii_density_reconciles_with_redact(spark):
    """Σ per-source PII hits must equal the redaction operator's total
    (same patterns, same seeding) — the two views reconcile exactly."""
    dens = QUERIES["privacy_pii_density"].fn(spark, SF_DIR).collect()
    red = QUERIES["text_pii_redact"].fn(spark, SF_DIR).collect()
    assert sum(r.n_pii for r in dens) == sum(r.n_emails + r.n_phones for r in red)

"""Driver-gate budget invariants.

CORRECTNESS_r01.json contained exactly the first 50 REGISTRY entries in
declaration order — the driver compares at most ~50 rows and silently
drops the rest.  Round 1 lost all 14 training-data extension rows that
way.  These tests fail loudly if the registry outgrows the budget or
the driver-facing shim drifts from the registry.
"""

from __future__ import annotations

from cdc_pipeline_with_kafka_spark import queries as q

DRIVER_ROW_BUDGET = 50


def test_registry_fits_driver_budget():
    assert len(q.REGISTRY) <= DRIVER_ROW_BUDGET, (
        f"registry has {len(q.REGISTRY)} entries; the driver compared exactly "
        f"{DRIVER_ROW_BUDGET} in round 1 — merge gates into suites instead of "
        "appending past the budget (see f_scalar_suite et al.)"
    )


# rows-only entries are a DELIBERATE list, not an accident: each name
# here must document in its docstring why no SQL oracle can exist and
# how the gate still fails loudly.  Empty since round 5: pq_recall
# gained a pinned-codebook oracle (the last holdout).
ROWS_ONLY_ALLOWED: set[str] = set()


def test_queries_and_oracles_align():
    names = set(q.queries())
    oracles = set(q.oracle_sql())
    assert oracles <= names
    assert names - oracles == ROWS_ONLY_ALLOWED


def test_driver_shim_exposes_registry():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spark_entry_shim",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert set(mod.queries()) == set(q.queries())
    assert set(mod.oracle_sql()) == set(q.oracle_sql())


def test_every_capability_has_a_gate():
    """The 14 training-data extension capabilities each keep a
    value-level gate row after the suite merge."""
    must_have = {
        "dedup_exact_summary", "dedup_ngram_jaccard3",
        # r5 merges: minhash uni+tri → dedup_minhash_suite,
        # LSH/IVF ANN → sim_ann_suite (all rows keep their own tags)
        "dedup_minhash_suite", "dedup_simhash", "sim_cosine_topk",
        "sim_embedding_neardup_lsh", "sim_ann_suite",
        "text_profile", "multimodal_pipeline", "quality_repetition",
        "decontaminate", "pii_scrub", "semdedup", "corpus_release_suite",
        "f_scalar_suite", "f_value_suite", "a_basic_aggs", "w_alert_rules",
    }  # text_length_stats now rides in curation_suite ('lenstats' rows)
    assert must_have <= set(q.REGISTRY)

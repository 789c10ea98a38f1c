"""Driver-gate ordering invariants.

The driver's correctness runner records only the first ~50 entries of
``queries()`` (observed window in round 2). These tests pin the
properties that keep every oracle-bearing query visible to the gate.
"""

from __future__ import annotations

from usgs_earthquake_data_pipeline_spark.plans.catalog import (
    CATALOG,
    DRIVER_WINDOW_FIRST,
    oracle_map,
    query_map,
)

WINDOW = 50


def test_priority_names_all_exist():
    missing = [n for n in DRIVER_WINDOW_FIRST if n not in CATALOG]
    assert not missing, f"DRIVER_WINDOW_FIRST names not in CATALOG: {missing}"


def test_no_duplicate_priority_names():
    assert len(set(DRIVER_WINDOW_FIRST)) == len(DRIVER_WINDOW_FIRST)


def test_window_contains_only_oracle_checked_entries():
    first = list(query_map())[:WINDOW]
    rows_only = [n for n in first if CATALOG[n].oracle is None]
    assert not rows_only, (
        f"rows-only entries waste driver-window slots: {rows_only}"
    )


def test_rows_only_entries_sort_last():
    names = list(query_map())
    oracle_positions = [i for i, n in enumerate(names) if CATALOG[n].oracle]
    rows_only_positions = [
        i for i, n in enumerate(names) if CATALOG[n].oracle is None
    ]
    assert max(oracle_positions) < min(rows_only_positions)


def test_query_and_oracle_maps_cover_catalog():
    assert set(query_map()) == set(CATALOG)
    assert set(oracle_map()) == {
        n for n, e in CATALOG.items() if e.oracle is not None
    }


def test_round5_backlog_and_promotions_inside_window():
    """Round-5 exit criteria: all 44 oracle entries with no driver row
    in r1-r4 plus the four new bound-gated promotions must sit inside
    the ~50-entry window so each gets its first hard driver row."""
    first = set(list(query_map())[:WINDOW])
    never_checked = {
        "assoc_rules_event_pairs", "ab_test_cuped_adjustment",
        "ab_test_jackknife_buckets", "ab_test_conversion_lift",
        "benford_totalprice_audit", "drift_psi_value_bins",
        "hard_negative_mining", "weighted_sample_by_length",
        "cap_docs_per_source", "new_vs_returning_daily",
        "events_since_last_purchase", "attribution_first_last_touch",
        "dq_quarantine_events", "dq_validate_events",
        "churn_inactive_users", "ewma_daily_value_recursive",
        "scd2_user_type_history", "sliding_window_counts",
        "sketch_approx_topk_types", "bitmap_distinct_users_daily",
        "kfold_assignment", "streaming_full_outer_join",
        "streaming_left_semi_join", "streaming_sliding_rollup",
        "streaming_anti_blocklist", "graph_triangle_count",
        "embedding_norm_stats", "docs_length_histogram",
        "setop_bag_semantics", "session_conversion_rate",
        "markov_event_transitions", "recursive_referral_depth",
        "pipe_syntax_error_hotspots", "try_arithmetic_safety",
        "hof_user_value_trend", "listagg_user_types",
        "agg_mode_median_per_user", "join_null_safe_eq",
        "window_ntile_quartiles", "setop_union_by_name_evolution",
        "map_type_counts", "format_roundtrip_xml_csv",
        "crypto_roundtrip_aes", "fuzzy_part_name_pairs",
    }
    promotions = {
        "sketch_hll_distinct_checked", "sketch_cms_freq_checked",
        "sketch_quantiles_checked", "ann_ivf_fullprobe",
    }
    assert len(never_checked) == 44
    missing = (never_checked | promotions) - first
    assert not missing, f"entries fell out of the driver window: {missing}"

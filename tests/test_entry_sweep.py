"""Sweep-cap insurance (round-3 verdict): the driver oracle-checks only
the FIRST 50 keys of QUERIES in dict order, so 17 round-2/3 entries
silently fell off the sweep. These meta-tests pin the window's contents:
adding an entry now forces an explicit decision about what sits inside
the window and why anything sits outside it."""

from meresco_lucene_spark.entry_queries import ORACLES, QUERIES, _SWEEP_ORDER

SWEEP_CAP = 50


def test_window_is_the_declared_sweep_order():
    assert list(QUERIES)[:SWEEP_CAP] == _SWEEP_ORDER


def test_incremental_and_durable_composed_fully_in_window():
    """The subsystems that shipped round-2/3 without a single oracle row
    must never fall out of the window again."""
    window = set(list(QUERIES)[:SWEEP_CAP])
    assert {k for k in QUERIES if k.startswith("inc_")} <= window
    assert {k for k in QUERIES if k.startswith("seg_cq_")} <= window
    assert {k for k in QUERIES if k.startswith("cdc_")} <= window


def test_every_operator_family_in_window():
    window = list(QUERIES)[:SWEEP_CAP]
    families = [
        "term_bm25", "bool_", "phrase", "prefix", "range", "facet",
        "sort_paginate", "dedup_by_lang", "similar", "suggest",
        "distance", "cql", "matchall", "ingest", "events", "stateful",
        "cdc_", "cq_", "dd_", "ann_", "text_", "seg_", "inc_",
    ]
    for fam in families:
        assert any(fam in k for k in window), f"family {fam!r} not swept"


def test_window_entries_all_have_oracles():
    """Inside the window, every entry must be oracle-checked — a
    rows-only entry would waste a sweep slot."""
    missing = [k for k in list(QUERIES)[:SWEEP_CAP] if k not in ORACLES]
    assert missing == []


# Everything past position 49 gets no driver row, so each exclusion
# needs a reason: rows-only entries keep their guarantees in pytest
# (and would waste an oracle slot), twins share the oracle-checked
# executor code path with an in-window entry. test_entry_oracle.py
# still sweeps ALL entries in CI regardless of this window.
OUT_OF_WINDOW_OK = {
    # rows-only by design (property-tested in pytest; no oracle signal)
    "cluster_top_docs", "dd_simhash", "ann_lsh_top10", "ann_ivf_top10",
    "multimodal_features",
    # strict twins of in-window entries (same executor code path)
    "bool_must_not",   # oracle identical to cql_boolean (in window)
    "facet_on_query",  # facet-restricted-by-query == facet_drilldown path
    "phrase_match", "prefix_docs", "range_numeric", "facet_lang",
    "sort_paginate", "dedup_by_lang", "similar_documents",  # seg_ twins in window
    "seg_bool_must_top10", "seg_bool_should_top10", "seg_bool_must_not",
    "seg_bool_filter_top10",  # bool_* in window; seg path via 14 other seg_ rows
}


def test_out_of_window_is_exactly_the_allowlist():
    assert set(list(QUERIES)[SWEEP_CAP:]) == OUT_OF_WINDOW_OK

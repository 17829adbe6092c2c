"""Sweep-cap insurance (round-3 verdict) + rotation invariant (round-4
verdict #5): the driver oracle-checks only the FIRST 50 keys of QUERIES
in dict order. _SWEEP_BASE pins the even-round window; _TWIN_ROTATION
alternates twin pairs into the odd-round window so every oracle-backed
entry gets a driver oracle row at least every other round. These
meta-tests pin the window machinery: adding an entry forces an explicit
decision about where it sits and why."""

from meresco_lucene_spark.entry_queries import (
    ORACLES,
    QUERIES,
    ROUND_PARITY,
    _SWEEP_BASE,
    _SWEEP_ORDER,
    _TWIN_ROTATION,
    _sweep_order,
)

SWEEP_CAP = 50


def test_window_is_the_declared_sweep_order():
    assert list(QUERIES)[:SWEEP_CAP] == _SWEEP_ORDER
    assert _SWEEP_ORDER == _sweep_order(ROUND_PARITY)
    assert len(_SWEEP_BASE) == SWEEP_CAP


def test_rotation_pairs_are_well_formed():
    """Each pair holds one seat: the even member must sit in the base
    window, the odd member must NOT (it takes the seat on odd rounds),
    and no entry appears in two pairs."""
    evens = [a for a, _ in _TWIN_ROTATION]
    odds = [b for _, b in _TWIN_ROTATION]
    assert len(set(evens)) == len(evens) and len(set(odds)) == len(odds)
    assert not set(evens) & set(odds)
    base = set(_SWEEP_BASE)
    assert set(evens) <= base
    assert not set(odds) & base


def test_incremental_and_cdc_always_in_window():
    """The subsystems that shipped round-2/3 without a single oracle row
    must keep a seat in EVERY round (they rotate with nothing)."""
    for parity in (0, 1):
        window = set(_sweep_order(parity))
        assert {k for k in QUERIES if k.startswith("inc_")} <= window
        assert {k for k in QUERIES if k.startswith("cdc_")} <= window


def test_every_operator_family_in_window_both_parities():
    families = [
        "term_bm25", "bool_", "phrase", "prefix", "range", "facet",
        "sort_paginate", "dedup_by_lang", "similar", "suggest",
        "distance", "cql", "matchall", "ingest", "events", "stateful",
        "cdc_", "cq_", "dd_", "ann_", "text_", "seg_", "inc_",
    ]
    for parity in (0, 1):
        window = _sweep_order(parity)
        for fam in families:
            assert any(fam in k for k in window), (
                f"family {fam!r} not swept at parity {parity}"
            )


def test_window_entries_all_have_oracles_both_parities():
    """Inside the window, every entry must be oracle-checked — a
    rows-only entry would waste a sweep slot."""
    for parity in (0, 1):
        missing = [k for k in _sweep_order(parity) if k not in ORACLES]
        assert missing == [], f"parity {parity}: {missing}"


def test_every_oracle_backed_entry_gets_a_driver_row_every_other_round():
    """The rotation invariant (VERDICT r4 #5): union of the two
    parities' windows covers every oracle-backed entry — nothing
    oracle-checked sits out of the driver sweep forever."""
    union = set(_sweep_order(0)) | set(_sweep_order(1))
    never_swept = [k for k in QUERIES if k in ORACLES and k not in union]
    assert never_swept == []


# Entries outside BOTH parities' windows get no driver row ever, so each
# needs a standing reason. tests/test_entry_oracle.py still sweeps ALL
# entries locally every round regardless.
ALWAYS_OUT_OK = {
    # rows-only by design (property-tested in pytest; no oracle signal)
    "cluster_top_docs", "multimodal_features",
}


def test_always_out_is_exactly_the_allowlist():
    union = set(_sweep_order(0)) | set(_sweep_order(1))
    assert set(QUERIES) - union == ALWAYS_OUT_OK

"""FIRSTGREEN.json contract-bookkeeping tests (VERDICT r13 #3)."""

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "firstgreen",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "firstgreen.py"),
)
fg_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fg_mod)


def test_update_appends_only_new_entries():
    fg = {"q1": {"wall": 1.0, "sf": 0.1, "round": 7,
                 "commit": "abc", "date": "2026-08-01"}}
    added = fg_mod.update(
        fg, {"q1": 9.9, "q2": 2.5, "q3": None}, 0.1, 14, "deadbeef"
    )
    assert added == ["q2"]
    assert fg["q1"]["wall"] == 1.0  # historical fact, never rewritten
    assert fg["q2"] == {"wall": 2.5, "sf": 0.1, "round": 14,
                        "commit": "deadbeef",
                        "date": fg["q2"]["date"]}


def test_update_noop_off_canon_sf():
    fg = {}
    assert fg_mod.update(fg, {"q": 1.0}, 0.01, 14, "x") == []
    assert fg == {}


def test_contract_breach_detection():
    fg = {
        "fast": {"wall": 1.0, "sf": 0.1},
        "slow": {"wall": 1.0, "sf": 0.1},
        "edge": {"wall": 1.0, "sf": 0.1},
    }
    c = fg_mod.contract(
        fg, {"fast": 1.5, "slow": 2.3, "edge": 2.0, "unknown": 9.0}, 0.1
    )
    assert c["breaches"] == ["slow"]  # 2.0 exactly is NOT a breach
    assert c["n_compared"] == 3
    assert c["worst"]["slow"] == 2.3


def test_committed_artifact_consistent_with_history():
    """The committed FIRSTGREEN.json must carry every bench query at
    the canonical sf and the documented r13 base walls."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FIRSTGREEN.json")
    fg = json.load(open(path))
    assert len(fg) >= 190
    assert all(v["sf"] == 0.1 for v in fg.values())
    # the three walls VERDICT r13 derived forensically
    assert fg["unigram_lm_tokenizer_train"]["wall"] == 1.491
    assert fg["sketch_merge_lifecycle"]["wall"] == 0.701
    assert fg["dedup_semantic_cells_capped"]["wall"] == 0.537

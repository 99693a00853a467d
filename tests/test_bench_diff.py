"""bench.py --diff: mechanical branch-level regression flags against a
prior round's bench JSON (any of the three shapes the files take)."""

import json

import bench


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_diff_flags_2x_regressions_above_noise_floor(tmp_path):
    prior = {
        "queries": {"a": 1.0, "b": 0.5},
        "branch_s": {"s.x": 0.2, "s.y": 0.01},
    }
    now_branch = {"s.x": 0.5, "s.y": 0.04, "s.z": 0.1}
    now_q = {"a": 1.1, "b": 2.0}
    for shape in (
        prior,                                   # raw one-line output
        {"n": 1, "parsed": prior},               # driver wrapper, parsed
        {"n": 1, "parsed": None,
         "tail": json.dumps(prior)},             # wrapper, tail only
    ):
        d = bench._diff_branches(
            _write(tmp_path, "p.json", shape), now_branch, now_q
        )
        # s.x: 0.2 -> 0.5 (2.5x, above the 0.05s floor) flagged;
        # s.y: 4x but under the floor -> noise, NOT flagged
        assert list(d["branch_s"]["regressed"]) == ["s.x"]
        assert d["branch_s"]["regressed"]["s.x"]["ratio"] == 2.5
        assert d["branch_s"]["new"] == ["s.z"]
        assert list(d["queries"]["regressed"]) == ["b"]
        assert d["queries"]["removed"] == []


def test_diff_truncated_tail_fails_soft(tmp_path):
    p = _write(
        tmp_path, "t.json",
        {"n": 1, "parsed": None, "tail": '{"queries": {"a"'},
    )
    d = bench._diff_branches(p, {}, {})
    assert "error" in d and "truncation" in d["error"]

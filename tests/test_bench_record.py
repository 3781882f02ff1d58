"""The bench -> driver record pipeline (VERDICT r5 ask 1).

Round 5's official bench artifact was lost twice over: the printed
JSON line outgrew the driver's capture (parsed:null), and the next
bench run then crashed reading that parsed:null artifact.  These tests
pin both fixes without starting Spark.
"""

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _load_bench():
    # bench.py imports __spark_entry__ at module level, which is heavy
    # but Spark-free; load it once per test session.
    if "bench" in sys.modules:
        return sys.modules["bench"]
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, REPO)
    spec.loader.exec_module(mod)
    sys.modules["bench"] = mod
    return mod


def test_like_for_like_survives_parsed_null(tmp_path):
    """A BENCH_r*.json with "parsed": null (a round whose output the
    driver could not capture) must yield None, not AttributeError —
    the exact crash that killed the r5 bonus bench (bench.py:504)."""
    bench = _load_bench()
    (tmp_path / "BENCH_r05.json").write_text(json.dumps({"parsed": None, "rc": 1}))
    assert bench.like_for_like_vs_prev({"q": 1.0}, bench_dir=str(tmp_path)) is None


def test_like_for_like_picks_newest_valid_and_compares(tmp_path):
    bench = _load_bench()
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 1.0, "b": 2.0}}})
    )
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 2.0, "b": 3.0, "c": 9.0}}})
    )
    out = bench.like_for_like_vs_prev({"a": 1.5, "b": 2.5, "d": 7.0}, bench_dir=str(tmp_path))
    assert out == {
        "prev_file": "BENCH_r05.json",
        "n_shared": 2,
        "current_sec": 4.0,
        "prev_sec": 5.0,
    }


def test_like_for_like_empty_queries_returns_none(tmp_path):
    bench = _load_bench()
    (tmp_path / "BENCH_r05.json").write_text(json.dumps({"parsed": {"queries": {}}}))
    assert bench.like_for_like_vs_prev({"q": 1.0}, bench_dir=str(tmp_path)) is None


def test_repo_bench_glob_resolves_past_the_null_r05_artifact():
    """In the real repo the newest BENCH_r*.json by name must carry a
    non-null parsed.queries so the ROUND-START bench.py (which the
    driver replays) does not crash: BENCH_r05.json is parsed:null and
    frozen, so BENCH_r05b.json (sorts after it) reconstructs the lost
    r5 baseline."""
    import glob

    files = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    newest = files[-1]
    with open(newest) as fh:
        parsed = json.load(fh).get("parsed")
    assert isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict)


def test_sf1_summary_stays_driver_capturable():
    """BENCH_SF1.json is embedded verbatim into the printed bench line
    by the round-start bench.py; it must stay a compact summary (the
    58 KB r5 version overflowed the driver's capture)."""
    path = os.path.join(REPO, "BENCH_SF1.json")
    assert os.path.getsize(path) < 4096
    with open(path) as fh:
        d = json.load(fh)
    assert "queries" not in d  # per-query detail lives in BENCH_SF1_DETAIL.json
    assert os.path.exists(os.path.join(REPO, "BENCH_SF1_DETAIL.json"))

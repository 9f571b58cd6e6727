"""Published == measured (VERDICT r3 #3): the headline block in
benchmarks/RESULTS.md is generated from the pooled bench runs, and the
published range must contain the most recent driver-captured
BENCH_r*.json value. Three rounds of hand-published ranges drifted
above the driver's number; this pins the fix."""

import glob
import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))


def _parse_x_range(cell):
    """Parse '**73.2–107.2x**' or '107.2x' → (lo, hi). Only the hi
    bound carries the x suffix in a rendered range."""
    m = re.search(r"(\d+(?:\.\d+)?)(?:–(\d+(?:\.\d+)?))?x", cell)
    assert m, cell
    lo = float(m.group(1))
    hi = float(m.group(2)) if m.group(2) else lo
    return lo, hi


def _driver_records():
    import update_results

    recs = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            rec = json.load(f)
        if (rec.get("rc") == 0 and isinstance(rec.get("parsed"), dict)
                and rec["parsed"].get("metric") == update_results.METRIC):
            recs.append((path, rec["parsed"]))
    return recs


def test_pool_contains_every_driver_value():
    """update_results' pool must include each driver-captured value, so
    the generated min/max range contains them by construction."""
    import update_results

    drivers = _driver_records()
    if not drivers:
        pytest.skip("no driver-captured BENCH_r*.json yet")
    ranges = update_results.compute_ranges(update_results.load_records())
    assert ranges["rtf_on"] is not None
    lo, hi, _ = ranges["rtf_on"]
    for path, parsed in drivers:
        assert lo <= parsed["value"] <= hi, (path, parsed["value"], lo, hi)


def test_results_md_block_is_current():
    """The committed RESULTS.md block must equal what update_results
    renders from the committed pool (i.e. nobody hand-edited the
    headline or forgot to regenerate after adding runs)."""
    import update_results

    with open(update_results.RESULTS) as f:
        text = f.read()
    m = re.search(re.escape(update_results.BEGIN) + r"(.*?)"
                  + re.escape(update_results.END), text, re.S)
    assert m, "RESULTS.md lost the generated-headline markers"
    published = m.group(0).strip()
    records = update_results.load_records()
    if not records:
        pytest.skip("no bench runs recorded yet")
    expected = update_results.render(
        update_results.compute_ranges(records)).strip()
    assert published == expected, (
        "RESULTS.md headline block is stale — run "
        "`python benchmarks/update_results.py` (bench.py does this "
        "automatically on full-config TPU runs)")


def test_published_range_contains_latest_driver_value():
    import update_results

    drivers = _driver_records()
    if not drivers:
        pytest.skip("no driver-captured BENCH_r*.json yet")
    latest = drivers[-1][1]["value"]
    with open(update_results.RESULTS) as f:
        text = f.read()
    m = re.search(re.escape(update_results.BEGIN) + r"(.*?)"
                  + re.escape(update_results.END), text, re.S)
    assert m
    row = [ln for ln in m.group(1).splitlines()
           if "retrieval ON" in ln]
    assert row, "headline row missing — regenerate RESULTS.md"
    # Parse only the "Measured range" cell — the "vs reference" ratio
    # column also contains x-suffixed numbers (ADVICE r4) and would make
    # the low-side containment check near-vacuous.
    cells = [c.strip() for c in row[0].split("|")]
    assert len(cells) >= 3, row
    measured_cell = cells[2]
    lo, hi = _parse_x_range(measured_cell)
    assert lo <= latest <= hi, (latest, measured_cell)


def test_driver_capture_of_own_session_is_deduped(tmp_path, monkeypatch):
    """Simulate the exact driver sequence that broke r4: bench.py
    appends its session to bench_history.jsonl, then the driver records
    the SAME run's parsed line as BENCH_r{N}.json. The pool must count
    it once, and the rendered range must contain the full-precision
    value despite display rounding."""
    import update_results

    parsed = {"metric": update_results.METRIC, "value": 107.11,
              "unit": "x_realtime", "index_off_rtf": 114.73,
              "device_ms_per_clip": 65.6}
    history = tmp_path / "bench_history.jsonl"
    with open(history, "w") as f:
        f.write(json.dumps(parsed) + "\n")
        # a second, distinct session
        f.write(json.dumps(parsed | {"value": 97.48,
                                     "device_ms_per_clip": 75.1}) + "\n")
        # a different-metric legacy line must NOT pollute the pool
        f.write(json.dumps({"metric": "other_metric", "value": 1.0}) + "\n")
    with open(tmp_path / "BENCH_r99.json", "w") as f:
        json.dump({"rc": 0, "parsed": parsed}, f)
    monkeypatch.setattr(update_results, "HISTORY", str(history))
    monkeypatch.setattr(update_results, "REPO", str(tmp_path))

    records = update_results.load_records()
    assert len(records) == 2, records
    ranges = update_results.compute_ranges(records)
    assert ranges["rtf_on"] == (97.48, 107.11, 2)
    block = update_results.render(ranges)
    row = [ln for ln in block.splitlines() if "retrieval ON" in ln][0]
    cell = [c.strip() for c in row.split("|")][2]
    lo, hi = _parse_x_range(cell)
    # outward rounding: the displayed range contains 107.11
    assert lo <= 97.48 and 107.11 <= hi, cell


def test_distinct_driver_capture_still_pools(tmp_path, monkeypatch):
    """A driver BENCH file from a DIFFERENT session (no matching history
    line) must still enter the pool — dedupe must not hide real runs."""
    import update_results

    history = tmp_path / "bench_history.jsonl"
    with open(history, "w") as f:
        f.write(json.dumps({"metric": update_results.METRIC,
                            "value": 97.48,
                            "device_ms_per_clip": 75.1}) + "\n")
    with open(tmp_path / "BENCH_r99.json", "w") as f:
        json.dump({"rc": 0, "parsed": {
            "metric": update_results.METRIC, "value": 103.25,
            "device_ms_per_clip": 65.8}}, f)
    monkeypatch.setattr(update_results, "HISTORY", str(history))
    monkeypatch.setattr(update_results, "REPO", str(tmp_path))
    records = update_results.load_records()
    assert len(records) == 2, records

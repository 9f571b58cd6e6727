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
    nums = [float(x) for x in re.findall(r"(\d+(?:\.\d+)?)x", row[0])]
    assert nums, row
    lo, hi = min(nums), max(nums)
    assert lo <= latest <= hi, (latest, row[0])

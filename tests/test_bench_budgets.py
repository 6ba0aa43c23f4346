"""Budget-check model tests (round-7 verdict item 1).

The round-6 budget check scaled whole budgets linearly by the CPU-calib
ratio; on a 26%-faster driver host that produced 37 violations on an
unchanged tree, every one false (raw-ratio median 1.06x). These tests
pin the fixed model's done-criteria from the verdict:

* a host whose calib is anywhere within +-35% of the pin reports ZERO
  violations on an unchanged tree (timings = the overhead + scaled
  compute the host would actually produce, plus realistic min-of-3
  noise up to the observed 1.64x on one sub-second query);
* an artificially slowed query still trips.

No SparkSession needed — check_budgets is pure arithmetic over the
pinned JSON.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from bench import check_budgets  # noqa: E402

PIN_PATH = os.path.join(ROOT, "tools", "bench_budgets.json")


def _pinned() -> dict:
    with open(PIN_PATH) as fh:
        return json.load(fh)


def _host_timings(pinned: dict, calib_ratio: float) -> dict[str, float]:
    """What an unchanged tree actually measures on a host whose
    single-thread speed differs by ``calib_ratio``: the per-job
    scheduling floor is constant; only compute scales."""
    overhead = pinned.get("overhead_sec") or min(pinned["budgets"].values())
    return {
        name: overhead + calib_ratio * max(0.0, b - overhead)
        for name, b in pinned["budgets"].items()
    }


def test_pin_file_has_overhead() -> None:
    pinned = _pinned()
    assert "overhead_sec" in pinned
    assert 0 < pinned["overhead_sec"] <= min(pinned["budgets"].values())


def test_faster_host_unchanged_tree_zero_violations() -> None:
    """The exact r7 failure mode: driver calib 26% below the pin."""
    pinned = _pinned()
    base = pinned["cpu_calib_sec"]
    for ratio in (0.65, 0.74, 1.0, 1.35):
        timings = _host_timings(pinned, ratio)
        res = check_budgets(timings, calib=base * ratio, pinned=pinned)
        assert res["status"] == "checked"
        assert res["violations"] == 0, (ratio, res["violating"])


def test_observed_noise_on_subsecond_query_not_flagged() -> None:
    """Min-of-3 noise observed on the driver host: one sub-second query
    at 1.64x of its pinned median on an unchanged tree."""
    pinned = _pinned()
    timings = _host_timings(pinned, 0.74)
    # the noisiest observed case was a ~0.6 s query at 1.64x raw
    victim = min(
        (n for n, b in pinned["budgets"].items() if b >= 0.5),
        key=lambda n: pinned["budgets"][n],
    )
    timings[victim] = 1.64 * pinned["budgets"][victim]
    res = check_budgets(
        timings, calib=pinned["cpu_calib_sec"] * 0.74, pinned=pinned
    )
    assert res["violations"] == 0, res["violating"]


def test_artificially_slowed_query_still_trips() -> None:
    pinned = _pinned()
    for ratio in (0.74, 1.0, 1.35):
        timings = _host_timings(pinned, ratio)
        slow = max(pinned["budgets"], key=lambda n: pinned["budgets"][n])
        timings[slow] = 3.0 * pinned["budgets"][slow] + 2.0
        res = check_budgets(
            timings, calib=pinned["cpu_calib_sec"] * ratio, pinned=pinned
        )
        assert res["violations"] == 1, (ratio, res)
        assert slow in res["violating"]


def test_report_carries_raw_and_model_ratios() -> None:
    pinned = _pinned()
    timings = _host_timings(pinned, 1.0)
    res = check_budgets(timings, calib=pinned["cpu_calib_sec"], pinned=pinned)
    assert res["raw_ratio_median"] is not None
    assert res["raw_ratio_max"] is not None
    assert res["calib_scale"] >= 0.9  # floored

"""Single-ego latency gate (VERDICT r4 #7).

bench.py's extras pass measures the single-ego synchronous tick from a
DEVICE trace and records it in artifacts/bench_extras.json with an
explicit `within_carla_50ms_budget` verdict (the reference deployment
budget: 20 Hz, /root/reference/config.yaml:4).  This test pins the
committed builder-measured extras so a throughput win cannot silently
regress deployment latency past the budget — the bench JSON line alone
only carries throughput.
"""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(__file__), "..",
                   "artifacts", "bench_extras.json")


@pytest.mark.skipif(not os.path.exists(ART),
                    reason="bench extras not generated on this machine")
def test_single_ego_latency_within_carla_budget():
    with open(ART) as f:
        extras = json.load(f)
    dev_ms = extras.get("p50_single_ego_device_ms")
    if dev_ms is None:
        pytest.skip("extras run skipped the single-ego trace")
    assert extras.get("within_carla_50ms_budget") is True, extras
    assert 0 < dev_ms < 50.0, dev_ms

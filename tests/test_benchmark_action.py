"""Benchmark-action pipeline tests (jnp-vs-pallas pair + phase trees).

Round-2 verdict: the Benchmark branch of the tasks and measure_phases were
untested in the suite.  These run the full dispatch at smoke size on the
CPU lane (pallas kernels in interpreter mode).  Reference roles:
held_suarez.py:314-377 (benchmark matrix) and aquaplanet.py:99-178
(action-branched validation vs benchmark).
"""
import json
import os

import numpy as np
import pytest

from geosongpu_tpu.harness.task import dispatch


@pytest.mark.slow
def test_held_suarez_benchmark_action(tmp_path):
    env = dispatch("held_suarez_bench_smoke", "Benchmark",
                   artifact_directory=str(tmp_path / "art"),
                   workspace=str(tmp_path / "ws"))
    records = env.get("hs.records")
    assert len(records) == 2
    backends = {r.backend.split(":")[-1] for r in records}
    assert backends == {"jnp", "pallas"}
    for r in records:
        assert r.phase_tree and "phases_ms" in r.phase_tree
        assert r.phase_tree["full_step_ms"] > 0
    # jnp path gets the substep stage split; tracer leaf present for both
    jnp_rec = next(r for r in records if r.backend.endswith("jnp"))
    assert any(k.startswith("substep:")
               for k in jnp_rec.phase_tree["phases_ms"])
    assert (tmp_path / "art" / "report_benchmark.out").exists()


@pytest.mark.slow
def test_aquaplanet_benchmark_action(tmp_path):
    env = dispatch("aquaplanet_bench_smoke", "Benchmark",
                   artifact_directory=str(tmp_path / "art"),
                   workspace=str(tmp_path / "ws"))
    records = env.get("aq.records")
    assert len(records) == 2
    assert {r.backend.split(":")[-1] for r in records} == {"jnp", "pallas"}
    for r in records:
        assert r.phase_tree and r.phase_tree["full_step_ms"] > 0
        # the moist physics chain is its own measured leaf
        assert "forcing/physics" in r.phase_tree["phases_ms"]
    assert (tmp_path / "art" / "report_benchmark.out").exists()


def test_aquaplanet_validation_action(tmp_path):
    env = dispatch("aquaplanet_bench_smoke", "Validation",
                   artifact_directory=str(tmp_path / "art"),
                   workspace=str(tmp_path / "ws"))
    records = env.get("aq.records")
    assert len(records) == 1
    assert records[0].phase_tree is None

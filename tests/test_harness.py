"""Harness + observability subsystem tests (the reference had none of
these: SURVEY.md SS4 'no unit tests for parser/report/hws analysis')."""
import json
import os

import numpy as np
import pytest

from geosongpu_tpu.benchmark.timing import BenchmarkRecord, compare, report
from geosongpu_tpu.harness.exceptions import CICheckException
from geosongpu_tpu.harness.registry import Registry
from geosongpu_tpu.harness.task import PipelineAction, dispatch, get_config


def test_registry_roundtrip():
    @Registry.register
    class _TestTaskXyz:
        pass

    assert Registry.get("_TestTaskXyz") is _TestTaskXyz
    with pytest.raises(KeyError):
        Registry.get("definitely_not_registered")


def test_experiment_lookup():
    cfg = get_config("held_suarez_c12")
    assert cfg["tasks"] == ["HeldSuarez"]
    with pytest.raises(KeyError):
        get_config("nope")


def test_heartbeat_dispatch(tmp_path):
    env = dispatch("ci-heartbeat", PipelineAction.All,
                   artifact_directory=str(tmp_path / "art"),
                   workspace=str(tmp_path / "ws"))
    assert os.path.isfile(tmp_path / "ws" / "ci_metadata")
    assert os.path.isfile(tmp_path / "art" / "ci_metadata")


def test_benchmark_record_roundtrip(tmp_path):
    rec = BenchmarkRecord(experiment="x", backend="cpu",
                          grid={"npx": 48, "npz": 32},
                          step_time_s=[0.1, 0.2, 0.15])
    assert rec.median_step_s == 0.15
    assert rec.grid_points == 6 * 48 * 48 * 32
    p = str(tmp_path / "r.json")
    rec.save(p)
    back = BenchmarkRecord.load(p)
    assert back.median_step_s == rec.median_step_s
    txt = report([rec, back])
    assert "median step" in txt
    c = compare(rec, back)
    assert abs(c["speedup_total_run"] - 1.0) < 1e-9


def test_hws_sampler_and_energy(tmp_path):
    from geosongpu_tpu.hws.analysis import energy_envelope, load_data
    from geosongpu_tpu.hws.server import Sampler

    s = Sampler(rate_s=0.01)
    for _ in range(20):
        s.sample_once()
    s.tick()
    path = s.dump(str(tmp_path))
    data = load_data(path)
    assert len(data["cpu_psu"]) == 20
    rep = energy_envelope(data)
    assert rep.cpu_joules > 0
    assert rep.total_kwh >= rep.cpu_kwh


def test_validation_analysis(tmp_path):
    from geosongpu_tpu.validation.analysis import analysis, check_tolerance

    rng = np.random.default_rng(0)
    a = {"t": rng.standard_normal((6, 8, 8)).astype(np.float32)}
    b = {"t": a["t"] + 1e-6}
    rep = analysis(a, b, "t")
    assert rep.rel_rms < 1e-4
    assert check_tolerance(a, b, ["t"], rel_tol=1e-4)
    bad = {"t": a["t"] + 0.5}
    assert not check_tolerance(a, bad, ["t"], rel_tol=1e-4)


def test_plot_field(tmp_path):
    from geosongpu_tpu.plots.plot_field import plot

    a = np.random.default_rng(0).standard_normal((6, 8, 8, 4))
    out = plot(a, "testvar", out_png=str(tmp_path / "f.png"))
    assert os.path.isfile(out)
    out2 = plot(a, "testvar", diff_with=a, out_png=str(tmp_path / "d.png"))
    assert os.path.isfile(out2)


def test_run_status():
    from geosongpu_tpu.validation.run_status import capture

    st = capture({"a": 1}, repo_dir="/root/repo")
    assert st.git_sha and len(st.git_sha) >= 7
    st2 = capture({"a": 1}, repo_dir="/root/repo")
    assert st.config_hash == st2.config_hash


def test_sharded_experiment_dispatch(tmp_path):
    """MeshConfig is honored by the pipeline: the held_suarez_c16_sharded
    experiment declares a (2, 4) faces-local mesh and dispatch must run it
    SPMD over the 8 virtual devices end-to-end - the layout is part of the
    experiment, as in the reference's per-resolution rank layouts
    (/root/reference/src/tcn/ci/pipeline/held_suarez.py:272-377)."""
    env = dispatch("held_suarez_c16_sharded", PipelineAction.Validation,
                   artifact_directory=str(tmp_path / "art"),
                   workspace=str(tmp_path / "ws"))
    rec = env.get("hs.record")
    assert rec.extra["mesh"] == "subtile faces-local (2,4), 8 devices"
    # gates ran on the recovered global state
    state = env.get("hs.final_state")
    assert np.asarray(state.u).shape[0] == 6
    assert np.isfinite(np.asarray(state.u)).all()


def test_hws_busy_probe_dips_when_idle():
    """The round-3 verdict: TPU 'power' was a memory-in-use boolean that
    never dipped.  The queue-probe duty estimate must read ~0 on an idle
    device and rise while work is in flight."""
    import jax
    import jax.numpy as jnp

    from geosongpu_tpu.hws.server import Sampler

    s = Sampler(rate_s=0.005)
    for _ in range(5):
        s.sample_once()           # idle
    idle = float(np.mean(s.data["tpu_busy"][-4:]))
    assert idle < 0.25, s.data["tpu_busy"]

    # keep the device busy with chained largeish matmuls, sample mid-flight
    x = jnp.ones((1500, 1500), jnp.float32)
    f = jax.jit(lambda a: a @ a / 1500.0)
    y = f(x)
    jax.block_until_ready(y)
    busy_samples = []
    for _ in range(6):
        for _ in range(25):
            y = f(y)              # queue async work
        s.sample_once()           # probe queues behind it
        busy_samples.append(s.data["tpu_busy"][-1])
    jax.block_until_ready(y)
    assert max(busy_samples) > 2.0 * max(idle, 0.02), (idle, busy_samples)
    # and it dips again once the queue drains
    for _ in range(3):
        s.sample_once()
    assert s.data["tpu_busy"][-1] < 0.5 * max(busy_samples), (
        busy_samples, s.data["tpu_busy"][-3:])

"""Replay / viewer-smoke coverage (reference src/sim/mujoco_viewer.py)."""

import json

import numpy as np
import pytest


@pytest.fixture()
def tiny_run(tmp_path):
    from ffmpc_tpu.core import KEYFRAMES
    q0 = np.asarray(KEYFRAMES["neutral"])
    T = 8
    qs = np.tile(q0, (T, 1))
    qs[:, 0] += np.linspace(0.0, 0.05, T)   # visible joint-1 sweep
    np.savez(tmp_path / "data.npz", t=np.linspace(0, 0.035, T), q=qs)
    (tmp_path / "meta.json").write_text(
        json.dumps({"scenario_tilt_deg": 5.0}))
    return tmp_path


def test_load_run_and_scene(tiny_run):
    from ffmpc_tpu.run.replay import load_run, _make_scene
    t, q, meta = load_run(tiny_run)
    assert t.shape == (8,) and q.shape == (8, 7)
    sim = _make_scene(meta)          # re-applies the recorded 5-deg tilt
    import mujoco
    bid = mujoco.mj_name2id(sim.model, mujoco.mjtObj.mjOBJ_BODY, "table")
    quat = sim.model.body_quat[bid]
    assert abs(float(quat[0]) - 1.0) > 1e-5   # tilt actually applied


def test_offscreen_replay_writes_frames(tiny_run):
    from ffmpc_tpu.run.replay import load_run, _make_scene, replay_offscreen
    t, q, meta = load_run(tiny_run)
    sim = _make_scene(meta)
    files = replay_offscreen(t, q, sim, tiny_run / "frames", every=4)
    assert len(files) == 2
    assert all(f.exists() and f.stat().st_size > 0 for f in files)


def test_viewer_smoke_headless():
    from ffmpc_tpu.run.replay import viewer_smoke
    viewer_smoke(duration=0.25, use_viewer=False)

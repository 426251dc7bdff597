"""Closed-loop device-plant fidelity vs the host MuJoCo arbiter
(VERDICT r2 item 6).

Fixture: tests/fixtures/host_ff_flat_replay.npz — a recorded host
force-feedback flat benchmark episode (1.6 s: pre/approach then pressed
circle tracking), produced by
  python -m tools.fidelity_device_plant --time 1.6 --save-fixture ...
containing the per-tick applied torques and the host plant's resulting
q / ee / fn telemetry.

The test replays the exact torque sequence through sim/device_plant.py
(same 1 kHz / 5-substep stepping) and asserts the device plant's
trajectory stays within stated bounds of the MuJoCo arbiter — the
open-loop comparison isolates PLANT fidelity from controller differences,
and bounds are the measured round-3 divergence with ~3x headroom
(RESULTS.md fidelity table: dee@1s 0.13 mm, contact-phase |dfn| 0.5 N)."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

FIXTURE = Path(__file__).parent / "fixtures" / "host_ff_flat_replay.npz"


@pytest.mark.parametrize("dtype_name", ["f64", "f32"])
def test_replay_matches_host(dtype_name):
    if not FIXTURE.exists():
        pytest.skip("fixture not generated")
    from ffmpc_tpu.core import make_panda_model, KEYFRAMES
    from ffmpc_tpu.sim.device_plant import (plant_step, init_plant_state,
                                            make_table_params)
    rec = {k: np.asarray(v) for k, v in np.load(FIXTURE).items()}
    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    model = make_panda_model("plant", dtype=dtype)
    table = make_table_params(0.0, dtype=dtype)
    taus = jnp.asarray(rec["tau"], dtype)

    def roll(q0):
        st0 = init_plant_state(jnp.asarray(q0, dtype), dtype=dtype)

        def step(st, tau):
            st2, obs = plant_step(model, table, st, tau,
                                  timestep=0.001, n_substeps=5)
            return st2, (obs.q, obs.ee_pos, obs.f_contact_normal)
        _, out = jax.lax.scan(step, st0, taus)
        return out

    qs, ees, fns = map(np.asarray, jax.jit(roll)(
        np.asarray(KEYFRAMES["neutral"])))

    t = rec["t"]
    dee = np.linalg.norm(ees - rec["ee"], axis=1)
    dq = np.abs(qs - rec["q"]).max(axis=1)
    contact = t >= 0.9

    i1 = min(int(1.0 / 0.005), len(dee) - 1)
    assert dee[i1] < 1.0e-3, dee[i1]            # < 1 mm EE divergence @1s
    assert dq[i1] < 0.01, dq[i1]                # < 0.01 rad joints @1s
    # contact-phase force agreement (mean |dfn| measured ~0.5 N)
    dfn = np.abs(fns - rec["fn"])[contact]
    assert dfn.mean() < 2.0, dfn.mean()
    # whole-episode EE divergence stays bounded (no trajectory split)
    assert dee.max() < 5.0e-3, dee.max()

"""point3d contact + friction-cone cost, end-to-end in a closed loop.

VERDICT round-1 gap: the friction-cone residual (nf=4 outer pyramid,
reference crocoddyl_classical.py point3d branch) was FD-tested but never
exercised closed-loop with a nonzero weight.  This runs the on-device
plant loop with contact engaged and checks (a) telemetry stays finite
with normal force developed, and (b) the cone cost is *live*: changing
w_friction_cone changes the applied torques once in contact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.core import make_panda_model, KEYFRAMES
from ffmpc_tpu.ocp.weights import OCPWeights
from ffmpc_tpu.solver.fddp import FDDPSettings
from ffmpc_tpu.sim.device_plant import make_table_params
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
from ffmpc_tpu.run.batch_runner import make_episode_fn, EpisodeConfig

Z_C = 0.342
N_TICKS = 70


def _episode(w_cone: float):
    dtype = jnp.float64
    model = make_panda_model("plant", dtype=dtype)
    W = OCPWeights(
        dt_ocp=0.01, w_ee_pos=1.2e3, w_plane_z=9.0e2, w_vz=3.0e2,
        w_tangent_pos=3.6e3, w_tangent_vel=1.2e3,
        contact_gains=(145.0, 85.0), fn_des=22.0, w_fn=3.0e1,
        w_unilateral=3.0e1, z_press=0.0065,
        contact_model="point3d", w_friction_cone=w_cone, mu=0.6)
    settings = FDDPSettings(max_iters=3, use_box=True)
    # fast approach so contact engages within the short episode
    traj = ApproachCircleTraj(
        center=(-0.5, 0.0, Z_C), radius=0.10, omega=1.5, z_contact=Z_C,
        t_approach=0.12, z_pre=Z_C + 0.02, t_pre=0.06,
        ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.04)
    table = make_table_params(0.0, dtype=dtype)
    q0 = np.asarray(KEYFRAMES["neutral"])
    ep = EpisodeConfig(controller="classical", horizon=8, n_ticks=N_TICKS)
    episode = jax.jit(make_episode_fn(model, W, settings, traj, table, ep,
                                      q0, dtype=dtype))
    return episode(jnp.asarray(q0, dtype))


@pytest.fixture(scope="module")
def telem_pair():
    return _episode(0.0), _episode(3.0e2)


def test_point3d_cone_episode_finite_and_in_contact(telem_pair):
    _, telem = telem_pair
    q = np.asarray(telem["q"])
    fn = np.asarray(telem["fn_meas"])
    assert np.all(np.isfinite(q))
    assert np.all(np.isfinite(np.asarray(telem["tau_cmd"])))
    # contact developed and held at the end of the episode
    assert fn[-5:].min() > 1.0, f"no contact force: tail={fn[-5:]}"


def test_friction_cone_cost_is_live(telem_pair):
    telem0, telem_w = telem_pair
    tau0 = np.asarray(telem0["tau_cmd"])
    tau_w = np.asarray(telem_w["tau_cmd"])
    # identical before contact could engage, different once it has
    dmax = np.max(np.abs(tau0 - tau_w), axis=1)
    assert dmax[-10:].max() > 1e-6, (
        "w_friction_cone had no closed-loop effect; cone cost path dead")

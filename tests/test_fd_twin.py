"""FD-twin derivative mode (deriv_mode="oracle_fd") vs the C++ oracle.

The twin runs the oracle's exact central-difference scheme
(native/ffmpc_oracle.cpp:609-695, h=1e-5) inside the JAX knot, so the FD
truncation error is SHARED between the two implementations: agreement here
is limited only by f64 op-ordering noise amplified by 1/(2h) — orders of
magnitude below the analytic-vs-FD scale.  This underpins the FD-twin
parity study (tools/parity_iterates.py --deriv fd) that demonstrates the
classical contact-phase solver divergences are derivative-noise ties.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.ocp.weights import OCPWeights, make_problem_refs
from ffmpc_tpu.ocp.action import make_classical_knot
from ffmpc_tpu.mpc.controllers import make_vertical_down_R
from ffmpc_tpu.utils.native import oracle_weights_flat, oracle_knot_diff


def test_fd_twin_matches_oracle_free():
    model = make_panda_model("plant", dtype=jnp.float64)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_ee_ori=5.0e1,
                   ori_weights=(2.4, 2.4, 0.3), w_posture=1.5e-1, w_v=8.0e-2,
                   w_q_soft_limits=8.0, q_soft_limit_margin=0.05,
                   w_tau=8.0e-4, w_tau_soft_limits=2.0,
                   w_wdamp=6.0e1, w_wdamp_weights=(1.8, 1.8, 0.3))
    wf = oracle_weights_flat(W, model)
    R_des = np.asarray(make_vertical_down_R(), float)
    rng = np.random.default_rng(3)
    q0 = np.asarray(KEYFRAMES["neutral"])
    x_reg = np.concatenate([q0, np.zeros(7)])
    tau_ref = np.asarray(gravity_torque(model, jnp.asarray(q0)))

    knot = make_classical_knot(model, W, surface=False,
                               deriv_mode="oracle_fd", calc_mode="vector")
    dj = jax.jit(knot.diff)

    q = q0 + 0.1 * rng.normal(size=7)
    v = 0.3 * rng.normal(size=7)
    u = tau_ref + 2.0 * rng.normal(size=7)
    x = np.concatenate([q, v])
    p_ref = np.array([-0.45, 0.05, 0.345])
    v_ref = 0.05 * rng.normal(size=3)
    refs = make_problem_refs(p_ref, v_ref, x_reg, tau_ref, R_des,
                             dtype=jnp.float64)
    D = dj(refs, jnp.asarray(x), jnp.asarray(u))
    Do = oracle_knot_diff(wf, np.concatenate([p_ref, v_ref]), x_reg, tau_ref,
                          R_des.ravel(), False, False, x, u)
    for name in ("Fx", "Fu", "Lx", "Lu", "Lxx", "Lxu", "Luu"):
        got = np.asarray(getattr(D, name))
        o = Do[name]
        scale = max(float(np.abs(o).max()), 1.0)
        # shared truncation error: only f64 rounding noise remains —
        # far inside the ~1e-5 analytic-vs-FD scale
        assert np.abs(got - o).max() / scale < 1e-6, name

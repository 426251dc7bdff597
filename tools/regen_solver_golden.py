"""Regenerate tests/fixtures/solver_golden.npz.

Run deliberately (never from CI) when solver semantics change on purpose;
note the regeneration in the commit message.  Records the solver's control
sequence + cost on three fixed problems, for BOTH knot calc modes ("scalar"
is the production TPU path, "vector" the readable oracle) — the two differ
by accumulation-order roundoff that the stiff contact case amplifies through
line-search acceptance into ~1e-2 Nm iterate differences (both valid).

Usage: python tools/regen_solver_golden.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp

from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
from ffmpc_tpu.ocp.weights import OCPWeights
from ffmpc_tpu.ocp.action import make_classical_knot, make_augmented_knot
from ffmpc_tpu.ocp.problem import build_problem_refs
from ffmpc_tpu.solver.fddp import solve, FDDPSettings
from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj
from ffmpc_tpu.mpc.controllers import make_vertical_down_R

OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "solver_golden.npz"


def main():
    model = make_panda_model("plant", dtype=jnp.float64)
    q0 = jnp.asarray(KEYFRAMES["neutral"])
    tau_g = gravity_torque(model, q0)
    R_des = jnp.asarray(make_vertical_down_R())
    z_c = 0.342
    traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10, omega=1.5,
                              z_contact=z_c, t_approach=0.55, z_pre=z_c + 0.05,
                              t_pre=0.25, ee_start=(-0.3, 0.0, 0.633),
                              t_stabilize=0.2)
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_q_soft_limits=8.0,
                   w_tau_soft_limits=2.0, w_plane_z=1.2e3, w_vz=5.0e2,
                   contact_gains=(140.0, 80.0), fn_des=22.0, w_fn=28.0,
                   ff_alpha=float(np.exp(-2 * np.pi * 25.0 * 0.01)),
                   w_w=6.0e-4, w_w_soft_limits=2.0, w_y=8.0e-4)
    st = FDDPSettings(max_iters=10, use_box=True)

    data = {}
    for case in ["classical_free", "classical_contact", "ff_contact"]:
        surface = case != "classical_free"
        t0 = 0.3 if case == "classical_free" else 1.2
        is_ff = case == "ff_contact"
        make = make_augmented_knot if is_ff else make_classical_knot
        x0 = (jnp.concatenate([q0, jnp.zeros(7), tau_g]) if is_ff
              else jnp.concatenate([q0, jnp.zeros(7)]))
        N = 12
        refs_run, ref_T = build_problem_refs(
            traj, t0, N, W.dt_ocp, jnp.concatenate([q0, jnp.zeros(7)]), tau_g,
            R_des, y_ref=(x0 if is_ff else None), dtype=jnp.float64)
        xs0 = jnp.tile(x0, (N + 1, 1))
        us0 = jnp.tile(tau_g, (N, 1))
        for mode in ("scalar", "vector"):
            knot = make(model, W, surface=surface, calc_mode=mode)
            res = solve(knot, refs_run, ref_T, x0, xs0, us0, st)
            data[f"{case}_{mode}_us"] = np.asarray(res.us)
            data[f"{case}_{mode}_cost"] = np.asarray(float(res.cost))
            print(f"{case}[{mode}]: cost={float(res.cost):.9f} "
                  f"iters={int(res.iters)}")

    np.savez(OUT, **data)
    print("wrote", OUT)


if __name__ == "__main__":
    main()

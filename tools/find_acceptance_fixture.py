"""Search for a warm-start fixture where Crocoddyl's bare acceptance
semantics (unbounded negative-improvement branch + d1<th_grad escape
hatch) accept a divergent iterate that the default robustness clamps
reject (PARITY.md deviations 3-4).  The winning fixture gets pinned in
tests/test_fddp.py as a regression test for the clamps.

Usage: python -m tools.find_acceptance_fixture
"""
from __future__ import annotations

import numpy as np


def main():
    import jax
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
    from ffmpc_tpu.ocp.action import make_classical_knot
    from ffmpc_tpu.ocp.weights import OCPWeights
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.solver.fddp import solve, FDDPSettings
    from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj

    dtype = jnp.float64
    model = make_panda_model("plant", dtype=dtype)
    z_c = 0.342
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_plane_z=9.0e2, w_vz=3.0e2,
                   w_tangent_pos=3.6e3, w_tangent_vel=1.2e3,
                   contact_gains=(145.0, 85.0), fn_des=22.0, w_fn=3.0e1,
                   w_unilateral=3.0e1, z_press=0.0065)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10, omega=1.5,
                              z_contact=z_c, t_approach=0.55,
                              z_pre=z_c + 0.05, t_pre=0.25,
                              ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.2)
    knot = make_classical_knot(model, W, surface=True)
    q0 = jnp.asarray(KEYFRAMES["neutral"], dtype)
    tau_g = gravity_torque(model, q0)
    N = 40

    st_def = FDDPSettings(max_iters=10, use_box=True)
    st_cro = FDDPSettings(max_iters=10, use_box=True, crocoddyl_semantics=True)

    import jax as _jax

    def _mk(st):
        def f(t0, x0, xs, us):
            x_reg = jnp.concatenate([q0, jnp.zeros(7, dtype)])
            refs_run, ref_T = build_problem_refs(
                traj, t0, N, W.dt_ocp, x_reg, tau_g,
                jnp.asarray(np.diag([1.0, -1.0, -1.0]), dtype), dtype=dtype)
            return solve(knot, refs_run, ref_T, x0, xs, us, st,
                         debug_history=True)
        return _jax.jit(f)

    solve_def = _mk(st_def)
    solve_cro = _mk(st_cro)

    def run(seed, vel_scale, gap_scale, u_scale, t0):
        rng = np.random.default_rng(seed)
        dq0 = vel_scale * rng.normal(size=7)
        x0 = jnp.concatenate([q0, jnp.asarray(dq0, dtype)])
        xs = jnp.tile(x0, (N + 1, 1))
        xs = xs + gap_scale * jnp.asarray(
            rng.normal(size=(N + 1, 14)), dtype)
        us = jnp.tile(tau_g, (N, 1)) + u_scale * jnp.asarray(
            rng.normal(size=(N, 7)), dtype)
        outs = {}
        for name, fn in (("default", solve_def), ("croco", solve_cro)):
            res, hist = fn(jnp.asarray(t0, dtype), x0, xs, us)
            acc = np.asarray(hist["accepted"])
            ct = np.asarray(hist["cost_try"])
            cc = np.asarray(hist["cost_cur"])
            # worst accepted multiplicative cost jump
            with np.errstate(divide="ignore", invalid="ignore"):
                jump = np.where(acc & (cc > 0), ct / cc, 1.0)
            outs[name] = dict(cost=float(res.cost),
                              max_jump=float(np.nanmax(jump)),
                              final_cc=float(cc[-1]))
        return outs

    print("seed vel gap u t0 | def_cost def_jump | cro_cost cro_jump")
    found = []
    for seed in range(8):
        for vel in (0.0, 2.0, 6.0):
            for gap in (0.05, 0.2, 0.5):
                for us_ in (0.0, 30.0):
                    for t0 in (1.2,):
                        o = run(seed, vel, gap, us_, t0)
                        d, c = o["default"], o["croco"]
                        flag = " <<<" if (c["cost"] > 50 * d["cost"]
                                          or c["max_jump"] > 1e3) else ""
                        print(f"{seed} {vel} {gap} {us_} {t0} | "
                              f"{d['cost']:.3e} j={d['max_jump']:.1e} | "
                              f"{c['cost']:.3e} j={c['max_jump']:.1e}{flag}")
                        if flag:
                            found.append((seed, vel, gap, us_, t0, o))
    print(f"\n{len(found)} divergent-acceptance fixtures found")
    for f in found[:5]:
        print(f)


if __name__ == "__main__":
    main()

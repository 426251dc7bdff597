"""Fused Pallas backward sweep == sequential backward, element-exact.

Runs the kernel in interpreter mode on CPU (same kernel code the TPU
compiles via Mosaic); the vmapped custom_vmap function must reproduce the
per-problem sequential scan bit-for-bit up to float reassociation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffmpc_tpu.solver.backward_pallas import make_backward_box, _backward_seq

NX, NU, N, B = 21, 7, 4, 3


def _rand_problem(rng, dtype=jnp.float64, tight_bounds=False):
    def r(*s):
        return jnp.asarray(rng.normal(size=s), dtype)

    Fx = jnp.eye(NX, dtype=dtype)[None] + 0.1 * r(N, NX, NX)
    Fu = 0.2 * r(N, NX, NU)
    Lx = r(N, NX)
    Lu = r(N, NU)
    A = 0.3 * r(N, NX, NX)
    Lxx = A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(NX, dtype=dtype)[None]
    Lxu = 0.1 * r(N, NX, NU)
    Bm = 0.3 * r(N, NU, NU)
    Luu = Bm @ jnp.swapaxes(Bm, -1, -2) + 0.8 * jnp.eye(NU, dtype=dtype)[None]
    fs = 0.3 * r(N + 1, NX)
    LxT = r(NX)
    At = 0.3 * r(NX, NX)
    LxxT = At @ At.T + 0.5 * jnp.eye(NX, dtype=dtype)
    width = 0.05 if tight_bounds else 50.0
    lb = -width * jnp.abs(r(N, NU)) - 1e-3
    ub = width * jnp.abs(r(N, NU)) + 1e-3
    xreg = jnp.asarray(10.0 ** rng.uniform(-6, -2), dtype)
    ureg = xreg
    return (Fx, Fu, Lx, Lu, Lxx, Lxu, Luu, fs, LxT, LxxT, lb, ub, xreg, ureg)


@pytest.mark.parametrize("tight", [False, True],
                         ids=["bounds_inactive", "bounds_active"])
@pytest.mark.quick
def test_pallas_backward_matches_sequential(tight):
    rng = np.random.default_rng(0 if tight else 1)
    probs = [_rand_problem(rng, tight_bounds=tight) for _ in range(B)]
    batched = [jnp.stack([p[i] for p in probs]) for i in range(len(probs[0]))]

    backward = make_backward_box(NX, NU, boxqp_iters=8)
    out_b = jax.vmap(backward)(*batched)

    for b in range(B):
        ref = _backward_seq(*probs[b], boxqp_iters=8, kgain_reg=1e-12)
        for i, name in enumerate(("K", "kff", "qu2", "dg", "dq", "bad",
                                  "w_all")):
            got = np.asarray(out_b[i][b])
            want = np.asarray(ref[i])
            if name == "bad":
                assert bool(got) == bool(want), name
            else:
                np.testing.assert_allclose(
                    got, want, rtol=5e-9, atol=5e-10,
                    err_msg=f"problem {b} field {name}")


def test_unbatched_call_uses_sequential_path():
    rng = np.random.default_rng(2)
    p = _rand_problem(rng)
    backward = make_backward_box(NX, NU, boxqp_iters=8)
    out = backward(*p)
    ref = _backward_seq(*p, boxqp_iters=8, kgain_reg=1e-12)
    for i in range(len(ref)):
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref[i]),
                                   rtol=1e-12, atol=0)


def test_solve_with_pallas_backward_matches_default():
    """Full vmapped BoxFDDP solves: backward_mode='pallas' == 'xla'."""
    import dataclasses
    from ffmpc_tpu.core import make_panda_model, KEYFRAMES, gravity_torque
    from ffmpc_tpu.ocp.action import make_classical_knot
    from ffmpc_tpu.ocp.weights import OCPWeights
    from ffmpc_tpu.ocp.problem import build_problem_refs
    from ffmpc_tpu.solver.fddp import solve, FDDPSettings
    from ffmpc_tpu.tasks.trajectories import ApproachCircleTraj

    dtype = jnp.float64
    model = make_panda_model("plant", dtype=dtype)
    z_c = 0.342
    W = OCPWeights(dt_ocp=0.01, w_ee_pos=1.2e3, w_plane_z=9.0e2,
                   contact_gains=(145.0, 85.0), fn_des=22.0, w_fn=3.0e1,
                   z_press=0.0065)
    traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10,
                              omega=1.5, z_contact=z_c, t_approach=0.55,
                              z_pre=z_c + 0.05, t_pre=0.25,
                              ee_start=(-0.3, 0.0, 0.633), t_stabilize=0.2)
    knot = make_classical_knot(model, W, surface=True)
    q0 = jnp.asarray(KEYFRAMES["neutral"], dtype)
    tau_g = gravity_torque(model, q0)
    Nh, Bn = 5, 2
    x_reg = jnp.concatenate([q0, jnp.zeros(7, dtype)])
    refs_run, ref_T = build_problem_refs(
        traj, jnp.asarray(1.2, dtype), Nh, W.dt_ocp, x_reg, tau_g,
        jnp.asarray(np.diag([1.0, -1.0, -1.0]), dtype), dtype=dtype)

    rng = np.random.default_rng(5)
    x0s = jnp.asarray(np.concatenate(
        [np.tile(np.asarray(q0), (Bn, 1)) + 0.05 * rng.normal(size=(Bn, 7)),
         0.5 * rng.normal(size=(Bn, 7))], axis=1), dtype)
    xss = jnp.tile(x0s[:, None, :], (1, Nh + 1, 1))
    # large controls so some torque bounds go active through boxqp
    uss = jnp.tile(tau_g, (Bn, Nh, 1)) + 30.0 * jnp.asarray(
        rng.normal(size=(Bn, Nh, 7)), dtype)

    st = FDDPSettings(max_iters=3, use_box=True)
    st_p = dataclasses.replace(st, backward_mode="pallas")

    def run(settings):
        f = jax.vmap(lambda x0, xs, us: solve(
            knot, refs_run, ref_T, x0, xs, us, settings))
        return f(x0s, xss, uss)

    r_ref = run(st)
    r_pal = run(st_p)
    # the kernel reassociates channel sums vs the XLA matmuls — equality is
    # to float-reassociation noise, not bitwise
    for name in ("xs", "us", "K", "k", "cost", "stop", "iters"):
        np.testing.assert_allclose(
            np.asarray(getattr(r_pal, name)),
            np.asarray(getattr(r_ref, name)), rtol=1e-6, atol=1e-7,
            err_msg=name)

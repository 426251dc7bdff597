"""Multi-host (multi-process) batched-solve worker.

One process per host.  Each process contributes its local devices to a
global dp mesh (ICI within a host, DCN across hosts), feeds its local shard
of the solve batch, and the final metric reduction (mean cost across ALL
solves) runs as a cross-process collective inside jit.

This is the >=2-hosts leg of the BASELINE scaling configs.  On a real TPU
pod slice the pod runtime supplies coordinator/process wiring
(jax.distributed.initialize() with no args); for CI / this container the
test harness (tests/test_multihost.py) launches two CPU-backend processes
with an explicit coordinator address — the collective path (psum over the
distributed runtime) is identical, only the transport differs.

Run directly:
  python -m ffmpc_tpu.parallel.multihost_worker \
      --coordinator localhost:12345 --num-processes 2 --process-id 0 &
  python -m ffmpc_tpu.parallel.multihost_worker \
      --coordinator localhost:12345 --num-processes 2 --process-id 1
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=os.environ.get("JAX_COORDINATOR_ADDRESS"))
    ap.add_argument("--num-processes", type=int,
                    default=int(os.environ.get("JAX_NUM_PROCESSES", "1")))
    ap.add_argument("--process-id", type=int,
                    default=int(os.environ.get("JAX_PROCESS_ID", "0")))
    ap.add_argument("--platform", default=os.environ.get("FFMPC_MH_PLATFORM", "cpu"),
                    help="'cpu' (test harness) or 'tpu' (pod slice)")
    ap.add_argument("--batch-per-process", type=int, default=4)
    ap.add_argument("--horizon", type=int, default=6)
    ap.add_argument("--max-iters", type=int, default=2)
    ap.add_argument("--controller", default="classical",
                    choices=["classical", "force_feedback"])
    ap.add_argument("--flagship", action="store_true",
                    help="use the flagship benchmark OCP config "
                         "(ocp/weights.py flagship_*) instead of the toy "
                         "config — the BASELINE >=2-hosts sweep shape")
    ap.add_argument("--knot-sharded", action="store_true",
                    help="additionally run the collective (knot-sharded, "
                         "box-constrained) Riccati reduction across ALL "
                         "global devices and check it against the local "
                         "single-device sweep")
    ap.add_argument("--json-out", default=None,
                    help="write a per-process metrics JSON here")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Bound the coordinator handshake: a dead/hung coordinator otherwise
    # blocks this worker silently forever (round-1 advisor finding).
    init_timeout_s = int(os.environ.get("FFMPC_MH_INIT_TIMEOUT_S", "120"))
    os.environ.setdefault("JAX_COORDINATION_SERVICE_INIT_TIMEOUT",
                          str(init_timeout_s))
    try:
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
                initialization_timeout=init_timeout_s)
        else:
            # real pod slice: the TPU runtime auto-detects the topology
            jax.distributed.initialize(
                initialization_timeout=init_timeout_s)
    except Exception as e:  # noqa: BLE001 — fail loudly, not hang
        print(f"multihost FAILED: proc={args.process_id} could not join "
              f"coordinator {args.coordinator!r} within {init_timeout_s}s: "
              f"{type(e).__name__}: {e}", flush=True)
        return 2

    import time

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core import make_panda_model, KEYFRAMES, gravity_torque
    from ..ocp.weights import (OCPWeights, flagship_weights,
                               flagship_trajectory, flagship_ff_alpha,
                               FLAGSHIP_DT_MPC)
    from ..solver.fddp import FDDPSettings
    from ..tasks.trajectories import ApproachCircleTraj
    from ..run.batch_runner import EpisodeConfig, make_batched_solve_fn
    from .mesh import make_dp_mesh

    dtype = jnp.float32
    model = make_panda_model("plant", dtype=dtype)
    if args.flagship:
        W = flagship_weights()
        traj = flagship_trajectory()
    else:
        W = OCPWeights(contact_gains=(140.0, 80.0), fn_des=22.0,
                       z_press=0.0065)
        z_c = 0.342
        traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10,
                                  omega=1.5, z_contact=z_c, t_approach=0.55,
                                  z_pre=z_c + 0.05, t_pre=0.25,
                                  ee_start=(-0.3, 0.0, 0.633),
                                  t_stabilize=0.2)
    settings = FDDPSettings(max_iters=args.max_iters, use_box=True)
    ep = EpisodeConfig(controller=args.controller, horizon=args.horizon,
                       ff_alpha_ocp=W.ff_alpha,
                       ff_alpha_ctrl=flagship_ff_alpha(FLAGSHIP_DT_MPC))
    q0 = np.asarray(KEYFRAMES["neutral"])

    solve = make_batched_solve_fn(model, W, settings, traj, ep, q0,
                                  surface=True, dtype=dtype)
    mesh = make_dp_mesh()           # ALL global devices, every process
    bs = NamedSharding(mesh, P("dp"))
    n_dev_global = len(jax.devices())
    n_proc = jax.process_count()
    B_global = args.batch_per_process * n_proc
    if B_global % n_dev_global != 0:
        print(f"multihost FAILED: global batch {B_global} "
              f"({args.batch_per_process}/process x {n_proc}) is not "
              f"divisible by the {n_dev_global} global devices; choose "
              "--batch-per-process so every device gets an equal shard",
              flush=True)
        return 2

    # per-process local slice of the global batch
    tau_g = np.asarray(gravity_torque(model, jnp.asarray(q0, dtype)))
    nx = 21 if args.controller == "force_feedback" else 14
    x0 = (np.concatenate([q0, np.zeros(7), tau_g]) if nx == 21
          else np.concatenate([q0, np.zeros(7)])).astype(np.float32)
    rng = np.random.default_rng(0)   # same seed everywhere; slice locally
    x0s_global = x0[None] + 0.01 * rng.normal(size=(B_global, nx)).astype(np.float32)
    lo = args.process_id * args.batch_per_process
    hi = lo + args.batch_per_process
    x0s_local = x0s_global[lo:hi]
    ts_local = np.full((args.batch_per_process,), 1.2, np.float32)
    xs_local = np.tile(x0s_local[:, None, :], (1, args.horizon + 1, 1))
    us_local = np.tile(tau_g.astype(np.float32)[None, None],
                       (args.batch_per_process, args.horizon, 1))

    def to_global(local):
        return jax.make_array_from_process_local_data(bs, local)

    args_dev = tuple(to_global(a) for a in (ts_local, x0s_local, xs_local, us_local))

    def solve_and_reduce(ts, x0s, xs, us):
        res = solve(ts, x0s, xs, us)
        # cross-host collective: mean cost over the GLOBAL batch (psum over
        # dp -> DCN between processes), replicated to every host
        mean_cost = jnp.mean(res.cost)
        max_u = jnp.max(jnp.abs(res.us))
        all_finite = jnp.all(jnp.isfinite(res.us)) & jnp.all(jnp.isfinite(res.cost))
        return mean_cost, max_u, all_finite

    fn = jax.jit(solve_and_reduce,
                 in_shardings=(bs, bs, bs, bs),
                 out_shardings=(NamedSharding(mesh, P()),) * 3)
    t0 = time.perf_counter()
    mean_cost, max_u, ok = fn(*args_dev)
    jax.block_until_ready(mean_cost)
    compile_and_run_s = time.perf_counter() - t0
    # timed pass (warm executable, same inputs — the sweep rate)
    t0 = time.perf_counter()
    mean_cost, max_u, ok = fn(*args_dev)
    jax.block_until_ready(mean_cost)
    sweep_s = time.perf_counter() - t0
    solves_per_s = B_global / sweep_s

    print(f"multihost ok: proc={args.process_id}/{n_proc} "
          f"devices={n_dev_global} B={B_global} N={args.horizon} "
          f"iters={args.max_iters} mean_cost={float(mean_cost):.6f} "
          f"max_u={float(max_u):.3f} finite={bool(ok)} "
          f"sweep_s={sweep_s:.2f} solves_per_s={solves_per_s:.1f}",
          flush=True)

    knot_ok = None
    knot_rel = None
    if args.knot_sharded and args.horizon % n_dev_global == 0:
        # collective Riccati reduction: the BOX (shipped-semantics) backward
        # sweep of the flagship-size GN subproblem, knot-sharded over ALL
        # global devices — all_gather rides DCN between the processes.
        from ..ocp.action import make_augmented_knot, make_classical_knot
        from ..ocp.problem import build_problem_refs
        from ..solver.riccati_scan import parallel_riccati_box
        from .knot_sharded import knot_sharded_riccati_box

        mk = (make_augmented_knot if args.controller == "force_feedback"
              else make_classical_knot)
        knot = mk(model, W, surface=True, deriv_mode="analytic",
                  calc_mode="vector")
        y0j = jnp.asarray(x0, dtype)
        R_des = jnp.asarray(np.diag([1.0, -1.0, -1.0]), dtype)
        refs_run, ref_T = build_problem_refs(
            traj, 1.2, args.horizon, W.dt_ocp, y0j[:14],
            jnp.asarray(tau_g, dtype), R_des,
            y_ref=(y0j if nx == 21 else None), dtype=dtype)
        xs = jnp.tile(y0j, (args.horizon + 1, 1))
        us = jnp.tile(jnp.asarray(tau_g, dtype), (args.horizon, 1))
        derivs = jax.jit(jax.vmap(knot.diff))(refs_run, xs[:-1], us)
        _, LxT, LxxT = jax.jit(knot.term_diff)(ref_T, xs[-1])
        gn = (derivs.Fx, derivs.Fu, derivs.Lx, derivs.Lu, derivs.Lxx,
              derivs.Lxu, derivs.Luu, derivs.xnext - xs[1:], LxT, LxxT)
        lim = jnp.asarray(np.asarray(W.tau_limits), dtype)
        lb = (-lim)[None] - us
        ub = lim[None] - us
        kmesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("knot",))
        K_sh, k_sh = knot_sharded_riccati_box(kmesh, *gn, lb, ub, ureg=1e-6)
        K_ref, k_ref, _, _, _, _ = jax.jit(
            parallel_riccati_box,
            static_argnames=("ureg", "boxqp_iters", "refinements"))(
            *gn, lb, ub, ureg=1e-6)
        # K_sh is knot-sharded across processes: compare the LOCAL shard
        # (addressable devices only under multiprocess jax).  Shard
        # iteration order is not guaranteed sorted by array index — order
        # explicitly by each shard's knot-axis start offset.
        local = sorted(K_sh.addressable_shards,
                       key=lambda s: s.index[0].start or 0)
        K_sh_local = np.concatenate(
            [np.asarray(s.data) for s in local], axis=0)
        n_local_knots = K_sh_local.shape[0]
        klo = local[0].index[0].start or 0
        K_ref_np = np.asarray(K_ref)[klo:klo + n_local_knots]
        scale = float(np.abs(np.asarray(K_ref)).max())
        err = float(np.abs(K_sh_local - K_ref_np).max())
        knot_rel = err / max(scale, 1e-9)
        knot_ok = bool(np.isfinite(err) and err < 2e-3 * max(scale, 1.0))
        print(f"multihost knot-sharded BOX riccati: proc={args.process_id} "
              f"mesh={kmesh.shape} N={args.horizon} rel_err={knot_rel:.2e} "
              f"ok={knot_ok}", flush=True)

    if args.json_out:
        import json
        with open(args.json_out, "w") as f:
            json.dump(dict(
                process_id=args.process_id, num_processes=n_proc,
                devices=n_dev_global, batch_global=B_global,
                horizon=args.horizon, max_iters=args.max_iters,
                controller=args.controller, flagship=bool(args.flagship),
                mean_cost=float(mean_cost), max_u=float(max_u),
                finite=bool(ok), sweep_s=sweep_s,
                solves_per_s=solves_per_s,
                compile_and_run_s=compile_and_run_s,
                knot_sharded_ok=knot_ok, knot_sharded_rel_err=knot_rel,
            ), f, indent=1)

    ok_all = bool(ok) and (knot_ok is not False)
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())

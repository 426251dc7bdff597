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

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core import make_panda_model, KEYFRAMES, gravity_torque
    from ..ocp.weights import OCPWeights
    from ..solver.fddp import FDDPSettings
    from ..tasks.trajectories import ApproachCircleTraj
    from ..run.batch_runner import EpisodeConfig, make_batched_solve_fn
    from .mesh import make_dp_mesh

    dtype = jnp.float32
    model = make_panda_model("plant", dtype=dtype)
    W = OCPWeights(contact_gains=(140.0, 80.0), fn_des=22.0, z_press=0.0065)
    z_c = 0.342
    traj = ApproachCircleTraj(center=(-0.5, 0.0, z_c), radius=0.10, omega=1.5,
                              z_contact=z_c, t_approach=0.55, z_pre=z_c + 0.05,
                              t_pre=0.25, ee_start=(-0.3, 0.0, 0.633),
                              t_stabilize=0.2)
    settings = FDDPSettings(max_iters=args.max_iters, use_box=True)
    ep = EpisodeConfig(controller="classical", horizon=args.horizon)
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
    x0 = np.concatenate([q0, np.zeros(7)]).astype(np.float32)
    rng = np.random.default_rng(0)   # same seed everywhere; slice locally
    x0s_global = x0[None] + 0.01 * rng.normal(size=(B_global, 14)).astype(np.float32)
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

    @jax.jit
    def solve_and_reduce(ts, x0s, xs, us):
        res = solve(ts, x0s, xs, us)
        # cross-host collective: mean cost over the GLOBAL batch (psum over
        # dp -> DCN between processes), replicated to every host
        mean_cost = jnp.mean(res.cost)
        max_u = jnp.max(jnp.abs(res.us))
        all_finite = jnp.all(jnp.isfinite(res.us)) & jnp.all(jnp.isfinite(res.cost))
        return mean_cost, max_u, all_finite

    mean_cost, max_u, ok = jax.jit(
        solve_and_reduce,
        in_shardings=(bs, bs, bs, bs),
        out_shardings=(NamedSharding(mesh, P()),) * 3)(*args_dev)
    jax.block_until_ready(mean_cost)

    print(f"multihost ok: proc={args.process_id}/{n_proc} "
          f"devices={n_dev_global} B={B_global} "
          f"mean_cost={float(mean_cost):.6f} max_u={float(max_u):.3f} "
          f"finite={bool(ok)}", flush=True)
    return 0 if bool(ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())

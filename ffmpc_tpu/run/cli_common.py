"""Shared CLI plumbing for the two controller runners."""

from __future__ import annotations

import argparse
from pathlib import Path

from .scenarios import SCENARIOS
from .experiment import run_single


def add_common_args(parser: argparse.ArgumentParser, default_results: Path):
    parser.add_argument("--scenario", choices=SCENARIOS + ("tilted",),
                        default="flat", help="Evaluation scenario.")
    parser.add_argument("--all-scenarios", action="store_true",
                        help="Run the full 5-scenario sweep.")
    parser.add_argument("--no-viewer", action="store_true",
                        help="Accepted for reference CLI parity (headless is "
                             "the only mode; no interactive viewer).")
    parser.add_argument("--time", type=float, default=12.0,
                        help="Total simulation time [s].")
    parser.add_argument("--results-dir", type=Path, default=default_results)
    parser.add_argument("--no-plots", action="store_true")
    parser.add_argument("--contact-model", choices=("normal_1d", "point3d"),
                        default="normal_1d")
    parser.add_argument("--low-budget", action="store_true",
                        help="Use low DDP iteration budget (3).")
    parser.add_argument("--mpc-iters", type=int, default=None)
    parser.add_argument("--circle-radius", type=float, default=0.10)
    parser.add_argument("--circle-omega", type=float, default=1.5)
    parser.add_argument("--use-command-filter", action="store_true")
    parser.add_argument("--align-check-samples", type=int, default=16)
    parser.add_argument("--phase-source", choices=("trajectory", "force_latch"),
                        default="trajectory")
    parser.add_argument("--benchmark-mode", dest="benchmark_mode",
                        action="store_true")
    parser.add_argument("--no-benchmark-mode", dest="benchmark_mode",
                        action="store_false")
    parser.add_argument("--model-variant", choices=("plant", "parity"),
                        default="plant",
                        help="Controller-internal rigid-body model: 'plant' "
                             "matches the simulated robot; 'parity' mirrors "
                             "the reference's armature/damping-free model.")
    parser.add_argument("--device", choices=("cpu", "default"), default="cpu",
                        help="Backend for the per-tick solves: 'cpu' (host "
                             "loop default) or 'default' (jax default device).")
    parser.add_argument("--rti", action="store_true",
                        help="Real-time-iteration deployment mode: 1 solver "
                             "iteration per tick + parallel (associative-"
                             "scan) Riccati backward + warm start / "
                             "regularization carry-over.  ~6 ms device time "
                             "per tick at B=1 (RESULTS.md RTI table); "
                             "quality is controller-dependent - the FF "
                             "controller stays usable, the classical one "
                             "needs the full budget.")
    parser.add_argument("--stable", action="store_true",
                        help="Apply the null-space stabilization patch on top "
                             "of the selected preset: stronger posture/yaw "
                             "regularization and joint-limit barriers.  "
                             "Addresses the classical controller's transient "
                             "null-space yaw excursion (~t=1.9 s, flat "
                             "benchmark) at a small tracking-stiffness cost.")
    parser.set_defaults(benchmark_mode=True)


def rti_patch(cfg):
    """Real-time-iteration overrides (see --rti)."""
    cfg.max_iters = 1
    cfg.riccati_mode = "parallel"
    return cfg


def stable_patch(cfg):
    """Null-space stabilization overrides (see --stable)."""
    import numpy as np
    cfg.w_posture = max(float(cfg.w_posture), 8.0e-1)
    cfg.ori_weights = np.array([2.4, 2.4, 1.2])
    cfg.w_wdamp_weights = np.array([1.8, 1.8, 1.0])
    cfg.w_q_soft_limits = max(float(cfg.w_q_soft_limits), 12.0)
    cfg.q_soft_limit_margin = max(float(cfg.q_soft_limit_margin), 0.08)
    return cfg


def _chain_patches(*patches):
    patches = [p for p in patches if p is not None]
    if not patches:
        return None

    def apply(cfg):
        for p in patches:
            cfg = p(cfg) or cfg
        return cfg

    return apply


def sweep_or_single(controller: str, args: argparse.Namespace):
    kw = dict(
        total_time=args.time,
        results_dir=args.results_dir,
        save_plots=not args.no_plots,
        contact_model=args.contact_model,
        low_budget=args.low_budget,
        mpc_iters=args.mpc_iters,
        use_command_filter=args.use_command_filter,
        align_check_samples=args.align_check_samples,
        circle_radius=args.circle_radius,
        circle_omega=args.circle_omega,
        phase_source=args.phase_source,
        benchmark_mode=args.benchmark_mode,
        model_variant=args.model_variant,
        device=args.device,
        config_patch=_chain_patches(
            stable_patch if getattr(args, "stable", False) else None,
            rti_patch if getattr(args, "rti", False) else None),
    )
    if hasattr(args, "ff_tau_state_source"):
        kw["ff_tau_state_source"] = args.ff_tau_state_source

    if args.all_scenarios:
        metrics = [run_single(controller, sc, **kw) for sc in SCENARIOS]
        print("=" * 80)
        print("Scenario Sweep Summary")
        print("=" * 80)
        for m in metrics:
            print(f"{m['scenario']:>22s} | RMS_tan={m['rms_tan']:.4f} m | "
                  f"max_fn={m['max_fn']:.2f} N | "
                  f"loss={m['contact_loss_pct']:.1f}% | "
                  f"loss_phase={m['contact_loss_phase_pct']:.1f}%")
        return metrics
    return run_single(controller, args.scenario, **kw)

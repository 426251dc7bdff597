"""Full benchmark sweep: one controller x 5 scenarios, metrics to JSON.

Usage: python -m tools.run_sweep classical|force_feedback out.json [time_s]
           [--stable]

``--stable`` applies the null-space stabilization preset
(run/cli_common.py stable_patch) — the sweep that validates it across all
scenarios (VERDICT r3 item 7).
"""
import json
import sys

from ffmpc_tpu.run.experiment import run_single
from ffmpc_tpu.run.scenarios import SCENARIOS


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stable = "--stable" in sys.argv
    controller = args[0]
    out_path = args[1]
    total_time = float(args[2]) if len(args) > 2 else 12.0
    patch = None
    if stable:
        from ffmpc_tpu.run.cli_common import stable_patch
        patch = stable_patch
    rows = []
    for sc in SCENARIOS:
        m = run_single(controller, sc, total_time=total_time,
                       results_dir=f"/tmp/r2/sweep_{controller}"
                                   + ("_stable" if stable else ""),
                       save_plots=False, verbose=True, progress_every=400,
                       config_patch=patch)
        rows.append(m)
        with open(out_path, "w") as f:
            json.dump({"controller": controller, "metrics": rows}, f, indent=2)
        print("SWEEP-DONE", sc, json.dumps({k: v for k, v in m.items()
                                            if isinstance(v, float)}))


if __name__ == "__main__":
    main()

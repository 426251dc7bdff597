"""Full benchmark sweep: one controller x 5 scenarios, metrics to JSON.

Usage: python -m tools.run_sweep classical|force_feedback out.json [time_s]
"""
import json
import sys

from ffmpc_tpu.run.experiment import run_single
from ffmpc_tpu.run.scenarios import SCENARIOS


def main():
    controller = sys.argv[1]
    out_path = sys.argv[2]
    total_time = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    rows = []
    for sc in SCENARIOS:
        m = run_single(controller, sc, total_time=total_time,
                       results_dir=f"/tmp/r2/sweep_{controller}",
                       save_plots=False, verbose=True, progress_every=400)
        rows.append(m)
        with open(out_path, "w") as f:
            json.dump({"controller": controller, "metrics": rows}, f, indent=2)
        print("SWEEP-DONE", sc, json.dumps({k: v for k, v in m.items()
                                            if isinstance(v, float)}))


if __name__ == "__main__":
    main()

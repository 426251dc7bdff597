"""CLI for the force-feedback controller evaluation.

Flag-compatible with the reference's run_force_feedback.py argparse surface
(run_force_feedback.py:739-816), including --ff-tau-state-source.  Usage:
    python -m ffmpc_tpu.run.run_force_feedback --scenario flat --no-viewer
"""

from __future__ import annotations

import argparse
from pathlib import Path

from .cli_common import add_common_args, sweep_or_single


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser, default_results=Path("results/force_feedback_eval"))
    parser.add_argument(
        "--ff-tau-state-source",
        choices=("tau_meas_act_filt", "tau_meas_act", "tau_cmd",
                 "tau_meas_filt", "tau_meas", "tau_total", "auto"),
        default="tau_meas_act_filt",
        help="Source channel for the filtered-torque state tau_hat.")
    args = parser.parse_args(argv)
    sweep_or_single("force_feedback", args)


if __name__ == "__main__":
    main()

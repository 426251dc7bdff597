"""CLI for the classical controller evaluation.

Flag-compatible with the reference's run_classical.py argparse surface
(run_classical.py:692-762).  Usage:
    python -m ffmpc_tpu.run.run_classical --scenario flat --no-viewer --time 12
"""

from __future__ import annotations

import argparse
from pathlib import Path

from .cli_common import add_common_args, sweep_or_single


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser, default_results=Path("results/classical_eval"))
    args = parser.parse_args(argv)
    sweep_or_single("classical", args)


if __name__ == "__main__":
    main()

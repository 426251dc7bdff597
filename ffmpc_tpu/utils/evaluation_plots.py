"""Standardized evaluation plots from a run's data.npz.

Equivalent of the reference save_evaluation_plots
(src/utils/evaluation_plots.py:9-169): seven PNGs — tangential error,
measured/predicted force vs desired, measured-vs-predicted force, EE xy
components vs refs, and the Cartesian xy path.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

_LATEX_PROBED = False


def _configure_matplotlib() -> bool:
    """LaTeX-if-available rcParams probe (reference
    src/utils/evaluation_plots.py:9-49): deterministic STIX mathtext
    defaults, upgraded to text.usetex serif rendering when a working system
    LaTeX is found.  Returns True when LaTeX rendering is active."""
    global _LATEX_PROBED
    plt.rcParams.update({
        "figure.figsize": (8.5, 4.8),
        "font.size": 12,
        "axes.grid": True,
        "grid.alpha": 0.35,
        "legend.frameon": True,
        "legend.framealpha": 0.95,
        "text.usetex": False,
        "mathtext.fontset": "stix",
        "font.family": "STIXGeneral",
    })
    _LATEX_PROBED = True
    if shutil.which("latex") is None:
        return False
    prev = dict(plt.rcParams)
    plt.rcParams.update({
        "text.usetex": True,
        "font.family": "serif",
        "font.serif": ["Computer Modern Roman", "Times New Roman",
                       "DejaVu Serif"],
    })
    try:
        f, ax = plt.subplots(figsize=(1.0, 1.0))
        ax.set_xlabel(r"$t\;(\mathrm{s})$")
        f.canvas.draw()
        plt.close(f)
        return True
    except Exception:
        plt.rcParams.update(prev)
        return False


def _load(npz_path: Path) -> dict:
    with np.load(npz_path, allow_pickle=True) as z:
        return {k: z[k] for k in z.files}


def save_evaluation_plots(npz_path: Path | str, out_dir: Path | str,
                          fn_des: float) -> None:
    if not _LATEX_PROBED:
        _configure_matplotlib()
    d = _load(Path(npz_path))
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    t = d["t"]

    def fig(name):
        f, ax = plt.subplots(figsize=(8, 4.5), dpi=120)
        f._name = name
        return f, ax

    def done(f, ax, title, xlabel, ylabel, fname):
        ax.set_title(title)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.grid(True, alpha=0.3)
        ax.legend(loc="best", fontsize=8)
        f.tight_layout()
        f.savefig(out / fname)
        plt.close(f)

    f, ax = fig("tangential_error")
    ax.plot(t, d["err_tan"], label="tangential error")
    done(f, ax, "Tangential tracking error", "t [s]", "error [m]", "tangential_error.png")

    f, ax = fig("fn_meas_vs_des")
    ax.plot(t, d["fn_meas"], label="Fn measured")
    ax.axhline(fn_des, color="k", ls="--", label="Fn desired")
    done(f, ax, "Measured normal force vs desired", "t [s]", "force [N]", "fn_meas_vs_des.png")

    if "fn_pred" in d:
        f, ax = fig("fn_pred_vs_des")
        ax.plot(t, d["fn_pred"], label="Fn predicted")
        ax.axhline(fn_des, color="k", ls="--", label="Fn desired")
        done(f, ax, "Predicted normal force vs desired", "t [s]", "force [N]", "fn_pred_vs_des.png")

        f, ax = fig("fn_meas_vs_pred")
        ax.plot(t, d["fn_meas"], label="Fn measured")
        ax.plot(t, d["fn_pred"], label="Fn predicted", alpha=0.8)
        done(f, ax, "Measured vs predicted normal force", "t [s]", "force [N]", "fn_meas_vs_pred.png")

    ee = d["ee_pos"]
    ref = d["ee_ref"]
    f, ax = fig("ee_xy_ref_vs_meas")
    ax.plot(t, ee[:, 0], label="x")
    ax.plot(t, ref[:, 0], "--", label="x ref")
    ax.plot(t, ee[:, 1], label="y")
    ax.plot(t, ref[:, 1], "--", label="y ref")
    done(f, ax, "EE xy vs reference", "t [s]", "position [m]", "ee_xy_ref_vs_meas.png")

    for i, name in ((0, "px"), (1, "py")):
        f, ax = fig(f"ee_{name}")
        ax.plot(t, ee[:, i], label=f"{name} measured")
        ax.plot(t, ref[:, i], "--", label=f"{name} ref")
        done(f, ax, f"EE {name} vs reference", "t [s]", "position [m]",
             f"ee_{name}_ref_vs_meas.png")

    f, ax = fig("ee_xy_cartesian")
    ax.plot(ee[:, 0], ee[:, 1], label="measured")
    ax.plot(ref[:, 0], ref[:, 1], "--", label="reference")
    ax.set_aspect("equal")
    done(f, ax, "EE Cartesian path (xy)", "x [m]", "y [m]", "ee_xy_cartesian.png")

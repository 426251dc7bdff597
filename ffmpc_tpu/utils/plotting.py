"""Legacy per-channel run plotter (parity port of the reference's
src/utils/plotting.py:20-101).

The reference keeps a simple npz -> per-channel PNG plotter alongside the
full evaluation figure set; round 2 waived it as "mostly covered by the 7
standard PNGs" — this port closes that gap.  It accepts both this
framework's RunLogger channel names (utils/logging.py: fn_meas, ee_pos,
tau_cmd, ...) and the reference's legacy keys (fn, p, eR, F_cmd, phase),
so it can re-plot either artifact format.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def ensure_dir(p: Path) -> Path:
    p = Path(p)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _first(data, *keys):
    for k in keys:
        if k in data.files:
            return np.asarray(data[k])
    return None


def plot_sanding_run(
    npz_path: Path | str,
    out_dir: Path | str = "results/plots",
    run_tag: Optional[str] = None,
) -> Path:
    """Write one PNG per available channel; returns the plot directory."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    npz_path = Path(npz_path)
    data = np.load(npz_path, allow_pickle=True)

    fn = _first(data, "fn", "fn_meas")
    t = _first(data, "t")
    if t is None:
        n = len(fn) if fn is not None else len(data[data.files[0]])
        dt = float(data["dt"][0]) if "dt" in data.files else 0.005
        t = np.arange(n) * dt

    run_dir = ensure_dir(Path(out_dir) / (run_tag or npz_path.parent.name))

    def save(name, ylabel, title, series, labels=None):
        plt.figure()
        if series.ndim == 1:
            plt.plot(t, series)
        else:
            for j in range(series.shape[1]):
                plt.plot(t, series[:, j],
                         label=None if labels is None else labels[j])
            if labels is not None:
                plt.legend()
        plt.xlabel("time [s]")
        plt.ylabel(ylabel)
        plt.title(title)
        plt.grid(True)
        plt.tight_layout()
        plt.savefig(run_dir / f"{name}.png", dpi=160)
        plt.close()

    if fn is not None:
        save("fn", "fn [N]", "Contact normal force (on EE)", fn)

    p = _first(data, "p", "ee_pos")
    if p is not None:
        save("ee_pos", "position [m]", "End-effector position", p,
             labels=["x", "y", "z"])

    eR = _first(data, "eR", "ori_err")
    if eR is not None:
        eRn = np.linalg.norm(eR, axis=1) if eR.ndim > 1 else eR
        save("eR_norm", "|eR|", "Orientation error norm", eRn)

    F = _first(data, "F_cmd")
    if F is not None:
        save("F_cmd", "commanded wrench force [N]",
             "Commanded task-space force", F, labels=["Fx", "Fy", "Fz"])

    tau = _first(data, "tau_cmd")
    if tau is not None:
        save("tau_cmd", "tau [Nm]", "Commanded joint torques", tau,
             labels=[f"j{i+1}" for i in range(tau.shape[1])])

    phase = _first(data, "phase", "contact")
    if phase is not None:
        save("phase", "phase", "Phase index", phase.astype(float))

    return run_dir

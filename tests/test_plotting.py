"""Legacy per-channel plotter (utils/plotting.py — parity port of the
reference src/utils/plotting.py:20-101): accepts both RunLogger channel
names and the reference's legacy keys."""

import numpy as np

from ffmpc_tpu.utils.plotting import plot_sanding_run


def _check(npz_keys, expected, tmp_path, tag):
    n = 50
    arrs = {}
    for k, shape in npz_keys.items():
        arrs[k] = np.random.default_rng(0).normal(size=(n,) + shape)
    np.savez(tmp_path / "data.npz", **arrs)
    out = plot_sanding_run(tmp_path / "data.npz", out_dir=tmp_path / "plots",
                           run_tag=tag)
    made = {p.name for p in out.glob("*.png")}
    assert expected <= made, (expected, made)


def test_runlogger_keys(tmp_path):
    _check({"t": (), "fn_meas": (), "ee_pos": (3,), "tau_cmd": (7,),
            "contact": ()},
           {"fn.png", "ee_pos.png", "tau_cmd.png", "phase.png"},
           tmp_path, "modern")


def test_reference_legacy_keys(tmp_path):
    _check({"fn": (), "p": (3,), "eR": (3,), "F_cmd": (3,), "phase": ()},
           {"fn.png", "ee_pos.png", "eR_norm.png", "F_cmd.png", "phase.png"},
           tmp_path, "legacy")

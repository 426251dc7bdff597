"""Trajectory replay + viewer smoke test.

Parity counterpart of the reference's interactive viewer
(``/root/reference/src/sim/mujoco_viewer.py:1-47``), extended with the
capability the TPU stack actually needs: replaying a *logged run*
(``data.npz``/``meta.json`` produced by :class:`ffmpc_tpu.utils.logging.RunLogger`)
through the MuJoCo scene — interactively when a GL viewer is available,
or offscreen to PNG frames on a headless host.

Usage::

    # interactive replay of a logged run (falls back to offscreen PNGs)
    python -m ffmpc_tpu.run.replay RUN_DIR [--speed 1.0] [--out frames/]

    # headless: render every k-th tick to PNG
    python -m ffmpc_tpu.run.replay RUN_DIR --offscreen --every 40

    # the reference's viewer smoke test (scene load + torque dither)
    python -m ffmpc_tpu.run.replay --smoke [--duration 3.0] [--no-viewer]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def load_run(run_dir: str | Path):
    """Load (t, q, meta) from a RunLogger run directory."""
    run_dir = Path(run_dir)
    with np.load(run_dir / "data.npz") as z:
        t = np.asarray(z["t"], dtype=np.float64)
        q = np.asarray(z["q"], dtype=np.float64)
    meta_path = run_dir / "meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    if q.ndim != 2 or q.shape[1] != 7:
        raise ValueError(f"expected q of shape (T, 7), got {q.shape}")
    return t, q, meta


def _make_scene(meta: dict):
    """Build the MjModel/MjData pair the run was recorded against,
    re-applying the hidden table tilt recorded in meta.json."""
    import mujoco
    from ..sim.paths import SCENE_XML
    from ..sim.mujoco_sim import PandaMujocoSim
    from ..run.scenarios import apply_table_tilt

    sim = PandaMujocoSim(scene_xml=SCENE_XML)
    tilt = float(meta.get("scenario_tilt_deg", 0.0) or 0.0)
    if abs(tilt) > 1e-12:
        apply_table_tilt(sim, tilt)
    mujoco.mj_forward(sim.model, sim.data)
    return sim


def _set_pose(sim, q):
    import mujoco
    sim.data.qpos[:7] = q
    sim.data.qvel[:7] = 0.0
    mujoco.mj_forward(sim.model, sim.data)


def replay_interactive(t, q, sim, speed: float = 1.0) -> bool:
    """Play the trajectory in a passive viewer.  Returns False when no
    viewer can be created (headless host) so the caller can fall back."""
    try:
        import mujoco.viewer
        handle = mujoco.viewer.launch_passive(sim.model, sim.data)
    except Exception as e:  # noqa: BLE001 — no GL/display is expected headless
        print(f"viewer unavailable ({type(e).__name__}: {e}); "
              "use --offscreen for PNG frames")
        return False
    with handle as viewer:
        t0 = time.time()
        k = 0
        while viewer.is_running() and k < len(t):
            wall = (time.time() - t0) * speed
            while k < len(t) and t[k] - t[0] <= wall:
                k += 1
            _set_pose(sim, q[min(k, len(t) - 1)])
            viewer.sync()
            time.sleep(0.01)
    return True


def replay_offscreen(t, q, sim, out_dir: str | Path, every: int = 40,
                     width: int = 640, height: int = 480) -> list:
    """Render every ``every``-th tick to PNG.  Uses the MuJoCo offscreen
    renderer when a GL backend (EGL/osmesa) exists; otherwise falls back
    to a matplotlib stick-figure schematic (arm linkage from body
    positions + EE trace) so headless hosts still get replay artifacts.
    Returns the list of files written."""
    import mujoco

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ticks = list(range(0, len(t), max(1, every)))
    files = []
    try:
        renderer = mujoco.Renderer(sim.model, height=height, width=width)
    except Exception as e:  # noqa: BLE001 — no GL in headless containers
        print(f"GL renderer unavailable ({type(e).__name__}); "
              "writing schematic frames")
        files = _schematic_frames(t, q, sim, out_dir, ticks)
    else:
        try:
            from matplotlib.image import imsave
            for k in ticks:
                _set_pose(sim, q[k])
                renderer.update_scene(sim.data)
                px = renderer.render()
                f = out_dir / f"frame_{k:06d}_t{t[k]:.3f}.png"
                imsave(f, px)
                files.append(f)
        finally:
            renderer.close()
    print(f"wrote {len(files)} frames to {out_dir}")
    return files


def _schematic_frames(t, q, sim, out_dir: Path, ticks) -> list:
    """GL-free replay frames: side/top orthographic stick figure of the
    arm (world body positions after mj_forward) plus the EE path so far."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import mujoco

    # chain of bodies from base to EE, by world position after FK
    nb = sim.model.nbody
    ee_site = mujoco.mj_name2id(sim.model, mujoco.mjtObj.mjOBJ_SITE, "ee_site")

    # precompute EE path
    ee_path = np.empty((len(t), 3))
    for k in range(len(t)):
        _set_pose(sim, q[k])
        ee_path[k] = sim.data.site_xpos[ee_site]

    files = []
    for k in ticks:
        _set_pose(sim, q[k])
        pts = np.asarray([sim.data.xpos[b] for b in range(1, nb)])
        fig, axes = plt.subplots(1, 2, figsize=(9, 4.2))
        for ax, (i, j), name in zip(axes, [(0, 2), (0, 1)],
                                    ["side (x-z)", "top (x-y)"]):
            ax.plot(pts[:, i], pts[:, j], "o-", ms=3, lw=1.5, color="#444")
            ax.plot(ee_path[:k + 1, i], ee_path[:k + 1, j], "-",
                    lw=1.0, color="tab:blue", alpha=0.8)
            ax.plot(ee_path[k, i], ee_path[k, j], "o", ms=5, color="tab:red")
            ax.set_title(f"{name}  t={t[k]:.3f}s")
            ax.set_aspect("equal")
            ax.grid(True, alpha=0.3)
        fig.tight_layout()
        f = out_dir / f"frame_{k:06d}_t{t[k]:.3f}.png"
        fig.savefig(f, dpi=80)
        plt.close(fig)
        files.append(f)
    return files


def viewer_smoke(duration: float = 3.0, use_viewer: bool = True) -> None:
    """The reference's viewer smoke test (mujoco_viewer.py:22-47): load
    the scene, settle, apply a gentle sinusoidal torque dither.  With
    ``use_viewer=False`` (or on a headless host) the same physics runs
    without a window — the scene-load/step coverage is identical."""
    import mujoco

    sim = _make_scene({})
    model, data = sim.model, sim.data
    for _ in range(50):
        mujoco.mj_step(model, data)

    def dither(tt):
        if model.nu > 0:
            data.ctrl[:] = 0.0
            data.ctrl[: min(7, model.nu)] = 0.3 * np.sin(2.0 * np.pi * 0.5 * tt)

    if use_viewer:
        try:
            import mujoco.viewer
            with mujoco.viewer.launch_passive(model, data) as viewer:
                t0 = time.time()
                while viewer.is_running() and (time.time() - t0) < duration:
                    dither(time.time() - t0)
                    mujoco.mj_step(model, data)
                    viewer.sync()
                    time.sleep(model.opt.timestep)
            print("Viewer smoke test OK.")
            return
        except Exception as e:  # noqa: BLE001
            print(f"viewer unavailable ({type(e).__name__}); running headless")

    n_steps = int(duration / model.opt.timestep)
    for i in range(n_steps):
        dither(i * model.opt.timestep)
        mujoco.mj_step(model, data)
    assert np.all(np.isfinite(data.qpos)), "smoke sim diverged"
    print(f"Headless viewer smoke test OK ({n_steps} steps).")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir", nargs="?", help="RunLogger run directory")
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--offscreen", action="store_true")
    p.add_argument("--every", type=int, default=40,
                   help="render every k-th tick (offscreen)")
    p.add_argument("--out", default=None, help="frame output dir (offscreen)")
    p.add_argument("--smoke", action="store_true",
                   help="run the reference viewer smoke test instead")
    p.add_argument("--duration", type=float, default=3.0)
    p.add_argument("--no-viewer", action="store_true")
    args = p.parse_args(argv)

    if args.smoke:
        viewer_smoke(duration=args.duration, use_viewer=not args.no_viewer)
        return

    if not args.run_dir:
        p.error("RUN_DIR required unless --smoke")
    t, q, meta = load_run(args.run_dir)
    sim = _make_scene(meta)
    out = args.out or (Path(args.run_dir) / "frames")
    if args.offscreen:
        replay_offscreen(t, q, sim, out, every=args.every)
    elif not replay_interactive(t, q, sim, speed=args.speed):
        replay_offscreen(t, q, sim, out, every=args.every)


if __name__ == "__main__":
    main()

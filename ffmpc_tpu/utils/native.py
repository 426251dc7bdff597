"""ctypes binding to the native C++ runtime (native/libffmpc_native.so).

Provides an independent double-precision FK/RNEA oracle and a wait-free
ring-buffer logger for 1 kHz host control loops.  Builds on demand via
``make -C native`` if the shared object is missing.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libffmpc_native.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_SO))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.ffmpc_fk.argtypes = [dp, dp, dp]
    lib.ffmpc_rnea.argtypes = [dp, dp, dp, dp]
    lib.ffmpc_mass_matrix.argtypes = [dp, dp]
    lib.ffmpc_gravity.argtypes = [dp, dp]
    lib.ffmpc_logger_create.restype = ctypes.c_void_p
    lib.ffmpc_logger_create.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.ffmpc_logger_destroy.argtypes = [ctypes.c_void_p]
    lib.ffmpc_logger_push.argtypes = [ctypes.c_void_p, dp]
    lib.ffmpc_logger_drain.restype = ctypes.c_uint64
    lib.ffmpc_logger_drain.argtypes = [ctypes.c_void_p, dp, ctypes.c_uint64]
    lib.ffmpc_logger_dropped.restype = ctypes.c_uint64
    lib.ffmpc_logger_dropped.argtypes = [ctypes.c_void_p]
    ci = ctypes.c_int
    ip = ctypes.POINTER(ctypes.c_int)
    lib.ffmpc_oracle_knot_calc.argtypes = [dp, dp, dp, dp, dp, ci, ci, dp, dp,
                                           dp, dp]
    lib.ffmpc_oracle_solve.argtypes = [dp, dp, ip, dp, dp, dp, ci, dp, dp, dp,
                                       ci, ci, dp, dp, dp, ip]
    _lib = lib
    return lib


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def native_fk(q: np.ndarray):
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    pos = np.zeros(3)
    rot = np.zeros(9)
    lib.ffmpc_fk(_p(q), _p(pos), _p(rot))
    return pos, rot.reshape(3, 3)


def native_rnea(q, v, a):
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    v = np.ascontiguousarray(v, dtype=np.float64)
    a = np.ascontiguousarray(a, dtype=np.float64)
    tau = np.zeros(7)
    lib.ffmpc_rnea(_p(q), _p(v), _p(a), _p(tau))
    return tau


def native_mass_matrix(q):
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    M = np.zeros(49)
    lib.ffmpc_mass_matrix(_p(q), _p(M))
    return M.reshape(7, 7)


def native_gravity(q):
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.float64)
    tau = np.zeros(7)
    lib.ffmpc_gravity(_p(q), _p(tau))
    return tau


class NativeRingLogger:
    """Wait-free single-producer ring logger for fixed-width float64 records."""

    def __init__(self, record_len: int, capacity: int = 1 << 16):
        self._lib = _load()
        self.record_len = int(record_len)
        self.capacity = int(capacity)
        self._h = self._lib.ffmpc_logger_create(self.record_len, self.capacity)

    def push(self, rec: np.ndarray) -> None:
        rec = np.ascontiguousarray(rec, dtype=np.float64)
        assert rec.size == self.record_len
        self._lib.ffmpc_logger_push(self._h, _p(rec))

    def drain(self, max_records: int = 4096) -> np.ndarray:
        out = np.zeros((max_records, self.record_len))
        n = self._lib.ffmpc_logger_drain(self._h, _p(out), max_records)
        return out[:n]

    @property
    def dropped(self) -> int:
        return int(self._lib.ffmpc_logger_dropped(self._h))

    def close(self):
        if self._h:
            self._lib.ffmpc_logger_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---- independent C++ BoxFDDP oracle (native/ffmpc_oracle.cpp) ------------

_ORACLE_W_KEYS = (
    "dt_ocp w_posture w_v w_q_soft_limits q_soft_limit_margin w_ee_ori "
    "w_wdamp w_tau w_tau_soft_limits tau_soft_limit_margin w_ee_pos "
    "w_tangent_pos w_tangent_vel w_plane_z w_vz w_unilateral friction_margin "
    "w_fn fn_des z_press contact_kp contact_kd contact_inv_damping").split()


def oracle_weights_flat(W, model) -> np.ndarray:
    """Flatten an OCPWeights + model limits into the oracle ABI layout."""
    vals = [W.dt_ocp, W.w_posture, W.w_v, W.w_q_soft_limits,
            W.q_soft_limit_margin, W.w_ee_ori, W.w_wdamp, W.w_tau,
            W.w_tau_soft_limits, W.tau_soft_limit_margin, W.w_ee_pos,
            W.w_tangent_pos, W.w_tangent_vel, W.w_plane_z, W.w_vz,
            W.w_unilateral, W.friction_margin, W.w_fn, W.fn_des, W.z_press,
            W.contact_gains[0], W.contact_gains[1], W.contact_inv_damping]
    vals += list(W.v_damp_weights)
    vals += list(W.ori_weights)
    vals += list(W.w_wdamp_weights)
    vals += list(W.ee_pos_weights)
    vals += list(W.tau_limits)
    vals += list(np.asarray(model.q_lower, dtype=float))
    vals += list(np.asarray(model.q_upper, dtype=float))
    return np.asarray(vals, dtype=np.float64)


def oracle_knot_calc(w_flat, ref_pv, x_reg_ref, tau_ref, R_des, surface,
                     terminal, x, u=None):
    lib = _load()
    cc = np.ascontiguousarray
    xnext = np.zeros(14)
    cost = np.zeros(1)
    u = np.zeros(7) if u is None else u
    lib.ffmpc_oracle_knot_calc(
        _p(cc(w_flat, dtype=np.float64)), _p(cc(ref_pv, dtype=np.float64)),
        _p(cc(x_reg_ref, dtype=np.float64)), _p(cc(tau_ref, dtype=np.float64)),
        _p(cc(R_des, dtype=np.float64)), int(surface), int(terminal),
        _p(cc(x, dtype=np.float64)), _p(cc(u, dtype=np.float64)),
        _p(xnext), _p(cost))
    return xnext, float(cost[0])


def oracle_solve(w_flat, pv, surface, x_reg_ref, tau_ref, R_des, x0, xs_init,
                 us_init, max_iters=10, use_box=True):
    """Full independent BoxFDDP solve.  pv: (N+1, 6); surface: (N,) bools."""
    import ctypes
    lib = _load()
    cc = np.ascontiguousarray
    N = len(surface)
    surf = np.ascontiguousarray(np.asarray(surface, dtype=np.int32))
    xs_out = np.zeros((N + 1, 14))
    us_out = np.zeros((N, 7))
    cost = np.zeros(1)
    iters = np.zeros(1, dtype=np.int32)
    lib.ffmpc_oracle_solve(
        _p(cc(w_flat, dtype=np.float64)), _p(cc(pv, dtype=np.float64)),
        surf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _p(cc(x_reg_ref, dtype=np.float64)), _p(cc(tau_ref, dtype=np.float64)),
        _p(cc(R_des, dtype=np.float64)), N,
        _p(cc(x0, dtype=np.float64)), _p(cc(xs_init, dtype=np.float64)),
        _p(cc(us_init, dtype=np.float64)), int(max_iters), int(use_box),
        _p(xs_out), _p(us_out), _p(cost),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return xs_out, us_out, float(cost[0]), int(iters[0])


# ---- augmented LPF (force-feedback) oracle family -------------------------

def oracle_weights_flat_aug(W, model) -> np.ndarray:
    """Augmented-family oracle ABI: the 60 classical doubles followed by
    [alpha_lpf, w_w, w_w_soft_limits, w_soft_margin, w_y,
     use_inner_state_reg, use_inner_tau_reg, y_weights[21]] (88 total).
    Mirrors the reference _AugmentedLPFActionModel constructor arguments
    (crocoddyl_force_feedback.py:156-183)."""
    base = oracle_weights_flat(W, model)
    yw = np.asarray(W.y_weights, dtype=float).reshape(21)
    tail = np.asarray(
        [W.ff_alpha, W.w_w, W.w_w_soft_limits, W.tau_soft_limit_margin,
         W.w_y, float(W.use_inner_state_reg), float(W.use_inner_tau_reg)],
        dtype=np.float64)
    return np.concatenate([base, tail, yw])


def _bind_aug(lib):
    if getattr(lib, "_aug_bound", False):
        return
    dp = ctypes.POINTER(ctypes.c_double)
    ci = ctypes.c_int
    ip = ctypes.POINTER(ctypes.c_int)
    lib.ffmpc_oracle_knot_calc_aug.argtypes = [dp, dp, dp, dp, dp, dp, ci,
                                               ci, dp, dp, dp, dp]
    lib.ffmpc_oracle_solve_aug.argtypes = [dp, dp, ip, dp, dp, dp, dp, ci,
                                           dp, dp, dp, ci, ci, dp, dp, dp,
                                           ip]
    lib._aug_bound = True


def oracle_knot_calc_aug(w_flat, ref_pv, x_reg_ref, tau_ref, R_des, y_ref,
                         surface, terminal, y, w=None):
    lib = _load()
    _bind_aug(lib)
    cc = np.ascontiguousarray
    ynext = np.zeros(21)
    cost = np.zeros(1)
    w = np.zeros(7) if w is None else w
    lib.ffmpc_oracle_knot_calc_aug(
        _p(cc(w_flat, dtype=np.float64)), _p(cc(ref_pv, dtype=np.float64)),
        _p(cc(x_reg_ref, dtype=np.float64)), _p(cc(tau_ref, dtype=np.float64)),
        _p(cc(R_des, dtype=np.float64)), _p(cc(y_ref, dtype=np.float64)),
        int(surface), int(terminal),
        _p(cc(y, dtype=np.float64)), _p(cc(w, dtype=np.float64)),
        _p(ynext), _p(cost))
    return ynext, float(cost[0])


def oracle_solve_aug(w_flat, pv, surface, x_reg_ref, tau_ref, R_des, y_ref,
                     y0, ys_init, ws_init, max_iters=10, use_box=True):
    """Full independent augmented-family BoxFDDP solve (21-state)."""
    lib = _load()
    _bind_aug(lib)
    cc = np.ascontiguousarray
    N = len(surface)
    surf = np.ascontiguousarray(np.asarray(surface, dtype=np.int32))
    ys_out = np.zeros((N + 1, 21))
    ws_out = np.zeros((N, 7))
    cost = np.zeros(1)
    iters = np.zeros(1, dtype=np.int32)
    lib.ffmpc_oracle_solve_aug(
        _p(cc(w_flat, dtype=np.float64)), _p(cc(pv, dtype=np.float64)),
        surf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _p(cc(x_reg_ref, dtype=np.float64)), _p(cc(tau_ref, dtype=np.float64)),
        _p(cc(R_des, dtype=np.float64)), _p(cc(y_ref, dtype=np.float64)), N,
        _p(cc(y0, dtype=np.float64)), _p(cc(ys_init, dtype=np.float64)),
        _p(cc(ws_init, dtype=np.float64)), int(max_iters), int(use_box),
        _p(ys_out), _p(ws_out), _p(cost),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return ys_out, ws_out, float(cost[0]), int(iters[0])


# ---- iterate-level tracing (VERDICT r3 item 3) ----------------------------

# per-iteration trace row layout shared with the C++ side
# (native/ffmpc_oracle.cpp TRACE_FIELDS)
ORACLE_TRACE_FIELDS = ("cost_cur", "cost_try", "accepted", "alpha", "dg",
                       "dq", "d1", "dVexp", "xreg", "gap_norm", "stop",
                       "feasible", "bw_retries")


def _bind_traced(lib):
    if getattr(lib, "_traced_bound", False):
        return
    dp = ctypes.POINTER(ctypes.c_double)
    ci = ctypes.c_int
    ip = ctypes.POINTER(ctypes.c_int)
    lib.ffmpc_oracle_solve_traced.argtypes = [
        dp, dp, ip, dp, dp, dp, ci, dp, dp, dp, ci, ci, dp, dp, dp, ip, dp]
    lib.ffmpc_oracle_solve_aug_traced.argtypes = [
        dp, dp, ip, dp, dp, dp, dp, ci, dp, dp, dp, ci, ci, dp, dp, dp, ip,
        dp]
    lib.ffmpc_oracle_knot_diff.argtypes = [
        dp, dp, dp, dp, dp, dp, ci, ci, ci, dp, dp, dp, dp, dp, dp, dp, dp,
        dp, dp]
    lib._traced_bound = True


def oracle_solve_traced(w_flat, pv, surface, x_reg_ref, tau_ref, R_des, x0,
                        xs_init, us_init, max_iters=10, use_box=True):
    """Classical-family solve + per-iteration trace dict (each field a
    (max_iters,) array; rows past the actual iteration count are zero)."""
    lib = _load()
    _bind_traced(lib)
    cc = np.ascontiguousarray
    N = len(surface)
    surf = np.ascontiguousarray(np.asarray(surface, dtype=np.int32))
    xs_out = np.zeros((N + 1, 14))
    us_out = np.zeros((N, 7))
    cost = np.zeros(1)
    iters = np.zeros(1, dtype=np.int32)
    trace = np.zeros((max_iters, len(ORACLE_TRACE_FIELDS)))
    lib.ffmpc_oracle_solve_traced(
        _p(cc(w_flat, dtype=np.float64)), _p(cc(pv, dtype=np.float64)),
        surf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _p(cc(x_reg_ref, dtype=np.float64)), _p(cc(tau_ref, dtype=np.float64)),
        _p(cc(R_des, dtype=np.float64)), N,
        _p(cc(x0, dtype=np.float64)), _p(cc(xs_init, dtype=np.float64)),
        _p(cc(us_init, dtype=np.float64)), int(max_iters), int(use_box),
        _p(xs_out), _p(us_out), _p(cost),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), _p(trace))
    tr = {k: trace[:, i].copy() for i, k in enumerate(ORACLE_TRACE_FIELDS)}
    return xs_out, us_out, float(cost[0]), int(iters[0]), tr


def oracle_solve_aug_traced(w_flat, pv, surface, x_reg_ref, tau_ref, R_des,
                            y_ref, y0, ys_init, ws_init, max_iters=10,
                            use_box=True):
    """Augmented-family solve + per-iteration trace dict."""
    lib = _load()
    _bind_traced(lib)
    cc = np.ascontiguousarray
    N = len(surface)
    surf = np.ascontiguousarray(np.asarray(surface, dtype=np.int32))
    ys_out = np.zeros((N + 1, 21))
    ws_out = np.zeros((N, 7))
    cost = np.zeros(1)
    iters = np.zeros(1, dtype=np.int32)
    trace = np.zeros((max_iters, len(ORACLE_TRACE_FIELDS)))
    lib.ffmpc_oracle_solve_aug_traced(
        _p(cc(w_flat, dtype=np.float64)), _p(cc(pv, dtype=np.float64)),
        surf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _p(cc(x_reg_ref, dtype=np.float64)), _p(cc(tau_ref, dtype=np.float64)),
        _p(cc(R_des, dtype=np.float64)), _p(cc(y_ref, dtype=np.float64)), N,
        _p(cc(y0, dtype=np.float64)), _p(cc(ys_init, dtype=np.float64)),
        _p(cc(ws_init, dtype=np.float64)), int(max_iters), int(use_box),
        _p(ys_out), _p(ws_out), _p(cost),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), _p(trace))
    tr = {k: trace[:, i].copy() for i, k in enumerate(ORACLE_TRACE_FIELDS)}
    return ys_out, ws_out, float(cost[0]), int(iters[0]), tr


def oracle_knot_diff(w_flat, ref_pv, x_reg_ref, tau_ref, R_des, surface,
                     terminal, x, u=None, y_ref=None, aug=False):
    """Single-knot FD derivatives from the C++ oracle: dict with
    Fx/Fu/Lx/Lu/Lxx/Lxu/Luu/cost at the given state — for cross-checking
    the JAX analytic derivatives at captured (divergent) states."""
    lib = _load()
    _bind_traced(lib)
    cc = np.ascontiguousarray
    nx = 21 if aug else 14
    if y_ref is None:
        y_ref = np.zeros(21)
    u = np.zeros(7) if u is None else u
    Fx = np.zeros((nx, nx))
    Fu = np.zeros((nx, 7))
    Lx = np.zeros(nx)
    Lu = np.zeros(7)
    Lxx = np.zeros((nx, nx))
    Lxu = np.zeros((nx, 7))
    Luu = np.zeros((7, 7))
    cost = np.zeros(1)
    lib.ffmpc_oracle_knot_diff(
        _p(cc(w_flat, dtype=np.float64)), _p(cc(ref_pv, dtype=np.float64)),
        _p(cc(x_reg_ref, dtype=np.float64)), _p(cc(tau_ref, dtype=np.float64)),
        _p(cc(R_des, dtype=np.float64)), _p(cc(y_ref, dtype=np.float64)),
        int(aug), int(surface), int(terminal),
        _p(cc(x, dtype=np.float64)), _p(cc(u, dtype=np.float64)),
        _p(Fx), _p(Fu), _p(Lx), _p(Lu), _p(Lxx), _p(Lxu), _p(Luu), _p(cost))
    return dict(Fx=Fx, Fu=Fu, Lx=Lx, Lu=Lu, Lxx=Lxx, Lxu=Lxu, Luu=Luu,
                cost=float(cost[0]))

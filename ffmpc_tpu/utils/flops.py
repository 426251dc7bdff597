"""Analytic FLOP accounting for one BoxFDDP solve (VERDICT r3 item 6).

Makes the solves/s headline comparable across hardware: bench.py multiplies
``flops_per_solve`` by the measured solve rate and divides by the chip's
peak to report an MFU-style utilization figure.

The count is an *analytic lower bound* built from the algorithm's dense
shapes (nx/nu/nq/N/iters/alphas), not a hardware op count: XLA/Mosaic
padding (7-wide rows on 128 lanes), rematerialization, and the masked
parallel-scan variants all execute more hardware FLOPs than this.  Counting
convention: one fused multiply-add = 2 FLOPs; an (m,k)@(k,n) matmul =
2mkn.

Stage inventory per solver iteration (reference semantics
crocoddyl SolverBoxFDDP, src/mpc/crocoddyl_classical.py:442-445):
  N x knot derivative pass (calc + analytic GN derivatives)
  N x backward Riccati step with projected-Newton box-QP
  n_alphas x N x line-search rollout knot evaluations
"""

from __future__ import annotations


def _rigid_body_chain_flops(nq: int = 7, nc: int = 1) -> float:
    """One evaluation of the contact-dynamics chain: FK + frame Jacobian +
    RNEA + CRBA mass matrix + Cholesky + nc-row contact KKT solve +
    semi-implicit Euler step.  Per-term estimates for a serial revolute
    chain (core/kinematics.py, core/dynamics.py)."""
    fk = 70 * nq                       # rotation compose + origin transform
    jac = 120 * nq                     # 6xnq frame Jacobian (cross products)
    rnea = 130 * nq                    # inverse dynamics, 2 passes
    crba = 30 * nq * nq                # composite-rigid-body mass matrix
    chol = nq ** 3 // 3 + nq * nq      # LL^T + diag work
    # damped KKT: M^-1 J^T (nc chol solves) + Schur nc x nc + a update
    kkt = nc * 4 * nq * nq + nc ** 3 + 2 * nq * nq
    euler = 8 * nq
    return float(fk + jac + rnea + crba + chol + kkt + euler)


def _cost_stack_flops(nx: int, nu: int, nr: int = 30) -> float:
    """Residual + activation evaluation: frame translation/rotation(log3)/
    velocity residuals, force residual, barriers, weighted quads —
    ~nr scalar rows, each a handful of FLOPs, plus the log3 map."""
    return float(12 * nr + 150 + 2 * nx + 2 * nu)


def knot_calc_flops(nx: int, nu: int, nq: int = 7) -> float:
    return _rigid_body_chain_flops(nq) + _cost_stack_flops(nx, nu)


def knot_diff_flops(nx: int, nu: int, nq: int = 7, nr: int = 30) -> float:
    """Analytic GN derivative pass: one primal chain + (nq + nu) structured
    tangent sweeps through the dynamics chain (scalar-analytic sweeps,
    core/scalar_chain.py; each sweep ~60% of a primal evaluation since
    constant subtrees fold), plus the Gauss-Newton quadratic assembly
    J^T A J for the nr-row residual stack."""
    chain = _rigid_body_chain_flops(nq)
    sweeps = (nq + nu) * 0.6 * chain
    gn = 2 * nr * nx * nx + 2 * nr * nx * nu + 2 * nr * nu * nu
    return chain + sweeps + gn + _cost_stack_flops(nx, nu, nr)


def knot_backward_flops(nx: int, nu: int, boxqp_iters: int = 8) -> float:
    """One backward Riccati step: Q assembly (Fx^T Vxx Fx etc.),
    projected-Newton box-QP on Quu, masked gain solve, value recursion
    (solver/fddp.py backward_store)."""
    q_assembly = (2 * 2 * nx ** 3          # Vxx@Fx, Fx^T@(.)
                  + 2 * 2 * nx * nx * nu   # Vxx@Fu, Fx^T@(.)
                  + 2 * nx * nu * nu       # Fu^T@(.)
                  + 2 * nx * nx + 2 * nx * nu)   # Qx, Qu
    boxqp = boxqp_iters * (nu ** 3 // 3 + 4 * nu * nu)
    gain_solve = nu ** 3 // 3 + 2 * nu * nu * nx
    recursion = (2 * nx * nu               # Quu@kff
                 + 2 * nu * nx + 2 * nx * nx * nu   # Vx, Qxu@K
                 + 3 * nx * nx)            # symmetrize + reg + gap deflect
    return float(q_assembly + boxqp + gain_solve + recursion)


def knot_rollout_flops(nx: int, nu: int, nq: int = 7) -> float:
    """One line-search rollout knot: policy u = u - a*k - K dx (one
    (nu,nx) matvec) + clamp + a full knot calc."""
    return 2 * nu * nx + 2 * nu + knot_calc_flops(nx, nu, nq)


def flops_per_solve(N: int = 40, iters: int = 10, nx: int = 21, nu: int = 7,
                    n_alphas: int = 10, nq: int = 7,
                    boxqp_iters: int = 8) -> float:
    """Total analytic FLOPs for one full BoxFDDP solve at the flagship
    shapes (N=40 augmented contact OCP, 10 iterations, 10-alpha batched
    line search)."""
    per_iter = N * (knot_diff_flops(nx, nu, nq)
                    + knot_backward_flops(nx, nu, boxqp_iters)
                    + n_alphas * knot_rollout_flops(nx, nu, nq))
    # initial-iterate calc pass (gaps/cost) once per iteration
    per_iter += N * knot_calc_flops(nx, nu, nq)
    return iters * per_iter


# Peak dense-compute figures for utilization normalization.
# TPU v5e (v5 lite): 197 TFLOP/s bf16 MXU peak (public spec).  This
# workload is small-matrix/VPU-dominated f32, so MFU vs the MXU peak is the
# honest "how far from the speed of light" number, and will be small.
PEAK_FLOPS = {
    "tpu_v5e_bf16": 197e12,
    "tpu_v5e_fp32_vpu": 4.9e12,   # ~197/40: 8x128 VPU, 4 ALUs @ ~940 MHz
}


def mfu(solves_per_s: float, flops_solve: float,
        peak: float = PEAK_FLOPS["tpu_v5e_bf16"]) -> float:
    return solves_per_s * flops_solve / peak

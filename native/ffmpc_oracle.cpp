// ffmpc_oracle: an INDEPENDENT C++ implementation of the classical Panda
// contact-MPC shooting problem and the Crocoddyl BoxFDDP algorithm, used as
// a cross-language parity oracle for the JAX solver stack.
//
// Why it exists: the project north-star requires tau-parity against
// Crocoddyl, but crocoddyl/pinocchio binaries cannot be installed in this
// container (no package installs).  This oracle re-implements the same
// *published* algorithm (Mastalli et al., ICRA 2020; SolverBoxFDDP
// semantics as used by the reference at crocoddyl_classical.py:442-445)
// from the spec, sharing no code with the JAX path:
//   - rigid-body terms come from the native RNEA/FK in ffmpc_native.cpp
//     (itself an independent recursion, validated vs MuJoCo),
//   - ALL derivatives are central finite differences (the JAX side is
//     analytic/AD), so a sign or term error on either side breaks parity,
//   - the cost stack mirrors the reference's _make_dam
//     (crocoddyl_classical.py:558-728) with Gauss-Newton assembly exactly
//     as Crocoddyl's calcDiff does.
//
// Scope: BOTH knot families —
//   classical (nx=14, nu=7), free + normal_1d contact, and
//   augmented LPF force-feedback (ny=21 with y=(q,v,tau), control w,
//   tau+ = alpha tau + (1-alpha) w, outer y/w regularization costs;
//   reference _AugmentedLPFActionModel,
//   /root/reference/src/mpc/crocoddyl_force_feedback.py:149-290).
// The FDDP/BoxFDDP core is templated on the state dimension and shared.
// Exposed via ctypes (ffmpc_tpu/utils/native.py).
//
// Build: make -C native

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

extern "C" {
void ffmpc_fk(const double* q, double* ee_pos, double* ee_rot);
void ffmpc_rnea(const double* q, const double* v, const double* a, double* tau);
void ffmpc_mass_matrix(const double* q, double* M);
}

namespace oracle {

// ---------------- small dense linear algebra ----------------

// Cholesky factor (lower) in place; n <= 14.
static bool chol(double* A, int n) {
  for (int j = 0; j < n; ++j) {
    double d = A[j * n + j];
    for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
    if (!(d > 0.0)) return false;
    d = std::sqrt(d);
    A[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = s / d;
    }
  }
  return true;
}

static void chol_solve_vec(const double* L, int n, const double* b, double* x) {
  std::vector<double> y(n);
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * y[k];
    y[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
}

// ---------------- problem definition ----------------

struct Weights {
  double dt_ocp;
  double w_posture, w_v, w_q_soft, q_soft_margin;
  double w_ee_ori, w_wdamp, w_tau, w_tau_soft, tau_soft_margin;
  double w_ee_pos, w_tangent_pos, w_tangent_vel, w_plane_z, w_vz;
  double w_unilateral, friction_margin, w_fn, fn_des, z_press;
  double contact_kp, contact_kd, contact_c;
  double v_damp_w[7];
  double ori_w[3], wdamp_w[3], ee_pos_w[3];
  double tau_limits[7], q_lower[7], q_upper[7];
  // augmented LPF family (crocoddyl_force_feedback.py:156-183)
  double alpha_lpf;          // LPF pole, clipped to [0, 0.999999]
  double w_w, w_w_soft, w_soft_margin, w_y;
  double use_inner_state_reg, use_inner_tau_reg;   // 0/1 flags
  double y_weights[21];
};

struct Refs {
  // per-knot (N+1 rows): p_ref[3], v_ref[3]
  const double* pv;  // (N+1, 6)
  const double* x_reg_ref;  // (14,)
  const double* tau_ref;    // (7,)
  const double* R_des;      // (9,) row-major
  const double* y_ref;      // (21,) augmented-family y_reg reference
  int N;
};

static const int NX = 14, NU = 7, NY = 21;

// residual layout (classical knot).  Activation kinds:
enum ActKind { QUAD, WQUAD, BARRIER };
struct Term {
  int offset, nr;
  ActKind kind;
  double weight;
  bool dt_scaled, terminal, is_u;   // is_u: residual depends on u only
  double w[21];                     // wquad weights
  double lb[21], ub[21];            // barrier bounds
};

struct Stack {
  std::vector<Term> terms;
  int nr_total = 0;
  void add(Term t) {
    t.offset = nr_total;
    nr_total += t.nr;
    terms.push_back(t);
  }
};

// aug=true builds the inner stack of the augmented LPF wrapper: the
// use_inner_* flags drop inner regularizers (crocoddyl_force_feedback.py
// _make_dam; cfg.use_inner_state_reg / use_inner_tau_reg) and the outer
// y/w terms are appended (discrete-level: never dt-scaled).
static Stack make_stack(const Weights& W, bool surface, bool terminal,
                        bool aug = false) {
  Stack S;
  Term t{};
  bool state_reg = !aug || W.use_inner_state_reg > 0.5;
  bool tau_reg = !aug || W.use_inner_tau_reg > 0.5;
  if (state_reg) {
    // posture (14, quad)
    t = Term{}; t.nr = 14; t.kind = QUAD; t.weight = W.w_posture;
    t.dt_scaled = true; t.terminal = true; S.add(t);
    // v_damp (14, wquad on v part)
    t = Term{}; t.nr = 14; t.kind = WQUAD; t.weight = W.w_v;
    t.dt_scaled = true; t.terminal = true;
    for (int i = 0; i < 7; ++i) { t.w[i] = 0.0; t.w[7 + i] = W.v_damp_w[i]; }
    S.add(t);
  }
  // q soft limits (14, barrier)
  if (W.w_q_soft > 0.0) {
    t = Term{}; t.nr = 14; t.kind = BARRIER; t.weight = W.w_q_soft;
    t.dt_scaled = true; t.terminal = true;
    for (int i = 0; i < 7; ++i) {
      double qr = 0.5 * (W.q_lower[i] + W.q_upper[i]);
      double lb = (W.q_lower[i] + W.q_soft_margin) - qr;
      double ub = (W.q_upper[i] - W.q_soft_margin) - qr;
      if (lb > ub) { lb = -1e-3; ub = 1e-3; }
      t.lb[i] = lb; t.ub[i] = ub;
      t.lb[7 + i] = -1e30; t.ub[7 + i] = 1e30;
    }
    S.add(t);
  }
  // ee orientation log3 (3, wquad)
  t = Term{}; t.nr = 3; t.kind = WQUAD; t.weight = W.w_ee_ori;
  t.dt_scaled = true; t.terminal = true;
  for (int i = 0; i < 3; ++i) t.w[i] = W.ori_w[i];
  S.add(t);
  // w_damp (6, wquad on angular part)
  t = Term{}; t.nr = 6; t.kind = WQUAD; t.weight = W.w_wdamp;
  t.dt_scaled = true; t.terminal = true;
  t.w[0] = t.w[1] = t.w[2] = 0.0;
  for (int i = 0; i < 3; ++i) t.w[3 + i] = W.wdamp_w[i];
  S.add(t);
  if (!terminal && tau_reg) {
    // tau reg (7, quad, u-only)
    t = Term{}; t.nr = 7; t.kind = QUAD; t.weight = W.w_tau;
    t.dt_scaled = true; t.terminal = false; t.is_u = true; S.add(t);
    if (W.w_tau_soft > 0.0) {
      t = Term{}; t.nr = 7; t.kind = BARRIER; t.weight = W.w_tau_soft;
      t.dt_scaled = true; t.terminal = false; t.is_u = true;
      double minlim = 1e30;
      for (int i = 0; i < 7; ++i) minlim = std::min(minlim, W.tau_limits[i]);
      double margin = std::min(std::max(W.tau_soft_margin, 0.0), minlim - 1e-6);
      for (int i = 0; i < 7; ++i) {
        t.lb[i] = -W.tau_limits[i] + margin;
        t.ub[i] = W.tau_limits[i] - margin;
      }
      S.add(t);
    }
  }
  if (!surface) {
    // ee_pos (3, wquad)
    t = Term{}; t.nr = 3; t.kind = WQUAD; t.weight = W.w_ee_pos;
    t.dt_scaled = true; t.terminal = true;
    for (int i = 0; i < 3; ++i) t.w[i] = W.ee_pos_w[i];
    S.add(t);
  } else {
    // ee_xy (3, wquad [1,1,0])
    t = Term{}; t.nr = 3; t.kind = WQUAD; t.weight = W.w_tangent_pos;
    t.dt_scaled = true; t.terminal = true; t.w[0] = t.w[1] = 1.0; t.w[2] = 0.0;
    S.add(t);
    // ee_vxy (6, wquad [1,1,0,0,0,0])
    t = Term{}; t.nr = 6; t.kind = WQUAD; t.weight = W.w_tangent_vel;
    t.dt_scaled = true; t.terminal = true; t.w[0] = t.w[1] = 1.0;
    S.add(t);
    if (W.w_plane_z > 0.0) {
      t = Term{}; t.nr = 3; t.kind = WQUAD; t.weight = W.w_plane_z;
      t.dt_scaled = true; t.terminal = true; t.w[2] = 1.0; S.add(t);
    }
    if (W.w_vz > 0.0) {
      t = Term{}; t.nr = 6; t.kind = WQUAD; t.weight = W.w_vz;
      t.dt_scaled = true; t.terminal = true; t.w[2] = 1.0; S.add(t);
    }
    if (W.w_unilateral > 0.0) {
      t = Term{}; t.nr = 1; t.kind = BARRIER; t.weight = W.w_unilateral;
      t.dt_scaled = true; t.terminal = true;
      t.lb[0] = W.friction_margin; t.ub[0] = 1e30; S.add(t);
    }
    if (W.w_fn > 0.0) {
      t = Term{}; t.nr = 1; t.kind = WQUAD; t.weight = W.w_fn;
      t.dt_scaled = true; t.terminal = true; t.w[0] = 1.0; S.add(t);
    }
  }
  if (aug) {
    // outer augmented costs (discrete-level, never dt-scaled;
    // crocoddyl_force_feedback.py:224-234).  At the terminal knot w = 0,
    // so the w terms contribute zero there (kept for layout symmetry).
    if (W.w_y > 0.0) {
      t = Term{}; t.nr = 21; t.kind = WQUAD; t.weight = W.w_y;
      t.dt_scaled = false; t.terminal = true;
      for (int i = 0; i < 21; ++i) t.w[i] = W.y_weights[i] * W.y_weights[i];
      S.add(t);
    }
    if (!terminal && W.w_w > 0.0) {
      t = Term{}; t.nr = 7; t.kind = QUAD; t.weight = W.w_w;
      t.dt_scaled = false; t.terminal = false; t.is_u = true; S.add(t);
    }
    if (!terminal && W.w_w_soft > 0.0) {
      t = Term{}; t.nr = 7; t.kind = BARRIER; t.weight = W.w_w_soft;
      t.dt_scaled = false; t.terminal = false; t.is_u = true;
      for (int i = 0; i < 7; ++i) {
        double lim = std::max(W.tau_limits[i] - W.w_soft_margin, 1e-9);
        t.lb[i] = -lim; t.ub[i] = lim;
      }
      S.add(t);
    }
  }
  return S;
}

// world-aligned frame Jacobian columns at the ee (matches
// kinematics.ee_jacobian): axis_j x (p_ee - p_j) / axis_j.
static void ee_jac(const double* q, double Jp[3][7], double Jr[3][7],
                   double* ee_p_out, double* ee_R_out) {
  // replicate the FK chain to harvest joint origins + axes
  static const double S2 = 0.7071067811865476;
  static const double JPOS[7][3] = {
      {0, 0, 0.333}, {0, 0, 0}, {0, -0.316, 0}, {0.0825, 0, 0},
      {-0.0825, 0.384, 0}, {0, 0, 0}, {0.088, 0, 0}};
  static const double JQ[7][4] = {
      {1, 0, 0, 0}, {S2, -S2, 0, 0}, {S2, S2, 0, 0}, {S2, S2, 0, 0},
      {S2, -S2, 0, 0}, {S2, S2, 0, 0}, {S2, S2, 0, 0}};
  // base: link0 is rotated 180 deg about z in the scene (BASE_QUAT wxyz
  // = (0,0,0,1)); matches ffmpc_native.cpp's FK chain
  double R[9] = {-1, 0, 0, 0, -1, 0, 0, 0, 1};
  double p[3] = {0, 0, 0};
  double jp_w[7][3], ax_w[7][3];
  auto quat_rot = [](const double* Q, double* out) {
    double w = Q[0], x = Q[1], y = Q[2], z = Q[3];
    out[0] = 1 - 2 * (y * y + z * z); out[1] = 2 * (x * y - z * w); out[2] = 2 * (x * z + y * w);
    out[3] = 2 * (x * y + z * w); out[4] = 1 - 2 * (x * x + z * z); out[5] = 2 * (y * z - x * w);
    out[6] = 2 * (x * z - y * w); out[7] = 2 * (y * z + x * w); out[8] = 1 - 2 * (x * x + y * y);
  };
  auto mm = [](const double* A, const double* B, double* C) {
    double T[9];
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        T[3 * i + j] = 0;
        for (int k = 0; k < 3; ++k) T[3 * i + j] += A[3 * i + k] * B[3 * k + j];
      }
    std::memcpy(C, T, sizeof(T));
  };
  for (int i = 0; i < 7; ++i) {
    double d[3];
    for (int r = 0; r < 3; ++r)
      d[r] = R[3 * r + 0] * JPOS[i][0] + R[3 * r + 1] * JPOS[i][1] +
             R[3 * r + 2] * JPOS[i][2];
    p[0] += d[0]; p[1] += d[1]; p[2] += d[2];
    jp_w[i][0] = p[0]; jp_w[i][1] = p[1]; jp_w[i][2] = p[2];
    double Rj[9], Rq[9];
    quat_rot(JQ[i], Rj);
    mm(R, Rj, R);
    double c = std::cos(q[i]), s = std::sin(q[i]);
    double Rz[9] = {c, -s, 0, s, c, 0, 0, 0, 1};
    mm(R, Rz, R);
    (void)Rq;
    ax_w[i][0] = R[2]; ax_w[i][1] = R[5]; ax_w[i][2] = R[8];
  }
  double ee_p[3], ee_R[9];
  ffmpc_fk(q, ee_p, ee_R);
  for (int j = 0; j < 7; ++j) {
    double r[3] = {ee_p[0] - jp_w[j][0], ee_p[1] - jp_w[j][1],
                   ee_p[2] - jp_w[j][2]};
    const double* a = ax_w[j];
    Jp[0][j] = a[1] * r[2] - a[2] * r[1];
    Jp[1][j] = a[2] * r[0] - a[0] * r[2];
    Jp[2][j] = a[0] * r[1] - a[1] * r[0];
    Jr[0][j] = a[0]; Jr[1][j] = a[1]; Jr[2][j] = a[2];
  }
  if (ee_p_out) std::memcpy(ee_p_out, ee_p, sizeof(ee_p));
  if (ee_R_out) std::memcpy(ee_R_out, ee_R, sizeof(ee_R));
}

// SO(3) log map (matches core/spatial.log3)
static void log3(const double* R, double* out) {
  double tr = R[0] + R[4] + R[8];
  double c = std::min(1.0, std::max(-1.0, (tr - 1.0) * 0.5));
  double theta = std::acos(c);
  double w[3] = {0.5 * (R[7] - R[5]), 0.5 * (R[2] - R[6]),
                 0.5 * (R[3] - R[1])};
  double factor;
  if (theta < 1e-5) factor = 1.0 + theta * theta / 6.0;
  else factor = theta / std::sin(theta);
  out[0] = w[0] * factor; out[1] = w[1] * factor; out[2] = w[2] * factor;
}

// one knot: xnext(14), residual stack, cost.  ref_pv = (p_ref[3], v_ref[3]).
struct KnotOut {
  double xnext[NX];
  double cost;
};

static void knot_residuals(const Weights& W, const Refs& refs, bool surface,
                           bool terminal, const double* ref_pv,
                           const double* x, const double* u, double* r_out,
                           double* xnext_out, bool aug = false) {
  // crocoddyl's terminal calc runs with u = unone (zeros): the terminal
  // contact force is computed at zero torque.  Classical call sites pass
  // u = nullptr at the terminal; the augmented wrapper instead passes the
  // tau STATE as the inner control even at the terminal knot (the wrapper
  // always calls the inner running calc — crocoddyl_force_feedback.py:220).
  static const double U0[NU] = {0, 0, 0, 0, 0, 0, 0};
  if (u == nullptr) u = U0;
  const double* q = x;
  const double* v = x + 7;
  double Jp[3][7], Jr[3][7], ee_p[3], ee_R[9];
  ee_jac(q, Jp, Jr, ee_p, ee_R);

  // dynamics
  double M[49];
  ffmpc_mass_matrix(q, M);
  double zero[7] = {0};
  double bias[7];
  ffmpc_rnea(q, v, zero, bias);
  double L[49];
  std::memcpy(L, M, sizeof(M));
  chol(L, 7);
  double tb[7];
  for (int i = 0; i < 7; ++i) tb[i] = u[i] - bias[i];
  double minv_tau[7];
  chol_solve_vec(L, 7, tb, minv_tau);

  double force = 0.0;
  double acc[7];
  if (!surface) {
    std::memcpy(acc, minv_tau, sizeof(acc));
  } else {
    // normal_1d damped-KKT contact with Baumgarte + drift (matches
    // core/dynamics.fwd_dynamics_contact)
    double Jn[7];
    for (int j = 0; j < 7; ++j) Jn[j] = Jp[2][j];
    // drift gamma = d(Jp v)/dt |fixed v, z row: directional FD along v
    double h = 1e-6;
    double qp[7], qm[7];
    for (int i = 0; i < 7; ++i) { qp[i] = q[i] + h * v[i]; qm[i] = q[i] - h * v[i]; }
    double Jpp[3][7], Jrp[3][7], Jpm[3][7], Jrm[3][7];
    ee_jac(qp, Jpp, Jrp, nullptr, nullptr);
    ee_jac(qm, Jpm, Jrm, nullptr, nullptr);
    double gp = 0, gm = 0;
    for (int j = 0; j < 7; ++j) { gp += Jpp[2][j] * v[j]; gm += Jpm[2][j] * v[j]; }
    double gamma = (gp - gm) / (2 * h);

    double z_target = ref_pv[2] - W.z_press;
    double gap = ee_p[2] - z_target;
    double vel_c = 0;
    for (int j = 0; j < 7; ++j) vel_c += Jn[j] * v[j];
    double a_des = -gamma - W.contact_kp * gap - W.contact_kd * vel_c;

    double minv_Jt[7];
    chol_solve_vec(L, 7, Jn, minv_Jt);
    double Ssc = W.contact_c;
    for (int j = 0; j < 7; ++j) Ssc += Jn[j] * minv_Jt[j];
    double rhs = a_des;
    for (int j = 0; j < 7; ++j) rhs -= Jn[j] * minv_tau[j];
    force = rhs / Ssc;
    for (int j = 0; j < 7; ++j) acc[j] = minv_tau[j] + minv_Jt[j] * force;
  }
  double dt = W.dt_ocp;
  for (int i = 0; i < 7; ++i) {
    double vn = v[i] + dt * acc[i];
    xnext_out[7 + i] = vn;
    xnext_out[i] = q[i] + dt * vn;
  }

  // residuals in stack order
  double vel6[6] = {0, 0, 0, 0, 0, 0};
  for (int j = 0; j < 7; ++j) {
    vel6[0] += Jp[0][j] * v[j]; vel6[1] += Jp[1][j] * v[j];
    vel6[2] += Jp[2][j] * v[j];
    vel6[3] += Jr[0][j] * v[j]; vel6[4] += Jr[1][j] * v[j];
    vel6[5] += Jr[2][j] * v[j];
  }
  int off = 0;
  bool state_reg = !aug || W.use_inner_state_reg > 0.5;
  bool tau_reg = !aug || W.use_inner_tau_reg > 0.5;
  if (state_reg) {
    // posture
    for (int i = 0; i < 14; ++i) r_out[off + i] = x[i] - refs.x_reg_ref[i];
    off += 14;
    // v_damp
    for (int i = 0; i < 14; ++i) r_out[off + i] = x[i];
    off += 14;
  }
  // q soft limits
  if (W.w_q_soft > 0.0) {
    for (int i = 0; i < 7; ++i) {
      double qr = 0.5 * (W.q_lower[i] + W.q_upper[i]);
      r_out[off + i] = x[i] - qr;
      r_out[off + 7 + i] = x[7 + i];
    }
    off += 14;
  }
  // ee_ori: log3(R_des^T ee_R)
  double RtR[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      RtR[3 * i + j] = 0;
      for (int k = 0; k < 3; ++k)
        RtR[3 * i + j] += refs.R_des[3 * k + i] * ee_R[3 * k + j];
    }
  log3(RtR, r_out + off);
  off += 3;
  // w_damp
  for (int i = 0; i < 6; ++i) r_out[off + i] = vel6[i];
  off += 6;
  if (!terminal && tau_reg) {
    for (int i = 0; i < 7; ++i) r_out[off + i] = u[i] - refs.tau_ref[i];
    off += 7;
    if (W.w_tau_soft > 0.0) {
      for (int i = 0; i < 7; ++i) r_out[off + i] = u[i];
      off += 7;
    }
  }
  if (!surface) {
    for (int i = 0; i < 3; ++i) r_out[off + i] = ee_p[i] - ref_pv[i];
    off += 3;
  } else {
    for (int i = 0; i < 3; ++i) r_out[off + i] = ee_p[i] - ref_pv[i];
    off += 3;
    r_out[off + 0] = vel6[0] - ref_pv[3];
    r_out[off + 1] = vel6[1] - ref_pv[4];
    for (int i = 2; i < 6; ++i) r_out[off + i] = vel6[i];
    off += 6;
    if (W.w_plane_z > 0.0) {
      r_out[off + 0] = ee_p[0] - ref_pv[0];
      r_out[off + 1] = ee_p[1] - ref_pv[1];
      r_out[off + 2] = ee_p[2] - (ref_pv[2] - W.z_press);
      off += 3;
    }
    if (W.w_vz > 0.0) {
      for (int i = 0; i < 6; ++i) r_out[off + i] = vel6[i];
      off += 6;
    }
    if (W.w_unilateral > 0.0) { r_out[off] = force; off += 1; }
    if (W.w_fn > 0.0) { r_out[off] = force - W.fn_des; off += 1; }
  }
}

// Augmented LPF knot: y = (x_mb[14], tau[7]), control w[7].
// ynext = [inner Euler xnext(x_mb, tau); alpha tau + (1-alpha) w].
// Inner residual stack evaluated at (x_mb, u=tau) — including at the
// terminal knot (the wrapper calls the inner RUNNING calc there) — plus
// the outer y/w residuals.
static void knot_residuals_aug(const Weights& W, const Refs& refs,
                               bool surface, bool terminal,
                               const double* ref_pv, const double* y,
                               const double* w, double* r_out,
                               double* ynext_out) {
  static const double W0[NU] = {0, 0, 0, 0, 0, 0, 0};
  if (w == nullptr) w = W0;
  const double* x_mb = y;
  const double* tau = y + NX;
  double xn_mb[NX];
  knot_residuals(W, refs, surface, terminal, ref_pv, x_mb, tau, r_out,
                 xn_mb, /*aug=*/true);
  double a = std::min(std::max(W.alpha_lpf, 0.0), 0.999999);
  for (int i = 0; i < NX; ++i) ynext_out[i] = xn_mb[i];
  for (int i = 0; i < NU; ++i)
    ynext_out[NX + i] = a * tau[i] + (1.0 - a) * w[i];
  // recompute the inner offset to append outer residuals
  Stack Si = make_stack(W, surface, terminal, /*aug=*/true);
  int off = Si.nr_total;
  // walk back over the outer terms we are about to write
  int n_outer = 0;
  if (W.w_y > 0.0) n_outer += 21;
  if (!terminal && W.w_w > 0.0) n_outer += 7;
  if (!terminal && W.w_w_soft > 0.0) n_outer += 7;
  off -= n_outer;
  if (W.w_y > 0.0) {
    for (int i = 0; i < 21; ++i) r_out[off + i] = y[i] - refs.y_ref[i];
    off += 21;
  }
  if (!terminal && W.w_w > 0.0) {
    for (int i = 0; i < 7; ++i) r_out[off + i] = w[i];
    off += 7;
  }
  if (!terminal && W.w_w_soft > 0.0) {
    for (int i = 0; i < 7; ++i) r_out[off + i] = w[i];
    off += 7;
  }
}

// activation value/grad/hessdiag on one term
static double act_value(const Term& t, const double* r) {
  double v = 0;
  if (t.kind == QUAD) {
    for (int i = 0; i < t.nr; ++i) v += r[i] * r[i];
    return 0.5 * v;
  }
  if (t.kind == WQUAD) {
    for (int i = 0; i < t.nr; ++i) v += t.w[i] * r[i] * r[i];
    return 0.5 * v;
  }
  for (int i = 0; i < t.nr; ++i) {
    double o = std::max(r[i] - t.ub[i], 0.0) + std::min(r[i] - t.lb[i], 0.0);
    v += o * o;
  }
  return 0.5 * v;
}

static void act_grad_hess(const Term& t, const double* r, double* g, double* h) {
  for (int i = 0; i < t.nr; ++i) {
    if (t.kind == QUAD) { g[i] = r[i]; h[i] = 1.0; }
    else if (t.kind == WQUAD) { g[i] = t.w[i] * r[i]; h[i] = t.w[i]; }
    else {
      double o = std::max(r[i] - t.ub[i], 0.0) + std::min(r[i] - t.lb[i], 0.0);
      g[i] = o; h[i] = (std::fabs(o) > 0.0) ? 1.0 : 0.0;
    }
  }
}

template <int NXD>
struct KnotDerivT {
  double xnext[NXD];
  double cost;
  double Fx[NXD * NXD], Fu[NXD * NU];
  double Lx[NXD], Lu[NU], Lxx[NXD * NXD], Lxu[NXD * NU], Luu[NU * NU];
};
using KnotDeriv = KnotDerivT<NX>;

// family dispatch: NXD == NX -> classical residual stack, NXD == NY ->
// augmented LPF stack.
template <int NXD>
static void residuals_t(const Weights& W, const Refs& refs, bool surface,
                        bool terminal, const double* ref_pv, const double* x,
                        const double* u, double* r, double* xn) {
  static_assert(NXD == NX || NXD == NY, "unknown knot family");
  if (NXD == NX)
    knot_residuals(W, refs, surface, terminal, ref_pv, x, u, r, xn);
  else
    knot_residuals_aug(W, refs, surface, terminal, ref_pv, x, u, r, xn);
}

template <int NXD>
static double dt_scale_t(const Weights& W, bool terminal) {
  // classical terminal: crocoddyl's x-only IAM Euler calc, unscaled.
  // augmented terminal: the LPF wrapper calls the inner RUNNING calc,
  // so inner terms stay dt-scaled (crocoddyl_force_feedback.py:220).
  if (NXD == NX) return terminal ? 1.0 : W.dt_ocp;
  return W.dt_ocp;
}

static double knot_cost(const Stack& S, const Weights& W, bool terminal,
                        const double* r, double dt_scale) {
  double c = 0;
  for (const Term& t : S.terms) {
    if (terminal && !t.terminal) continue;
    double s = t.weight * (t.dt_scaled ? dt_scale : 1.0);
    c += s * act_value(t, r + t.offset);
  }
  return c;
}

template <int NXD>
static void knot_calc_t(const Weights& W, const Refs& refs, bool surface,
                        bool terminal, const double* ref_pv, const double* x,
                        const double* u, double* xnext, double* cost) {
  Stack S = make_stack(W, surface, terminal, NXD == NY);
  std::vector<double> r(S.nr_total);
  residuals_t<NXD>(W, refs, surface, terminal, ref_pv, x, u, r.data(), xnext);
  *cost = knot_cost(S, W, terminal, r.data(), dt_scale_t<NXD>(W, terminal));
}

static void knot_calc(const Weights& W, const Refs& refs, bool surface,
                      bool terminal, const double* ref_pv, const double* x,
                      const double* u, double* xnext, double* cost) {
  knot_calc_t<NX>(W, refs, surface, terminal, ref_pv, x, u, xnext, cost);
}

// central-difference derivatives of (xnext, residuals); GN cost assembly.
template <int NXD>
static void knot_diff_t(const Weights& W, const Refs& refs, bool surface,
                        bool terminal, const double* ref_pv, const double* x,
                        const double* u, KnotDerivT<NXD>* D) {
  Stack S = make_stack(W, surface, terminal, NXD == NY);
  int NR = S.nr_total;
  std::vector<double> r0(NR), rp(NR), rm(NR);
  std::vector<double> Jx(NR * NXD), Ju(NR * NU, 0.0);
  double xn_p[NXD], xn_m[NXD];
  residuals_t<NXD>(W, refs, surface, terminal, ref_pv, x, u, r0.data(),
                   D->xnext);

  // central-difference step: eps^(1/3) scale minimizes truncation +
  // roundoff for double precision (the stiff contact Hessian amplifies
  // derivative noise into the backward pass; 1e-6 left ~2.5e-3 Nm tau
  // residual vs the analytic side, 1e-5 brings it under the 1e-3 target)
  const double h = 1e-5;
  double xp[NXD], um[NU];
  for (int j = 0; j < NXD; ++j) {
    std::memcpy(xp, x, sizeof(xp));
    xp[j] = x[j] + h;
    residuals_t<NXD>(W, refs, surface, terminal, ref_pv, xp, u, rp.data(),
                     xn_p);
    xp[j] = x[j] - h;
    residuals_t<NXD>(W, refs, surface, terminal, ref_pv, xp, u, rm.data(),
                     xn_m);
    for (int i = 0; i < NR; ++i) Jx[i * NXD + j] = (rp[i] - rm[i]) / (2 * h);
    for (int i = 0; i < NXD; ++i)
      D->Fx[i * NXD + j] = (xn_p[i] - xn_m[i]) / (2 * h);
  }
  if (!terminal) {
    for (int j = 0; j < NU; ++j) {
      std::memcpy(um, u, sizeof(um));
      um[j] = u[j] + h;
      residuals_t<NXD>(W, refs, surface, terminal, ref_pv, x, um, rp.data(),
                       xn_p);
      um[j] = u[j] - h;
      residuals_t<NXD>(W, refs, surface, terminal, ref_pv, x, um, rm.data(),
                       xn_m);
      for (int i = 0; i < NR; ++i) Ju[i * NU + j] = (rp[i] - rm[i]) / (2 * h);
      for (int i = 0; i < NXD; ++i)
        D->Fu[i * NU + j] = (xn_p[i] - xn_m[i]) / (2 * h);
    }
  } else {
    std::memset(D->Fu, 0, sizeof(D->Fu));
  }

  // GN assembly
  double dt_scale = dt_scale_t<NXD>(W, terminal);
  D->cost = knot_cost(S, W, terminal, r0.data(), dt_scale);
  std::memset(D->Lx, 0, sizeof(D->Lx));
  std::memset(D->Lu, 0, sizeof(D->Lu));
  std::memset(D->Lxx, 0, sizeof(D->Lxx));
  std::memset(D->Lxu, 0, sizeof(D->Lxu));
  std::memset(D->Luu, 0, sizeof(D->Luu));
  double g[21], hd[21];
  for (const Term& t : S.terms) {
    if (terminal && !t.terminal) continue;
    double s = t.weight * (t.dt_scaled ? dt_scale : 1.0);
    act_grad_hess(t, r0.data() + t.offset, g, hd);
    for (int i = 0; i < t.nr; ++i) {
      int ri = t.offset + i;
      for (int a = 0; a < NXD; ++a) {
        double Ja = Jx[ri * NXD + a];
        if (Ja == 0.0) continue;
        D->Lx[a] += s * Ja * g[i];
        for (int b = 0; b < NXD; ++b)
          D->Lxx[a * NXD + b] += s * hd[i] * Ja * Jx[ri * NXD + b];
        for (int b = 0; b < NU; ++b)
          D->Lxu[a * NU + b] += s * hd[i] * Ja * Ju[ri * NU + b];
      }
      if (!terminal) {
        for (int a = 0; a < NU; ++a) {
          double Ja = Ju[ri * NU + a];
          if (Ja == 0.0) continue;
          D->Lu[a] += s * Ja * g[i];
          for (int b = 0; b < NU; ++b)
            D->Luu[a * NU + b] += s * hd[i] * Ja * Ju[ri * NU + b];
        }
      }
    }
  }
}

// ---------------- Box-QP (projected Newton, mirrors solver/boxqp.py) ----

static void boxqp_solve(const double* Q, const double* qv, const double* lb,
                        const double* ub, double* x, bool* free_mask,
                        int iters) {
  const int n = NU;
  for (int i = 0; i < n; ++i) x[i] = std::min(std::max(x[i], lb[i]), ub[i]);
  const double eps = 1e-9;
  auto obj = [&](const double* xx) {
    double v = 0;
    for (int i = 0; i < n; ++i) {
      double qx = 0;
      for (int j = 0; j < n; ++j) qx += Q[i * n + j] * xx[j];
      v += 0.5 * xx[i] * qx + qv[i] * xx[i];
    }
    return v;
  };
  for (int it = 0; it < iters; ++it) {
    double gvec[NU];
    for (int i = 0; i < n; ++i) {
      gvec[i] = qv[i];
      for (int j = 0; j < n; ++j) gvec[i] += Q[i * n + j] * x[j];
    }
    bool fr[NU];
    for (int i = 0; i < n; ++i) {
      bool lo = (x[i] <= lb[i] + eps) && (gvec[i] > 0);
      bool hi = (x[i] >= ub[i] - eps) && (gvec[i] < 0);
      fr[i] = !(lo || hi);
    }
    // masked solve: Qm = mask2*Q + diag(1-free) + reg I
    double Qm[NU * NU], rhs[NU];
    for (int i = 0; i < n; ++i) {
      for (int j = 0; j < n; ++j)
        Qm[i * n + j] = (fr[i] && fr[j]) ? Q[i * n + j] : 0.0;
      Qm[i * n + i] += (fr[i] ? 0.0 : 1.0) + 1e-9;
      rhs[i] = fr[i] ? gvec[i] : 0.0;
    }
    double Lm[NU * NU];
    std::memcpy(Lm, Qm, sizeof(Qm));
    if (!chol(Lm, n)) break;
    double dx[NU];
    chol_solve_vec(Lm, n, rhs, dx);
    for (int i = 0; i < n; ++i) dx[i] = -dx[i];
    // 4-candidate polish
    double cand[4][NU];
    for (int i = 0; i < n; ++i) {
      cand[0][i] = x[i];
      cand[1][i] = std::min(std::max(x[i] + dx[i], lb[i]), ub[i]);
      cand[2][i] = std::min(std::max(x[i] + 0.5 * dx[i], lb[i]), ub[i]);
      cand[3][i] = std::min(std::max(x[i] + 0.25 * dx[i], lb[i]), ub[i]);
    }
    int best = 0;
    double bv = obj(cand[0]);
    for (int c = 1; c < 4; ++c) {
      double v = obj(cand[c]);
      if (v < bv) { bv = v; best = c; }
    }
    std::memcpy(x, cand[best], n * sizeof(double));
  }
  double gvec[NU];
  for (int i = 0; i < n; ++i) {
    gvec[i] = qv[i];
    for (int j = 0; j < n; ++j) gvec[i] += Q[i * n + j] * x[j];
  }
  for (int i = 0; i < n; ++i) {
    bool lo = (x[i] <= lb[i] + eps) && (gvec[i] > 0);
    bool hi = (x[i] >= ub[i] - eps) && (gvec[i] < 0);
    free_mask[i] = !(lo || hi);
  }
}

// ---------------- FDDP / BoxFDDP (crocoddyl semantics) ----------------

struct SolveOpts {
  int max_iters = 10;
  int n_alphas = 10;
  double reg_init = 1e-9, reg_min = 1e-9, reg_max = 1e9;
  double reg_inc = 10.0, reg_dec = 10.0;
  double th_acceptstep = 0.1, th_acceptnegstep = 2.0;
  double th_stop = 1e-9, th_grad = 1e-12;
  double th_stepdec = 0.5, th_stepinc = 0.01;
  int use_box = 1;
  int boxqp_iters = 8;
  int record_trace = 0;
};

struct Problem {
  Weights W;
  Refs refs;
  std::vector<int> surface;  // per running knot 0/1 (terminal follows last)
  int N;
};

template <int NXD>
static double total_calc(const Problem& P, const double* xs, const double* us,
                         std::vector<double>* xnexts) {
  double cost = 0;
  double xn[NXD], c;
  for (int k = 0; k < P.N; ++k) {
    knot_calc_t<NXD>(P.W, P.refs, P.surface[k], false, P.refs.pv + 6 * k,
              xs + NXD * k, us + NU * k, xn, &c);
    cost += c;
    if (xnexts) std::memcpy(xnexts->data() + NXD * k, xn, sizeof(xn));
  }
  double xT[NXD];
  knot_calc_t<NXD>(P.W, P.refs, P.surface[P.N - 1], true, P.refs.pv + 6 * P.N,
            xs + NXD * P.N, nullptr, xT, &c);
  cost += c;
  return cost;
}

// per-iteration trace row (iterate-level parity vs the JAX solver's
// debug_history — solver/fddp.py aux dict): see TRACE_FIELDS order below.
static const int TRACE_FIELDS = 13;

struct SolveOut {
  std::vector<double> xs, us, K, kff;
  double cost;
  int iters;
  bool feasible;
  double reg;
  std::vector<double> trace;   // (max_iters, TRACE_FIELDS) when requested
};

template <int NXD>
static void solve_fddp(const Problem& P, const double* x0,
                       const double* xs_init, const double* us_init,
                       const SolveOpts& O, SolveOut* out) {
  const int N = P.N;
  std::vector<double> xs(xs_init, xs_init + NXD * (N + 1));
  std::vector<double> us(us_init, us_init + NU * N);
  std::vector<KnotDerivT<NXD>> D(N);
  KnotDerivT<NXD> DT;  // terminal (only Lx/Lxx/cost used)
  std::vector<double> fs((N + 1) * NXD);
  std::vector<double> K(N * NU * NXD, 0.0), kff(N * NU, 0.0);
  std::vector<double> Vxx_all((N + 1) * NXD * NXD);
  std::vector<double> xs_try((N + 1) * NXD), us_try(N * NU);

  double xreg = O.reg_init, ureg = O.reg_init;
  bool feasible = false;
  int it = 0;
  bool converged = false, diverged = false;

  double lb_abs[NU], ub_abs[NU];
  for (int i = 0; i < NU; ++i) {
    lb_abs[i] = -P.W.tau_limits[i];
    ub_abs[i] = P.W.tau_limits[i];
  }

  while (it < O.max_iters && !converged && !diverged) {
    // derivatives + gaps
    double cost_cur = 0;
    for (int k = 0; k < N; ++k) {
      knot_diff_t<NXD>(P.W, P.refs, P.surface[k], false, P.refs.pv + 6 * k,
                xs.data() + NXD * k, us.data() + NU * k, &D[k]);
      cost_cur += D[k].cost;
    }
    knot_diff_t<NXD>(P.W, P.refs, P.surface[N - 1], true, P.refs.pv + 6 * N,
              xs.data() + NXD * N, nullptr, &DT);
    cost_cur += DT.cost;

    double gap_norm = 0;
    for (int i = 0; i < NXD; ++i) {
      fs[i] = x0[i] - xs[i];
      gap_norm = std::max(gap_norm, std::fabs(fs[i]));
    }
    for (int k = 0; k < N; ++k)
      for (int i = 0; i < NXD; ++i) {
        double g = D[k].xnext[i] - xs[NXD * (k + 1) + i];
        fs[NXD * (k + 1) + i] = g;
        gap_norm = std::max(gap_norm, std::fabs(g));
      }
    if (gap_norm < 1e-9) feasible = true;
    double gapw = feasible ? 0.0 : 1.0;

    // backward pass with reg retry
    double dg = 0, dq = 0, stop = 0;
    int bw_retries = -1;
    bool bw_bad = true;
    while (bw_bad) {
      bw_bad = false;
      bw_retries += 1;
      dg = dq = stop = 0;
      double Vx[NXD], Vxx[NXD * NXD];
      for (int i = 0; i < NXD * NXD; ++i) Vxx[i] = DT.Lxx[i];
      for (int i = 0; i < NXD; ++i) Vxx[i * NXD + i] += xreg;
      for (int i = 0; i < NXD; ++i) {
        Vx[i] = DT.Lx[i];
        double d = 0;
        for (int j = 0; j < NXD; ++j) d += Vxx[i * NXD + j] * fs[NXD * N + j];
        Vx[i] += gapw * d;
      }
      std::memcpy(Vxx_all.data() + NXD * NXD * N, Vxx, sizeof(Vxx));
      // terminal dg/dq pieces
      {
        double vTf = 0, fVf = 0;
        for (int i = 0; i < NXD; ++i) vTf += Vx[i] * fs[NXD * N + i];
        for (int i = 0; i < NXD; ++i)
          for (int j = 0; j < NXD; ++j)
            fVf += fs[NXD * N + i] * Vxx[i * NXD + j] * fs[NXD * N + j];
        dg -= gapw * vTf;
        dq += gapw * fVf;
      }
      for (int k = N - 1; k >= 0 && !bw_bad; --k) {
        const KnotDerivT<NXD>& d = D[k];
        double Qx[NXD], Qu[NU];
        double Qxx[NXD * NXD], Qxu[NXD * NU], Quu[NU * NU];
        // Qxx = Lxx + Fx^T Vxx Fx etc.
        double VF[NXD * NXD];  // Vxx @ Fx
        for (int i = 0; i < NXD; ++i)
          for (int j = 0; j < NXD; ++j) {
            double s = 0;
            for (int l = 0; l < NXD; ++l) s += Vxx[i * NXD + l] * d.Fx[l * NXD + j];
            VF[i * NXD + j] = s;
          }
        for (int i = 0; i < NXD; ++i)
          for (int j = 0; j < NXD; ++j) {
            double s = d.Lxx[i * NXD + j];
            for (int l = 0; l < NXD; ++l) s += d.Fx[l * NXD + i] * VF[l * NXD + j];
            Qxx[i * NXD + j] = s;
          }
        double VFu[NXD * NU];
        for (int i = 0; i < NXD; ++i)
          for (int j = 0; j < NU; ++j) {
            double s = 0;
            for (int l = 0; l < NXD; ++l) s += Vxx[i * NXD + l] * d.Fu[l * NU + j];
            VFu[i * NU + j] = s;
          }
        for (int i = 0; i < NXD; ++i)
          for (int j = 0; j < NU; ++j) {
            double s = d.Lxu[i * NU + j];
            for (int l = 0; l < NXD; ++l) s += d.Fx[l * NXD + i] * VFu[l * NU + j];
            Qxu[i * NU + j] = s;
          }
        for (int i = 0; i < NU; ++i)
          for (int j = 0; j < NU; ++j) {
            double s = d.Luu[i * NU + j];
            for (int l = 0; l < NXD; ++l) s += d.Fu[l * NU + i] * VFu[l * NU + j];
            Quu[i * NU + j] = s + (i == j ? ureg : 0.0);
          }
        for (int i = 0; i < NXD; ++i) {
          double s = d.Lx[i];
          for (int l = 0; l < NXD; ++l) s += d.Fx[l * NXD + i] * Vx[l];
          Qx[i] = s;
        }
        for (int i = 0; i < NU; ++i) {
          double s = d.Lu[i];
          for (int l = 0; l < NXD; ++l) s += d.Fu[l * NU + i] * Vx[l];
          Qu[i] = s;
        }

        double kk[NU];
        double KK[NU * NXD];
        if (O.use_box) {
          double lb[NU], ub[NU], x0q[NU] = {0};
          for (int i = 0; i < NU; ++i) {
            lb[i] = lb_abs[i] - us[NU * k + i];
            ub[i] = ub_abs[i] - us[NU * k + i];
          }
          bool fr[NU];
          double sol[NU];
          std::memcpy(sol, x0q, sizeof(sol));
          boxqp_solve(Quu, Qu, lb, ub, sol, fr, O.boxqp_iters);
          for (int i = 0; i < NU; ++i) kk[i] = -sol[i];
          // masked K solve: rows of clamped dims zero
          double Qm[NU * NU], Lm[NU * NU];
          for (int i = 0; i < NU; ++i)
            for (int j = 0; j < NU; ++j)
              Qm[i * NU + j] = (fr[i] && fr[j]) ? Quu[i * NU + j] : 0.0;
          for (int i = 0; i < NU; ++i)
            Qm[i * NU + i] += (fr[i] ? 0.0 : 1.0) + 1e-12;
          std::memcpy(Lm, Qm, sizeof(Qm));
          if (!chol(Lm, NU)) { bw_bad = true; break; }
          double col[NU], outc[NU];
          for (int j = 0; j < NXD; ++j) {
            for (int i = 0; i < NU; ++i)
              col[i] = fr[i] ? Qxu[j * NU + i] : 0.0;  // (Qxu^T masked)
            chol_solve_vec(Lm, NU, col, outc);
            for (int i = 0; i < NU; ++i) KK[i * NXD + j] = outc[i];
          }
        } else {
          double Lm[NU * NU];
          std::memcpy(Lm, Quu, sizeof(Quu));
          if (!chol(Lm, NU)) { bw_bad = true; break; }
          chol_solve_vec(Lm, NU, Qu, kk);
          double col[NU], outc[NU];
          for (int j = 0; j < NXD; ++j) {
            for (int i = 0; i < NU; ++i) col[i] = Qxu[j * NU + i];
            chol_solve_vec(Lm, NU, col, outc);
            for (int i = 0; i < NU; ++i) KK[i * NXD + j] = outc[i];
          }
        }
        std::memcpy(kff.data() + NU * k, kk, sizeof(kk));
        std::memcpy(K.data() + NU * NXD * k, KK, NU * NXD * sizeof(double));

        // value update: Vx = Qx + K^T (Quu k - 2 Qu); Vxx = Qxx - Qxu K
        double Quuk[NU];
        for (int i = 0; i < NU; ++i) {
          double s = 0;
          for (int j = 0; j < NU; ++j) s += Quu[i * NU + j] * kk[j];
          Quuk[i] = s;
        }
        double Vx_new[NXD], Vxx_new[NXD * NXD];
        for (int i = 0; i < NXD; ++i) {
          double s = Qx[i];
          for (int j = 0; j < NU; ++j)
            s += KK[j * NXD + i] * (Quuk[j] - 2.0 * Qu[j]);
          Vx_new[i] = s;
        }
        for (int i = 0; i < NXD; ++i)
          for (int j = 0; j < NXD; ++j) {
            double s = Qxx[i * NXD + j];
            for (int l = 0; l < NU; ++l) s -= Qxu[i * NU + l] * KK[l * NXD + j];
            Vxx_new[i * NXD + j] = s;
          }
        for (int i = 0; i < NXD; ++i)
          for (int j = 0; j < i; ++j) {
            double m = 0.5 * (Vxx_new[i * NXD + j] + Vxx_new[j * NXD + i]);
            Vxx_new[i * NXD + j] = Vxx_new[j * NXD + i] = m;
          }
        for (int i = 0; i < NXD; ++i) Vxx_new[i * NXD + i] += xreg;
        const double* fst = fs.data() + NXD * k;
        for (int i = 0; i < NXD; ++i) {
          double s = 0;
          for (int j = 0; j < NXD; ++j) s += Vxx_new[i * NXD + j] * fst[j];
          Vx_new[i] += gapw * s;
        }
        double qu_k = 0, k_Quuk = 0, vf = 0, fVf = 0, qu2 = 0;
        for (int i = 0; i < NU; ++i) {
          qu_k += Qu[i] * kk[i];
          k_Quuk += kk[i] * Quuk[i];
          qu2 += Qu[i] * Qu[i];
        }
        for (int i = 0; i < NXD; ++i) vf += Vx_new[i] * fst[i];
        for (int i = 0; i < NXD; ++i)
          for (int j = 0; j < NXD; ++j)
            fVf += fst[i] * Vxx_new[i * NXD + j] * fst[j];
        dg += qu_k - gapw * vf;
        dq += -k_Quuk + gapw * fVf;
        stop += qu2;
        std::memcpy(Vx, Vx_new, sizeof(Vx_new));
        std::memcpy(Vxx, Vxx_new, sizeof(Vxx_new));
        std::memcpy(Vxx_all.data() + NXD * NXD * k, Vxx, sizeof(Vxx_new));
      }
      if (bw_bad) {
        if (xreg >= O.reg_max) { diverged = true; break; }
        xreg = std::min(xreg * O.reg_inc, O.reg_max);
        ureg = xreg;
      }
    }
    if (diverged) break;

    // line search (descending alpha, first acceptable — crocoddyl)
    bool accepted = false;
    double alpha_f = 0.0, cost_try = cost_cur, d1_sel = 1e300;
    double dVexp_sel = 0.0;
    for (int ai = 0; ai < O.n_alphas && !accepted; ++ai) {
      double alpha = std::pow(0.5, ai);
      double gap_scale = feasible ? 0.0 : (alpha - 1.0);
      // rollout
      double xcur[NXD];
      std::memcpy(xcur, x0, sizeof(xcur));
      double ct = 0;
      bool finite = true;
      for (int k = 0; k < N; ++k) {
        double dx[NXD];
        for (int i = 0; i < NXD; ++i) dx[i] = xcur[i] - xs[NXD * k + i];
        double u[NU];
        for (int i = 0; i < NU; ++i) {
          double s = us[NU * k + i] - alpha * kff[NU * k + i];
          for (int j = 0; j < NXD; ++j) s -= K[NU * NXD * k + i * NXD + j] * dx[j];
          if (O.use_box) s = std::min(std::max(s, lb_abs[i]), ub_abs[i]);
          u[i] = s;
        }
        double xn[NXD], c;
        knot_calc_t<NXD>(P.W, P.refs, P.surface[k], false, P.refs.pv + 6 * k, xcur,
                  u, xn, &c);
        std::memcpy(xs_try.data() + NXD * k, xcur, NXD * sizeof(double));
        std::memcpy(us_try.data() + NU * k, u, NU * sizeof(double));
        ct += c;
        for (int i = 0; i < NXD; ++i)
          xcur[i] = xn[i] + gap_scale * fs[NXD * (k + 1) + i];
        if (!std::isfinite(ct)) { finite = false; break; }
      }
      if (finite) {
        double cT;
        double xTn[NXD];
        knot_calc_t<NXD>(P.W, P.refs, P.surface[N - 1], true, P.refs.pv + 6 * N,
                  xcur, nullptr, xTn, &cT);
        ct += cT;
        std::memcpy(xs_try.data() + NXD * N, xcur, NXD * sizeof(double));
        finite = std::isfinite(ct);
      }
      if (!finite) continue;
      double dV = cost_cur - ct;
      // gap-aware expected improvement
      double dv = 0;
      for (int k = 0; k <= N; ++k) {
        const double* fst = fs.data() + NXD * k;
        const double* Vxxk = Vxx_all.data() + NXD * NXD * k;
        double dxk[NXD];
        for (int i = 0; i < NXD; ++i)
          dxk[i] = xs[NXD * k + i] - xs_try[NXD * k + i];
        double s = 0;
        for (int i = 0; i < NXD; ++i) {
          double vi = 0;
          for (int j = 0; j < NXD; ++j) vi += Vxxk[i * NXD + j] * dxk[j];
          s += fst[i] * vi;
        }
        dv -= s;
      }
      dv *= gapw;
      double d1 = dg + dv;
      double d2 = dq - 2.0 * dv;
      double dVexp = alpha * (d1 + 0.5 * alpha * d2);
      bool ok;
      if (dVexp >= 0) ok = dV > O.th_acceptstep * dVexp;
      else ok = dV > O.th_acceptnegstep * dVexp;
      if (ok) {
        accepted = true;
        alpha_f = alpha;
        cost_try = ct;
        d1_sel = d1;
        dVexp_sel = dVexp;
      }
    }

    if (O.record_trace) {
      // field order shared with tools/parity_iterates.py and the JAX
      // debug_history comparison (solver/fddp.py aux)
      double row[TRACE_FIELDS] = {
          cost_cur, cost_try, accepted ? 1.0 : 0.0, alpha_f, dg, dq,
          d1_sel, dVexp_sel, xreg, gap_norm, stop, feasible ? 1.0 : 0.0,
          double(bw_retries)};
      out->trace.insert(out->trace.end(), row, row + TRACE_FIELDS);
    }

    if (accepted) {
      std::memcpy(xs.data(), xs_try.data(), xs.size() * sizeof(double));
      std::memcpy(us.data(), us_try.data(), us.size() * sizeof(double));
      if (alpha_f >= 1.0 - 1e-12) feasible = true;
    }
    // reg schedule
    if (accepted && alpha_f > O.th_stepdec)
      xreg = std::max(xreg / O.reg_dec, O.reg_min);
    if (!accepted || alpha_f <= O.th_stepinc) {
      if (xreg >= O.reg_max) { diverged = true; }
      xreg = std::min(xreg * O.reg_inc, O.reg_max);
    }
    ureg = xreg;
    it += 1;
    if (accepted && std::fabs(d1_sel) < O.th_grad) converged = true;
    if (feasible && stop < O.th_stop) converged = true;
  }

  out->xs = xs;
  out->us = us;
  out->K = K;
  out->kff = kff;
  out->cost = total_calc<NXD>(P, xs.data(), us.data(), nullptr);
  out->iters = it;
  out->feasible = feasible;
  out->reg = xreg;
}

static void unpack_weights(const double* w, Weights* W) {
  std::memset(W, 0, sizeof(Weights));
  int i = 0;
  W->dt_ocp = w[i++];
  W->w_posture = w[i++]; W->w_v = w[i++]; W->w_q_soft = w[i++];
  W->q_soft_margin = w[i++];
  W->w_ee_ori = w[i++]; W->w_wdamp = w[i++]; W->w_tau = w[i++];
  W->w_tau_soft = w[i++]; W->tau_soft_margin = w[i++];
  W->w_ee_pos = w[i++]; W->w_tangent_pos = w[i++]; W->w_tangent_vel = w[i++];
  W->w_plane_z = w[i++]; W->w_vz = w[i++];
  W->w_unilateral = w[i++]; W->friction_margin = w[i++];
  W->w_fn = w[i++]; W->fn_des = w[i++]; W->z_press = w[i++];
  W->contact_kp = w[i++]; W->contact_kd = w[i++]; W->contact_c = w[i++];
  for (int k = 0; k < 7; ++k) W->v_damp_w[k] = w[i++];
  for (int k = 0; k < 3; ++k) W->ori_w[k] = w[i++];
  for (int k = 0; k < 3; ++k) W->wdamp_w[k] = w[i++];
  for (int k = 0; k < 3; ++k) W->ee_pos_w[k] = w[i++];
  for (int k = 0; k < 7; ++k) W->tau_limits[k] = w[i++];
  for (int k = 0; k < 7; ++k) W->q_lower[k] = w[i++];
  for (int k = 0; k < 7; ++k) W->q_upper[k] = w[i++];
}

// augmented flat layout: the 60 classical doubles followed by
// [alpha_lpf, w_w, w_w_soft, w_soft_margin, w_y,
//  use_inner_state_reg, use_inner_tau_reg, y_weights[21]]  (88 total)
static void unpack_weights_aug(const double* w, Weights* W) {
  unpack_weights(w, W);
  int i = 60;
  W->alpha_lpf = w[i++];
  W->w_w = w[i++]; W->w_w_soft = w[i++]; W->w_soft_margin = w[i++];
  W->w_y = w[i++];
  W->use_inner_state_reg = w[i++]; W->use_inner_tau_reg = w[i++];
  for (int k = 0; k < 21; ++k) W->y_weights[k] = w[i++];
}

}  // namespace oracle

extern "C" {

// Single-knot oracle calc: for unit-testing the cost/dynamics stack.
// weights: flat array (see unpack_weights, 60 doubles).
// ref_pv: (6,) p_ref+v_ref; shared refs: x_reg_ref(14), tau_ref(7), R_des(9).
void ffmpc_oracle_knot_calc(const double* weights, const double* ref_pv,
                            const double* x_reg_ref, const double* tau_ref,
                            const double* R_des, int surface, int terminal,
                            const double* x, const double* u, double* xnext,
                            double* cost) {
  oracle::Weights W;
  oracle::unpack_weights(weights, &W);
  oracle::Refs refs{nullptr, x_reg_ref, tau_ref, R_des, nullptr, 0};
  // preserve the classical terminal semantics: u is ignored (crocoddyl's
  // terminal calc runs at u = unone)
  oracle::knot_calc(W, refs, surface != 0, terminal != 0, ref_pv, x,
                    terminal != 0 ? nullptr : u, xnext, cost);
}

// Augmented-family single-knot calc: y (21,), w (7,) -> ynext (21,), cost.
void ffmpc_oracle_knot_calc_aug(const double* weights, const double* ref_pv,
                                const double* x_reg_ref,
                                const double* tau_ref, const double* R_des,
                                const double* y_ref, int surface,
                                int terminal, const double* y,
                                const double* w, double* ynext,
                                double* cost) {
  oracle::Weights W;
  oracle::unpack_weights_aug(weights, &W);
  oracle::Refs refs{nullptr, x_reg_ref, tau_ref, R_des, y_ref, 0};
  oracle::knot_calc_t<oracle::NY>(
      W, refs, surface != 0, terminal != 0, ref_pv, y,
      terminal != 0 ? nullptr : w, ynext, cost);
}

// Full shooting solve.  pv: (N+1, 6) refs; surface: (N,) ints;
// outputs: xs (N+1, 14), us (N, 14? no: N,7), cost, iters.
void ffmpc_oracle_solve(const double* weights, const double* pv,
                        const int* surface, const double* x_reg_ref,
                        const double* tau_ref, const double* R_des, int N,
                        const double* x0, const double* xs_init,
                        const double* us_init, int max_iters, int use_box,
                        double* xs_out, double* us_out, double* cost_out,
                        int* iters_out) {
  oracle::Problem P;
  oracle::unpack_weights(weights, &P.W);
  P.refs = oracle::Refs{pv, x_reg_ref, tau_ref, R_des, nullptr, N};
  P.N = N;
  P.surface.assign(surface, surface + N);
  oracle::SolveOpts O;
  O.max_iters = max_iters;
  O.use_box = use_box;
  oracle::SolveOut out;
  oracle::solve_fddp<oracle::NX>(P, x0, xs_init, us_init, O, &out);
  std::memcpy(xs_out, out.xs.data(), out.xs.size() * sizeof(double));
  std::memcpy(us_out, out.us.data(), out.us.size() * sizeof(double));
  *cost_out = out.cost;
  *iters_out = out.iters;
}

// Augmented-family shooting solve: ys (N+1, 21), ws (N, 7).
void ffmpc_oracle_solve_aug(const double* weights, const double* pv,
                            const int* surface, const double* x_reg_ref,
                            const double* tau_ref, const double* R_des,
                            const double* y_ref, int N, const double* y0,
                            const double* ys_init, const double* ws_init,
                            int max_iters, int use_box, double* ys_out,
                            double* ws_out, double* cost_out,
                            int* iters_out) {
  oracle::Problem P;
  oracle::unpack_weights_aug(weights, &P.W);
  P.refs = oracle::Refs{pv, x_reg_ref, tau_ref, R_des, y_ref, N};
  P.N = N;
  P.surface.assign(surface, surface + N);
  oracle::SolveOpts O;
  O.max_iters = max_iters;
  O.use_box = use_box;
  oracle::SolveOut out;
  oracle::solve_fddp<oracle::NY>(P, y0, ys_init, ws_init, O, &out);
  std::memcpy(ys_out, out.xs.data(), out.xs.size() * sizeof(double));
  std::memcpy(ws_out, out.us.data(), out.us.size() * sizeof(double));
  *cost_out = out.cost;
  *iters_out = out.iters;
}

// Traced variants: additionally write a per-iteration trace
// (max_iters x TRACE_FIELDS=13 doubles: cost_cur, cost_try, accepted,
// alpha, dg, dq, d1, dVexp, xreg, gap_norm, stop, feasible, bw_retries;
// unused rows zero)
// and the actual iteration count — the iterate-level parity instrument
// (VERDICT r3 item 3: first-divergence localization vs the JAX solver's
// debug_history).
void ffmpc_oracle_solve_traced(
    const double* weights, const double* pv, const int* surface,
    const double* x_reg_ref, const double* tau_ref, const double* R_des,
    int N, const double* x0, const double* xs_init, const double* us_init,
    int max_iters, int use_box, double* xs_out, double* us_out,
    double* cost_out, int* iters_out, double* trace_out) {
  oracle::Problem P;
  oracle::unpack_weights(weights, &P.W);
  P.refs = oracle::Refs{pv, x_reg_ref, tau_ref, R_des, nullptr, N};
  P.N = N;
  P.surface.assign(surface, surface + N);
  oracle::SolveOpts O;
  O.max_iters = max_iters;
  O.use_box = use_box;
  O.record_trace = 1;
  oracle::SolveOut out;
  oracle::solve_fddp<oracle::NX>(P, x0, xs_init, us_init, O, &out);
  std::memcpy(xs_out, out.xs.data(), out.xs.size() * sizeof(double));
  std::memcpy(us_out, out.us.data(), out.us.size() * sizeof(double));
  *cost_out = out.cost;
  *iters_out = out.iters;
  std::memset(trace_out, 0,
              size_t(max_iters) * oracle::TRACE_FIELDS * sizeof(double));
  std::memcpy(trace_out, out.trace.data(),
              out.trace.size() * sizeof(double));
}

void ffmpc_oracle_solve_aug_traced(
    const double* weights, const double* pv, const int* surface,
    const double* x_reg_ref, const double* tau_ref, const double* R_des,
    const double* y_ref, int N, const double* y0, const double* ys_init,
    const double* ws_init, int max_iters, int use_box, double* ys_out,
    double* ws_out, double* cost_out, int* iters_out, double* trace_out) {
  oracle::Problem P;
  oracle::unpack_weights_aug(weights, &P.W);
  P.refs = oracle::Refs{pv, x_reg_ref, tau_ref, R_des, y_ref, N};
  P.N = N;
  P.surface.assign(surface, surface + N);
  oracle::SolveOpts O;
  O.max_iters = max_iters;
  O.use_box = use_box;
  O.record_trace = 1;
  oracle::SolveOut out;
  oracle::solve_fddp<oracle::NY>(P, y0, ys_init, ws_init, O, &out);
  std::memcpy(ys_out, out.xs.data(), out.xs.size() * sizeof(double));
  std::memcpy(ws_out, out.us.data(), out.us.size() * sizeof(double));
  *cost_out = out.cost;
  *iters_out = out.iters;
  std::memset(trace_out, 0,
              size_t(max_iters) * oracle::TRACE_FIELDS * sizeof(double));
  std::memcpy(trace_out, out.trace.data(),
              out.trace.size() * sizeof(double));
}

// Single-knot FD derivatives (the oracle's internal knot_diff): for
// cross-checking the JAX analytic derivatives at captured states.
// Outputs: Fx (nx*nx), Fu (nx*7), Lx (nx), Lu (7), Lxx (nx*nx),
// Lxu (nx*7), Luu (49), cost (1); nx = 14 (aug = 0) or 21 (aug = 1).
void ffmpc_oracle_knot_diff(const double* weights, const double* ref_pv,
                            const double* x_reg_ref, const double* tau_ref,
                            const double* R_des, const double* y_ref,
                            int aug, int surface, int terminal,
                            const double* x, const double* u, double* Fx,
                            double* Fu, double* Lx, double* Lu, double* Lxx,
                            double* Lxu, double* Luu, double* cost) {
  oracle::Weights W;
  if (aug) {
    oracle::unpack_weights_aug(weights, &W);
    oracle::Refs refs{nullptr, x_reg_ref, tau_ref, R_des, y_ref, 0};
    oracle::KnotDerivT<oracle::NY> D;
    oracle::knot_diff_t<oracle::NY>(W, refs, surface != 0, terminal != 0,
                                    ref_pv, x,
                                    terminal != 0 ? nullptr : u, &D);
    std::memcpy(Fx, D.Fx, sizeof(D.Fx));
    std::memcpy(Fu, D.Fu, sizeof(D.Fu));
    std::memcpy(Lx, D.Lx, sizeof(D.Lx));
    std::memcpy(Lu, D.Lu, sizeof(D.Lu));
    std::memcpy(Lxx, D.Lxx, sizeof(D.Lxx));
    std::memcpy(Lxu, D.Lxu, sizeof(D.Lxu));
    std::memcpy(Luu, D.Luu, sizeof(D.Luu));
    *cost = D.cost;
  } else {
    oracle::unpack_weights(weights, &W);
    oracle::Refs refs{nullptr, x_reg_ref, tau_ref, R_des, nullptr, 0};
    oracle::KnotDerivT<oracle::NX> D;
    oracle::knot_diff_t<oracle::NX>(W, refs, surface != 0, terminal != 0,
                                    ref_pv, x,
                                    terminal != 0 ? nullptr : u, &D);
    std::memcpy(Fx, D.Fx, sizeof(D.Fx));
    std::memcpy(Fu, D.Fu, sizeof(D.Fu));
    std::memcpy(Lx, D.Lx, sizeof(D.Lx));
    std::memcpy(Lu, D.Lu, sizeof(D.Lu));
    std::memcpy(Lxx, D.Lxx, sizeof(D.Lxx));
    std::memcpy(Lxu, D.Lxu, sizeof(D.Lxu));
    std::memcpy(Luu, D.Luu, sizeof(D.Luu));
    *cost = D.cost;
  }
}

}  // extern "C"

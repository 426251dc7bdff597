// ffmpc_native: host-side C++ runtime components.
//
// 1) An independent double-precision Panda rigid-body implementation
//    (FK + RNEA + mass matrix) used as a cross-check oracle for the JAX
//    kernels and as a low-latency host fallback for control-loop glue
//    (gravity compensation, safety checks) without device round-trips.
//    Constants mirror ffmpc_tpu/core/panda.py ("plant" variant): the public
//    Franka URDF inertials in the MuJoCo world frame with armature 0.1,
//    damping 1.0 and the tool sphere fused into link7.
//
// 2) A lock-free single-producer ring-buffer sample logger for 1 kHz
//    control loops: fixed-size float64 records, drained to disk off the
//    hot path (the RunLogger equivalent for real-time use; reference logs
//    buffer in Python lists — src/utils/logging.py:77-82).
//
// Build: make -C native   (produces libffmpc_native.so; ctypes binding in
// ffmpc_tpu/utils/native.py)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};
struct Mat3 {
  double m[9];  // row-major
};

inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator*(double s, Vec3 a) { return {s * a.x, s * a.y, s * a.z}; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline Vec3 mul(const Mat3& R, Vec3 v) {
  return {R.m[0] * v.x + R.m[1] * v.y + R.m[2] * v.z,
          R.m[3] * v.x + R.m[4] * v.y + R.m[5] * v.z,
          R.m[6] * v.x + R.m[7] * v.y + R.m[8] * v.z};
}
inline Vec3 tmul(const Mat3& R, Vec3 v) {  // R^T v
  return {R.m[0] * v.x + R.m[3] * v.y + R.m[6] * v.z,
          R.m[1] * v.x + R.m[4] * v.y + R.m[7] * v.z,
          R.m[2] * v.x + R.m[5] * v.y + R.m[8] * v.z};
}
inline Mat3 matmul(const Mat3& A, const Mat3& B) {
  Mat3 C;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      C.m[3 * i + j] = 0;
      for (int k = 0; k < 3; ++k) C.m[3 * i + j] += A.m[3 * i + k] * B.m[3 * k + j];
    }
  return C;
}
inline Mat3 rotz(double t) {
  double c = std::cos(t), s = std::sin(t);
  return {{c, -s, 0, s, c, 0, 0, 0, 1}};
}
inline Mat3 quat_to_rot(double w, double x, double y, double z) {
  double n = std::sqrt(w * w + x * x + y * y + z * z);
  w /= n; x /= n; y /= n; z /= n;
  return {{1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
           2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
           2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)}};
}

// ---- model constants (see ffmpc_tpu/core/panda.py) ----
const double S2 = 0.7071067811865476;
const double JPOS[7][3] = {
    {0, 0, 0.333}, {0, 0, 0}, {0, -0.316, 0}, {0.0825, 0, 0},
    {-0.0825, 0.384, 0}, {0, 0, 0}, {0.088, 0, 0}};
const double JQUAT[7][4] = {
    {1, 0, 0, 0}, {S2, -S2, 0, 0}, {S2, S2, 0, 0}, {S2, S2, 0, 0},
    {S2, -S2, 0, 0}, {S2, S2, 0, 0}, {S2, S2, 0, 0}};
const double BASE_QUAT[4] = {0, 0, 0, 1};
const double TOOL_POS[3] = {0, 0, 0.107};
const double TOOL_QUAT[4] = {0.3826834, 0, 0, 0.9238795};

struct Inertial {
  double mass;
  double com[3];
  double I[6];  // Ixx Iyy Izz Ixy Ixz Iyz about COM, body frame
};
const Inertial RAW[7] = {
    {4.970684, {0.003875, 0.002081, -0.04762},
     {0.70337, 0.70661, 0.0091170, -0.000139, 0.0067720, 0.019169}},
    {0.646926, {-0.003141, -0.02872, 0.003495},
     {0.0079620, 2.8110e-2, 2.5995e-2, -3.925e-3, 1.0254e-2, 7.04e-4}},
    {3.228604, {2.7518e-2, 3.9252e-2, -6.6502e-2},
     {3.7242e-2, 3.6155e-2, 1.083e-2, -4.761e-3, -1.1396e-2, -1.2805e-2}},
    {3.587895, {-5.317e-2, 1.04419e-1, 2.7454e-2},
     {2.5853e-2, 1.9552e-2, 2.8323e-2, 7.796e-3, -1.332e-3, 8.641e-3}},
    {1.225946, {-1.1953e-2, 4.1065e-2, -3.8437e-2},
     {3.5549e-2, 2.9474e-2, 8.627e-3, -2.117e-3, -4.037e-3, 2.29e-4}},
    {1.666555, {6.0149e-2, -1.4117e-2, -1.0517e-2},
     {1.964e-3, 4.354e-3, 5.433e-3, 1.09e-4, -1.158e-3, 3.41e-4}},
    {7.35522e-01, {1.0517e-2, -4.252e-3, 6.1597e-2},
     {1.2516e-2, 1.0027e-2, 4.815e-3, -4.28e-4, -1.196e-3, -7.41e-4}}};

const double ARMATURE = 0.1;
const double DAMPING = 1.0;
const double GRAVITY[3] = {0, 0, -9.81};
const double TOOL_RADIUS = 0.03;

struct Model {
  Mat3 base_rot;
  Mat3 j_rot[7];
  Vec3 j_pos[7];
  Mat3 ee_rot;
  Vec3 ee_pos;
  double mass[7];
  Vec3 com[7];
  Mat3 inertia[7];  // about COM, body frame
  bool init = false;
};
Model g_model;

void build_model() {
  if (g_model.init) return;
  g_model.base_rot = quat_to_rot(BASE_QUAT[0], BASE_QUAT[1], BASE_QUAT[2], BASE_QUAT[3]);
  for (int i = 0; i < 7; ++i) {
    g_model.j_rot[i] =
        quat_to_rot(JQUAT[i][0], JQUAT[i][1], JQUAT[i][2], JQUAT[i][3]);
    g_model.j_pos[i] = {JPOS[i][0], JPOS[i][1], JPOS[i][2]};
    g_model.mass[i] = RAW[i].mass;
    g_model.com[i] = {RAW[i].com[0], RAW[i].com[1], RAW[i].com[2]};
    const double* I = RAW[i].I;
    g_model.inertia[i] = {{I[0], I[3], I[4], I[3], I[1], I[5], I[4], I[5], I[2]}};
  }
  g_model.ee_rot = quat_to_rot(TOOL_QUAT[0], TOOL_QUAT[1], TOOL_QUAT[2], TOOL_QUAT[3]);
  g_model.ee_pos = {TOOL_POS[0], TOOL_POS[1], TOOL_POS[2]};

  // fuse tool sphere (density 1000) into link7, as the plant model does
  const double PI = 3.14159265358979323846;
  double m_t = 1000.0 * (4.0 / 3.0) * PI * TOOL_RADIUS * TOOL_RADIUS * TOOL_RADIUS;
  double I_t = 0.4 * m_t * TOOL_RADIUS * TOOL_RADIUS;
  double m7 = g_model.mass[6];
  Vec3 c7 = g_model.com[6];
  Vec3 p = g_model.ee_pos;
  double m = m7 + m_t;
  Vec3 c = (1.0 / m) * (m7 * c7 + m_t * p);
  auto shift = [](const Mat3& I, double mi, Vec3 d) {
    double dd = d.x * d.x + d.y * d.y + d.z * d.z;
    Mat3 out = I;
    double dv[3] = {d.x, d.y, d.z};
    for (int r = 0; r < 3; ++r)
      for (int cidx = 0; cidx < 3; ++cidx)
        out.m[3 * r + cidx] +=
            mi * ((r == cidx ? dd : 0.0) - dv[r] * dv[cidx]);
    return out;
  };
  Mat3 I7 = shift(g_model.inertia[6], m7, c7 - c);
  Mat3 It = shift({{I_t, 0, 0, 0, I_t, 0, 0, 0, I_t}}, m_t, p - c);
  Mat3 I;
  for (int k = 0; k < 9; ++k) I.m[k] = I7.m[k] + It.m[k];
  g_model.mass[6] = m;
  g_model.com[6] = c;
  g_model.inertia[6] = I;
  g_model.init = true;
}

}  // namespace

extern "C" {

// Forward kinematics: world position (3) and rotation (9, row-major) of the
// tool/ee frame.
void ffmpc_fk(const double* q, double* ee_pos, double* ee_rot) {
  build_model();
  Mat3 R = g_model.base_rot;
  Vec3 p = {0, 0, 0};
  for (int i = 0; i < 7; ++i) {
    p = p + mul(R, g_model.j_pos[i]);
    R = matmul(R, matmul(g_model.j_rot[i], rotz(q[i])));
  }
  Vec3 pe = p + mul(R, g_model.ee_pos);
  Mat3 Re = matmul(R, g_model.ee_rot);
  ee_pos[0] = pe.x; ee_pos[1] = pe.y; ee_pos[2] = pe.z;
  std::memcpy(ee_rot, Re.m, 9 * sizeof(double));
}

// Recursive Newton-Euler: tau = RNEA(q, v, a) with gravity, armature and
// viscous damping (the "plant" model).  All arrays length 7.
void ffmpc_rnea(const double* q, const double* v, const double* a, double* tau) {
  build_model();
  Mat3 Rpi[7];
  Vec3 w[7], wd[7], ac[7];
  Vec3 w_p = {0, 0, 0}, wd_p = {0, 0, 0};
  Vec3 a_p = tmul(g_model.base_rot,
                  Vec3{-GRAVITY[0], -GRAVITY[1], -GRAVITY[2]});
  const Vec3 ez = {0, 0, 1};
  for (int i = 0; i < 7; ++i) {
    Rpi[i] = matmul(g_model.j_rot[i], rotz(q[i]));
    Vec3 pp = g_model.j_pos[i];
    Vec3 w_loc = tmul(Rpi[i], w_p);
    wd[i] = tmul(Rpi[i], wd_p) + cross(w_loc, v[i] * ez) + a[i] * ez;
    ac[i] = tmul(Rpi[i], a_p + cross(wd_p, pp) + cross(w_p, cross(w_p, pp)));
    w[i] = w_loc + v[i] * ez;
    w_p = w[i]; wd_p = wd[i]; a_p = ac[i];
  }
  Vec3 f = {0, 0, 0}, n = {0, 0, 0};
  for (int i = 6; i >= 0; --i) {
    Vec3 c = g_model.com[i];
    double m = g_model.mass[i];
    const Mat3& I = g_model.inertia[i];
    Vec3 acom = ac[i] + cross(wd[i], c) + cross(w[i], cross(w[i], c));
    Vec3 F = m * acom;
    Vec3 Iw = mul(I, w[i]);
    Vec3 N = mul(I, wd[i]) + cross(w[i], Iw);
    Vec3 fi = F + f;
    Vec3 ni = N + cross(c, F) + n;
    tau[i] = ni.z + ARMATURE * a[i] + DAMPING * v[i];
    if (i > 0) {
      Vec3 fp = mul(Rpi[i], fi);
      n = mul(Rpi[i], ni) + cross(g_model.j_pos[i], fp);
      f = fp;
    }
  }
}

// Joint-space mass matrix (49, row-major), including armature.
void ffmpc_mass_matrix(const double* q, double* M) {
  double zero[7] = {0}, e[7], col[7], bias[7];
  // rnea with v=0, a=0, no gravity? use gravity-difference trick instead:
  double tau0[7];
  ffmpc_rnea(q, zero, zero, tau0);
  for (int j = 0; j < 7; ++j) {
    std::memset(e, 0, sizeof(e));
    e[j] = 1.0;
    ffmpc_rnea(q, zero, e, col);
    for (int i = 0; i < 7; ++i) M[7 * i + j] = col[i] - tau0[i];
  }
  (void)bias;
}

// Gravity-compensation torque.
void ffmpc_gravity(const double* q, double* tau) {
  double zero[7] = {0};
  ffmpc_rnea(q, zero, zero, tau);
}

// ---- ring-buffer sample logger -------------------------------------------

struct RingLogger {
  std::vector<double> buf;
  uint64_t record_len = 0;
  uint64_t capacity = 0;           // number of records
  std::atomic<uint64_t> head{0};   // written records (monotonic)
  uint64_t drained = 0;            // consumed records
};

void* ffmpc_logger_create(uint64_t record_len, uint64_t capacity) {
  auto* lg = new RingLogger();
  lg->record_len = record_len;
  lg->capacity = capacity;
  lg->buf.resize(record_len * capacity);
  return lg;
}

void ffmpc_logger_destroy(void* h) { delete static_cast<RingLogger*>(h); }

// producer side: O(record_len) copy, wait-free.
void ffmpc_logger_push(void* h, const double* rec) {
  auto* lg = static_cast<RingLogger*>(h);
  uint64_t i = lg->head.load(std::memory_order_relaxed);
  std::memcpy(&lg->buf[(i % lg->capacity) * lg->record_len], rec,
              lg->record_len * sizeof(double));
  lg->head.store(i + 1, std::memory_order_release);
}

// consumer side: copy up to max_records new records into out; returns count.
uint64_t ffmpc_logger_drain(void* h, double* out, uint64_t max_records) {
  auto* lg = static_cast<RingLogger*>(h);
  uint64_t head = lg->head.load(std::memory_order_acquire);
  uint64_t avail = head - lg->drained;
  if (avail > lg->capacity) {  // overwritten: skip lost records
    lg->drained = head - lg->capacity;
    avail = lg->capacity;
  }
  uint64_t n = avail < max_records ? avail : max_records;
  for (uint64_t k = 0; k < n; ++k) {
    uint64_t idx = (lg->drained + k) % lg->capacity;
    std::memcpy(out + k * lg->record_len, &lg->buf[idx * lg->record_len],
                lg->record_len * sizeof(double));
  }
  lg->drained += n;
  return n;
}

uint64_t ffmpc_logger_dropped(void* h) {
  auto* lg = static_cast<RingLogger*>(h);
  uint64_t head = lg->head.load(std::memory_order_acquire);
  uint64_t avail = head - lg->drained;
  return avail > lg->capacity ? avail - lg->capacity : 0;
}

}  // extern "C"

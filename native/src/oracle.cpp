// C++ reference oracle for kernel parity testing.
//
// Role (SURVEY.md §7.9): where the reference stack's compute core is native
// C++/CUDA (esti_plane in common_lib.h, the ObsModel point-to-plane loop in
// laser_mapping.cc, the GN/LM solver in lsq_registration_impl.hpp), this
// module provides INDEPENDENT from-scratch C++ implementations used as test
// oracles against the TPU kernels. Exact, simple, O(N^2) where needed —
// correctness reference, not a performance path.
//
// Built as a shared library with a C ABI (ctypes binding, no pybind11).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <functional>
#include <unordered_set>
#include <vector>

namespace {

struct V3 {
  double x = 0, y = 0, z = 0;
};

inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

// Solve the symmetric 3x3 system A n = b by Gaussian elimination w/ partial pivoting.
bool solve3(double A[3][3], double b[3], double out[3]) {
  int piv[3] = {0, 1, 2};
  for (int c = 0; c < 3; ++c) {
    int best = c;
    for (int r = c + 1; r < 3; ++r)
      if (std::fabs(A[r][c]) > std::fabs(A[best][c])) best = r;
    if (std::fabs(A[best][c]) < 1e-12) return false;
    std::swap(A[c], A[best]);
    std::swap(b[c], b[best]);
    (void)piv;
    for (int r = c + 1; r < 3; ++r) {
      double f = A[r][c] / A[c][c];
      for (int k = c; k < 3; ++k) A[r][k] -= f * A[c][k];
      b[r] -= f * b[c];
    }
  }
  for (int c = 2; c >= 0; --c) {
    double s = b[c];
    for (int k = c + 1; k < 3; ++k) s -= A[c][k] * out[k];
    out[c] = s / A[c][c];
  }
  return true;
}

// 6x6 solve, same scheme.
bool solve6(double A[6][6], double b[6], double out[6]) {
  for (int c = 0; c < 6; ++c) {
    int best = c;
    for (int r = c + 1; r < 6; ++r)
      if (std::fabs(A[r][c]) > std::fabs(A[best][c])) best = r;
    if (std::fabs(A[best][c]) < 1e-12) return false;
    for (int k = 0; k < 6; ++k) std::swap(A[c][k], A[best][k]);
    std::swap(b[c], b[best]);
    for (int r = c + 1; r < 6; ++r) {
      double f = A[r][c] / A[c][c];
      for (int k = c; k < 6; ++k) A[r][k] -= f * A[c][k];
      b[r] -= f * b[c];
    }
  }
  for (int c = 5; c >= 0; --c) {
    double s = b[c];
    for (int k = c + 1; k < 6; ++k) s -= A[c][k] * out[k];
    out[c] = s / A[c][c];
  }
  return true;
}

void so3_exp(const double w[3], double R[9]) {
  double t2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double t = std::sqrt(t2);
  double a, b;
  if (t < 1e-6) {
    a = 1.0 - t2 / 6.0;
    b = 0.5 - t2 / 24.0;
  } else {
    a = std::sin(t) / t;
    b = (1.0 - std::cos(t)) / t2;
  }
  double W[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
  double WW[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += W[i * 3 + k] * W[k * 3 + j];
      WW[i * 3 + j] = s;
    }
  for (int i = 0; i < 9; ++i) R[i] = (i % 4 == 0 ? 1.0 : 0.0) + a * W[i] + b * WW[i];
}

void mat_mul3(const double A[9], const double B[9], double C[9]) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[i * 3 + k] * B[k * 3 + j];
      C[i * 3 + j] = s;
    }
}

}  // namespace

extern "C" {

// Plane fit: solve A n = -1 over `n_pts` xyz points (row-major, n x 3),
// normalize to [nx, ny, nz, d]; returns 1 and fills coef if every point lies
// within `threshold` of the plane (common_lib.h esti_plane semantics).
int oracle_esti_plane(const double* pts, int n_pts, double threshold, double* coef) {
  double A[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
  double b[3] = {0, 0, 0};
  for (int i = 0; i < n_pts; ++i) {
    const double* p = pts + 3 * i;
    for (int r = 0; r < 3; ++r) {
      for (int c = 0; c < 3; ++c) A[r][c] += p[r] * p[c];
      b[r] += -1.0 * p[r];
    }
  }
  double n[3];
  if (!solve3(A, b, n)) return 0;
  double norm = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
  if (norm < 1e-12) return 0;
  coef[0] = n[0] / norm;
  coef[1] = n[1] / norm;
  coef[2] = n[2] / norm;
  coef[3] = 1.0 / norm;
  for (int i = 0; i < n_pts; ++i) {
    const double* p = pts + 3 * i;
    double r = coef[0] * p[0] + coef[1] * p[1] + coef[2] * p[2] + coef[3];
    if (std::fabs(r) > threshold) return 0;
  }
  return 1;
}

// Exact k-NN (brute force). queries (m x 3), database (n x 3).
// out_idx (m x k), out_d2 (m x k), padded with -1 / +inf.
void oracle_knn(const double* db, int n, const double* q, int m, int k,
                double max_range, int32_t* out_idx, double* out_d2) {
  std::vector<std::pair<double, int>> cand;
  for (int i = 0; i < m; ++i) {
    cand.clear();
    const double* qi = q + 3 * i;
    for (int j = 0; j < n; ++j) {
      const double* pj = db + 3 * j;
      double dx = qi[0] - pj[0], dy = qi[1] - pj[1], dz = qi[2] - pj[2];
      double d2 = dx * dx + dy * dy + dz * dz;
      if (d2 <= max_range * max_range) cand.push_back({d2, j});
    }
    int kk = std::min<int>(k, (int)cand.size());
    std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
    for (int c = 0; c < k; ++c) {
      if (c < kk) {
        out_idx[i * k + c] = cand[c].second;
        out_d2[i * k + c] = cand[c].first;
      } else {
        out_idx[i * k + c] = -1;
        out_d2[i * k + c] = 1e300;
      }
    }
  }
}

// Point-to-plane ICP oracle: source (ns x 3) aligned to target (nt x 3).
// Gauss-Newton with left-multiplicative [rot, trans] tangent, 5-NN plane
// correspondences re-searched every iteration, plane residual threshold 0.1.
// R (9, row-major) and t (3) are input (initial) and output (final).
int oracle_icp_point_to_plane(const double* target, int nt, const double* source,
                              int ns, int iters, double max_corr, double* R, double* t) {
  std::vector<int32_t> idx(ns * 5);
  std::vector<double> d2(ns * 5);
  std::vector<double> pw(ns * 3);
  for (int it = 0; it < iters; ++it) {
    for (int i = 0; i < ns; ++i) {
      const double* p = source + 3 * i;
      for (int r = 0; r < 3; ++r)
        pw[3 * i + r] = R[r * 3 + 0] * p[0] + R[r * 3 + 1] * p[1] + R[r * 3 + 2] * p[2] + t[r];
    }
    oracle_knn(target, nt, pw.data(), ns, 5, max_corr, idx.data(), d2.data());
    double H[6][6] = {};
    double g[6] = {};
    int n_eff = 0;
    for (int i = 0; i < ns; ++i) {
      double nbr[15];
      int cnt = 0;
      for (int c = 0; c < 5; ++c) {
        int j = idx[i * 5 + c];
        if (j < 0) break;
        std::memcpy(nbr + 3 * cnt, target + 3 * j, 3 * sizeof(double));
        ++cnt;
      }
      if (cnt < 5) continue;
      double coef[4];
      if (!oracle_esti_plane(nbr, cnt, 0.1, coef)) continue;
      const double* w = pw.data() + 3 * i;
      double r = coef[0] * w[0] + coef[1] * w[1] + coef[2] * w[2] + coef[3];
      // J = [pw x n, n]
      V3 pwv{w[0], w[1], w[2]}, nv{coef[0], coef[1], coef[2]};
      V3 cx = cross(pwv, nv);
      double J[6] = {cx.x, cx.y, cx.z, nv.x, nv.y, nv.z};
      for (int a = 0; a < 6; ++a) {
        g[a] += J[a] * r;
        for (int b2 = 0; b2 < 6; ++b2) H[a][b2] += J[a] * J[b2];
      }
      ++n_eff;
    }
    if (n_eff < 6) return 0;
    double nb[6];
    for (int a = 0; a < 6; ++a) nb[a] = -g[a];
    double dvec[6];
    double Hc[6][6];
    std::memcpy(Hc, H, sizeof(H));
    if (!solve6(Hc, nb, dvec)) return 0;
    // left-multiplicative retraction
    double dR[9];
    so3_exp(dvec, dR);
    double Rn[9];
    mat_mul3(dR, R, Rn);
    std::memcpy(R, Rn, sizeof(Rn));
    double tn[3];
    for (int r = 0; r < 3; ++r)
      tn[r] = dR[r * 3 + 0] * t[0] + dR[r * 3 + 1] * t[1] + dR[r * 3 + 2] * t[2] + dvec[3 + r];
    std::memcpy(t, tn, sizeof(tn));
    double step = 0;
    for (int a = 0; a < 6; ++a) step = std::max(step, std::fabs(dvec[a]));
    if (step < 1e-6) break;
  }
  return 1;
}

// Scan-to-map odometry replay oracle: the minimal LaserMapping::Run loop
// (reference app/run_mapping_offline.cc driving laser_mapping.cc) without the
// IMU — each frame is registered to the accumulated map by point-to-plane ICP
// and appended with voxel-occupancy gating (MapIncremental's density-bound
// role). Produces the reference trajectory for ATE gating of the TPU LIO.
//
// frames: (F * ns * 3) sensor-frame scans. poses_out: (F * 12) row-major
// [R | t] world<-sensor per frame. Returns number of frames processed.
int oracle_scan_to_map_replay(const double* frames, int F, int ns, int iters,
                              double max_corr, double map_leaf, int max_map,
                              double* poses_out) {
  std::vector<double> map_pts;
  map_pts.reserve((size_t)max_map * 3);
  // simple voxel-occupancy set for insert gating
  struct Key {
    int64_t v;
    bool operator==(const Key& o) const { return v == o.v; }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const { return std::hash<int64_t>()(k.v); }
  };
  std::unordered_set<Key, KeyHash> occ;
  auto key_of = [&](double x, double y, double z) {
    int64_t cx = (int64_t)std::floor(x / map_leaf);
    int64_t cy = (int64_t)std::floor(y / map_leaf);
    int64_t cz = (int64_t)std::floor(z / map_leaf);
    return Key{(cx * 73856093LL) ^ (cy * 19349669LL) ^ (cz * 83492791LL)};
  };
  auto insert_world = [&](const double* p) {
    if ((int)(map_pts.size() / 3) >= max_map) return;
    Key k = key_of(p[0], p[1], p[2]);
    if (occ.count(k)) return;
    occ.insert(k);
    map_pts.push_back(p[0]);
    map_pts.push_back(p[1]);
    map_pts.push_back(p[2]);
  };

  double R[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double t[3] = {0, 0, 0};
  std::vector<double> pw(ns * 3);
  for (int f = 0; f < F; ++f) {
    const double* scan = frames + (size_t)f * ns * 3;
    if (f > 0) {
      if (!oracle_icp_point_to_plane(map_pts.data(), (int)(map_pts.size() / 3),
                                     scan, ns, iters, max_corr, R, t))
        return f;
    }
    for (int i = 0; i < ns; ++i) {
      const double* p = scan + 3 * i;
      for (int r = 0; r < 3; ++r)
        pw[3 * i + r] = R[r * 3 + 0] * p[0] + R[r * 3 + 1] * p[1] + R[r * 3 + 2] * p[2] + t[r];
      insert_world(pw.data() + 3 * i);
    }
    std::memcpy(poses_out + (size_t)f * 12, R, 9 * sizeof(double));
    std::memcpy(poses_out + (size_t)f * 12 + 9, t, 3 * sizeof(double));
  }
  return F;
}

// Symmetric 3x3 eigenvalues (ascending), Jacobi iteration.
void oracle_eigh3(const double* a6, double* evals) {
  double A[3][3] = {{a6[0], a6[1], a6[2]}, {a6[1], a6[3], a6[4]}, {a6[2], a6[4], a6[5]}};
  for (int sweep = 0; sweep < 30; ++sweep) {
    double off = std::fabs(A[0][1]) + std::fabs(A[0][2]) + std::fabs(A[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 3; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::fabs(A[p][q]) < 1e-18) continue;
        double theta = (A[q][q] - A[p][p]) / (2 * A[p][q]);
        double sign = theta >= 0 ? 1.0 : -1.0;
        double tv = sign / (std::fabs(theta) + std::sqrt(theta * theta + 1));
        double c = 1.0 / std::sqrt(tv * tv + 1), s = tv * c;
        double App = A[p][p], Aqq = A[q][q], Apq = A[p][q];
        A[p][p] = c * c * App - 2 * s * c * Apq + s * s * Aqq;
        A[q][q] = s * s * App + 2 * s * c * Apq + c * c * Aqq;
        A[p][q] = A[q][p] = 0;
        for (int k = 0; k < 3; ++k) {
          if (k == p || k == q) continue;
          double Akp = A[k][p], Akq = A[k][q];
          A[k][p] = A[p][k] = c * Akp - s * Akq;
          A[k][q] = A[q][k] = s * Akp + c * Akq;
        }
      }
  }
  double e[3] = {A[0][0], A[1][1], A[2][2]};
  std::sort(e, e + 3);
  evals[0] = e[0];
  evals[1] = e[1];
  evals[2] = e[2];
}

}  // extern "C"

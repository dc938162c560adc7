// Native sensor-ingest shim: lock-free-ish frame assembly on the host.
//
// Role: the reference's buffer/sync runtime is native C++ (mutex-guarded
// deques + SyncPackages, laser_mapping.cc:391-518; the converter nodes of
// src/tool/*). On the TPU framework the device consumes fixed-shape frames;
// this shim does the high-rate work — IMU ring buffering, scan batching,
// XYZIRT normalization, padding/masking into pinned frame buffers — in C++
// so the Python layer only hands pointers around.
//
// C ABI for ctypes. Single-producer/single-consumer per stream.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct ImuSample {
  double t;
  float acc[3];
  float gyro[3];
};

struct Ingest {
  std::mutex mu;
  std::vector<ImuSample> imu;       // pending IMU samples (time-sorted append)
  double last_frame_end = -1.0;
  int n_points = 0;                 // frame capacity
  int n_imu = 0;
  // scratch for the current scan
  std::vector<float> pts;           // 3 x n_points (SoA)
  std::vector<uint8_t> mask;
  std::vector<float> t_offs;
};

}  // namespace

extern "C" {

void* ingest_create(int n_points, int n_imu) {
  auto* s = new Ingest();
  s->n_points = n_points;
  s->n_imu = n_imu;
  s->pts.resize(3 * n_points);
  s->mask.resize(n_points);
  s->t_offs.resize(n_points);
  return s;
}

void ingest_destroy(void* h) { delete static_cast<Ingest*>(h); }

// Push IMU samples (t ascending). t (k,), acc (k x 3), gyro (k x 3).
void ingest_push_imu(void* h, const double* t, const float* acc, const float* gyro, int k) {
  auto* s = static_cast<Ingest*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  for (int i = 0; i < k; ++i) {
    ImuSample m;
    m.t = t[i];
    std::memcpy(m.acc, acc + 3 * i, 3 * sizeof(float));
    std::memcpy(m.gyro, gyro + 3 * i, 3 * sizeof(float));
    // drop time regressions (the reference clears buffers on "loop back",
    // laser_mapping.cc:457-460; dropping stale samples is the shim's policy)
    if (!s->imu.empty() && m.t < s->imu.back().t) continue;
    s->imu.push_back(m);
  }
}

// Assemble a frame: scan points (n x 3 xyz float rows) with per-point times
// (absolute, seconds), scan interval [t0, t1]. Decimate by `filter_num`,
// drop blind-range returns. Outputs are written into caller buffers shaped
// exactly like models.lio.LIOFrame (SoA points, padded IMU arrays).
// Returns the number of valid points, or -1 when too few IMU samples cover
// the scan (caller should retry later — the SyncPackages gate).
int ingest_make_frame(void* h, const float* xyz, const double* t_pts, int n_in,
                      double t0, double t1, double blind, int filter_num,
                      float* out_pts, uint8_t* out_mask, float* out_toffs,
                      float* out_acc, float* out_gyro, float* out_dt,
                      float* out_offs, uint8_t* out_imask) {
  auto* s = static_cast<Ingest*>(h);
  std::lock_guard<std::mutex> lk(s->mu);

  // IMU coverage check: need at least one sample at/after t1
  if (s->imu.empty() || s->imu.back().t < t1) return -1;

  const int NP = s->n_points, NI = s->n_imu;
  std::memset(out_mask, 0, NP);
  std::memset(out_imask, 0, NI);
  for (int i = 0; i < NP; ++i) out_offs[i < NI ? i : 0] = 0;  // init below
  for (int i = 0; i < NI; ++i) {
    out_offs[i] = 1e9f;
    out_dt[i] = 0.f;
    for (int c = 0; c < 3; ++c) out_acc[3 * i + c] = out_gyro[3 * i + c] = 0.f;
  }
  std::memset(out_toffs, 0, NP * sizeof(float));
  std::memset(out_pts, 0, 3 * NP * sizeof(float));

  int kept = 0, seen = 0;
  double b2 = blind * blind;
  for (int i = 0; i < n_in && kept < NP; ++i) {
    const float* p = xyz + 3 * i;
    double d2 = (double)p[0] * p[0] + (double)p[1] * p[1] + (double)p[2] * p[2];
    if (d2 <= b2) continue;
    if (filter_num > 1 && (seen++ % filter_num) != 0) continue;
    out_pts[0 * NP + kept] = p[0];
    out_pts[1 * NP + kept] = p[1];
    out_pts[2 * NP + kept] = p[2];
    out_toffs[kept] = (float)(t_pts[i] - t0);
    out_mask[kept] = 1;
    ++kept;
  }

  // IMU slice covering (t0, t1]; dt relative to the previous consumed sample
  double prev = s->last_frame_end >= 0 ? s->last_frame_end : t0;
  int m = 0;
  size_t consumed = 0;
  for (size_t i = 0; i < s->imu.size() && m < NI; ++i) {
    const auto& im = s->imu[i];
    if (im.t <= t0) {
      consumed = i + 1;
      continue;
    }
    if (im.t > t1) break;
    std::memcpy(out_acc + 3 * m, im.acc, 3 * sizeof(float));
    std::memcpy(out_gyro + 3 * m, im.gyro, 3 * sizeof(float));
    out_dt[m] = (float)(im.t - prev);
    out_offs[m] = (float)(im.t - t0);
    out_imask[m] = 1;
    prev = im.t;
    ++m;
    consumed = i + 1;
  }
  s->imu.erase(s->imu.begin(), s->imu.begin() + consumed);
  s->last_frame_end = t1;
  return kept;
}

int ingest_pending_imu(void* h) {
  auto* s = static_cast<Ingest*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  return (int)s->imu.size();
}

}  // extern "C"

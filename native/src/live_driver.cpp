// Live sensor-driver shim: replays a preloaded dataset on REAL producer
// threads at sensor cadence, feeding the Ingest frame assembler.
//
// Role: the reference runs against thirdparty/livox_ros_driver — a live
// driver process publishing lidar packets (10 Hz CustomMsg sweeps) and IMU
// messages (200 Hz) that laser_mapping.cc's callbacks buffer under a mutex
// and SyncPackages() (laser_mapping.cc:391-518) assembles into
// MeasureGroups. This shim plays the DRIVER side natively: one IMU thread
// and one lidar thread push into the same Ingest state the offline path
// uses, with wall-clock pacing (time_scale < 1 replays faster than real
// time); frame assembly runs on the lidar thread — including the
// SyncPackages retry gate when IMU lags — and finished fixed-shape frames
// queue behind a condition variable for the (Python) consumer.
//
// C ABI for ctypes. One driver instance per sensor pair.

#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {
// from ingest.cpp
void* ingest_create(int n_points, int n_imu);
void ingest_destroy(void* h);
void ingest_push_imu(void* h, const double* t, const float* acc, const float* gyro, int k);
int ingest_make_frame(void* h, const float* xyz, const double* t_pts, int n_in,
                      double t0, double t1, double blind, int filter_num,
                      float* out_pts, uint8_t* out_mask, float* out_toffs,
                      float* out_acc, float* out_gyro, float* out_dt,
                      float* out_offs, uint8_t* out_imask);
}

namespace {

struct Scan {
  std::vector<float> xyz;      // n x 3
  std::vector<double> t_pts;   // absolute per-point stamps
  double t0 = 0, t1 = 0;
};

struct Frame {
  std::vector<float> pts;      // 3 x NP
  std::vector<uint8_t> mask;   // NP
  std::vector<float> toffs;    // NP
  std::vector<float> acc;      // NI x 3
  std::vector<float> gyro;     // NI x 3
  std::vector<float> dt;       // NI
  std::vector<float> offs;     // NI
  std::vector<uint8_t> imask;  // NI
  int n_valid = 0;
};

struct LiveDriver {
  void* ingest = nullptr;
  int NP = 0, NI = 0;
  double time_scale = 1.0;
  double blind = 0.5;
  int filter_num = 1;

  // preloaded dataset
  std::vector<Scan> scans;
  std::vector<double> imu_t;
  std::vector<float> imu_acc, imu_gyro;  // k x 3

  std::thread imu_thread, lidar_thread;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Frame> ready;
  bool imu_done = false, lidar_done = false, stop_flag = false;

  ~LiveDriver() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop_flag = true;
    }
    cv.notify_all();
    if (imu_thread.joinable()) imu_thread.join();
    if (lidar_thread.joinable()) lidar_thread.join();
    if (ingest) ingest_destroy(ingest);
  }
};

using Clock = std::chrono::steady_clock;

void sleep_until_stamp(const Clock::time_point& start, double stamp0, double stamp,
                       double scale) {
  auto target = start + std::chrono::duration_cast<Clock::duration>(
                            std::chrono::duration<double>((stamp - stamp0) * scale));
  std::this_thread::sleep_until(target);
}

void imu_main(LiveDriver* d, Clock::time_point start, double stamp0) {
  // push IMU in small batches at their (scaled) wall-clock stamps — the
  // 200 Hz driver publisher role
  const size_t k = d->imu_t.size();
  const size_t batch = 4;
  for (size_t i = 0; i < k; i += batch) {
    if (d->stop_flag) break;
    size_t m = std::min(batch, k - i);
    sleep_until_stamp(start, stamp0, d->imu_t[i + m - 1], d->time_scale);
    ingest_push_imu(d->ingest, d->imu_t.data() + i, d->imu_acc.data() + 3 * i,
                    d->imu_gyro.data() + 3 * i, (int)m);
  }
  std::lock_guard<std::mutex> lk(d->mu);
  d->imu_done = true;
}

void lidar_main(LiveDriver* d, Clock::time_point start, double stamp0) {
  for (auto& sc : d->scans) {
    if (d->stop_flag) break;
    // a sweep is delivered when it COMPLETES (t1) — the CustomMsg cadence
    sleep_until_stamp(start, stamp0, sc.t1, d->time_scale);
    Frame f;
    f.pts.resize(3 * d->NP);
    f.mask.resize(d->NP);
    f.toffs.resize(d->NP);
    f.acc.resize(3 * d->NI);
    f.gyro.resize(3 * d->NI);
    f.dt.resize(d->NI);
    f.offs.resize(d->NI);
    f.imask.resize(d->NI);
    int n = -1;
    // SyncPackages retry gate: IMU must cover the sweep end before the
    // frame can be assembled (laser_mapping.cc:497-512)
    for (int tries = 0; tries < 2000; ++tries) {
      n = ingest_make_frame(d->ingest, sc.xyz.data(), sc.t_pts.data(),
                            (int)(sc.t_pts.size()), sc.t0, sc.t1, d->blind,
                            d->filter_num, f.pts.data(), f.mask.data(),
                            f.toffs.data(), f.acc.data(), f.gyro.data(),
                            f.dt.data(), f.offs.data(), f.imask.data());
      if (n >= 0 || d->stop_flag) break;
      std::this_thread::sleep_for(std::chrono::microseconds(200));
    }
    if (n < 0) continue;  // IMU never caught up — drop the sweep
    f.n_valid = n;
    {
      std::lock_guard<std::mutex> lk(d->mu);
      d->ready.push_back(std::move(f));
    }
    d->cv.notify_one();
  }
  {
    std::lock_guard<std::mutex> lk(d->mu);
    d->lidar_done = true;
  }
  d->cv.notify_all();
}

}  // namespace

extern "C" {

void* live_create(int n_points, int n_imu, double time_scale, double blind, int filter_num) {
  auto* d = new LiveDriver();
  d->ingest = ingest_create(n_points, n_imu);
  d->NP = n_points;
  d->NI = n_imu;
  d->time_scale = time_scale;
  d->blind = blind;
  d->filter_num = filter_num;
  return d;
}

void live_destroy(void* h) { delete static_cast<LiveDriver*>(h); }

// Preload one lidar sweep (xyz n x 3, absolute per-point stamps).
void live_load_scan(void* h, const float* xyz, const double* t_pts, int n,
                    double t0, double t1) {
  auto* d = static_cast<LiveDriver*>(h);
  Scan sc;
  sc.xyz.assign(xyz, xyz + 3 * n);
  sc.t_pts.assign(t_pts, t_pts + n);
  sc.t0 = t0;
  sc.t1 = t1;
  d->scans.push_back(std::move(sc));
}

// Preload the IMU stream (t ascending, acc/gyro k x 3).
void live_load_imu(void* h, const double* t, const float* acc, const float* gyro, int k) {
  auto* d = static_cast<LiveDriver*>(h);
  d->imu_t.assign(t, t + k);
  d->imu_acc.assign(acc, acc + 3 * k);
  d->imu_gyro.assign(gyro, gyro + 3 * k);
}

// Start both producer threads. Timestamps are replayed relative to the
// earliest loaded stamp, scaled by time_scale.
void live_run(void* h) {
  auto* d = static_cast<LiveDriver*>(h);
  double stamp0 = 1e300;
  if (!d->imu_t.empty()) stamp0 = std::min(stamp0, d->imu_t.front());
  for (auto& sc : d->scans) stamp0 = std::min(stamp0, sc.t0);
  auto start = Clock::now();
  d->imu_thread = std::thread(imu_main, d, start, stamp0);
  d->lidar_thread = std::thread(lidar_main, d, start, stamp0);
}

// Pop the next assembled frame into caller buffers (LIOFrame layout).
// Blocks up to timeout_ms. Returns the frame's valid-point count, -1 on
// timeout, -2 when the replay is finished and the queue is drained.
int live_pop_frame(void* h, float* out_pts, uint8_t* out_mask, float* out_toffs,
                   float* out_acc, float* out_gyro, float* out_dt,
                   float* out_offs, uint8_t* out_imask, int timeout_ms) {
  auto* d = static_cast<LiveDriver*>(h);
  std::unique_lock<std::mutex> lk(d->mu);
  if (!d->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                      [d] { return !d->ready.empty() || d->lidar_done || d->stop_flag; }))
    return -1;
  if (d->ready.empty()) return d->lidar_done ? -2 : -1;
  Frame f = std::move(d->ready.front());
  d->ready.pop_front();
  lk.unlock();
  std::memcpy(out_pts, f.pts.data(), f.pts.size() * sizeof(float));
  std::memcpy(out_mask, f.mask.data(), f.mask.size());
  std::memcpy(out_toffs, f.toffs.data(), f.toffs.size() * sizeof(float));
  std::memcpy(out_acc, f.acc.data(), f.acc.size() * sizeof(float));
  std::memcpy(out_gyro, f.gyro.data(), f.gyro.size() * sizeof(float));
  std::memcpy(out_dt, f.dt.data(), f.dt.size() * sizeof(float));
  std::memcpy(out_offs, f.offs.data(), f.offs.size() * sizeof(float));
  std::memcpy(out_imask, f.imask.data(), f.imask.size());
  return f.n_valid;
}

int live_queue_depth(void* h) {
  auto* d = static_cast<LiveDriver*>(h);
  std::lock_guard<std::mutex> lk(d->mu);
  return (int)d->ready.size();
}

}  // extern "C"

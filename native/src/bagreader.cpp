// Native ROS1 bag (format 2.0) reader — the C++ data-loader of the runtime.
//
// Role: the reference replays recorded rosbags through the C++ rosbag API
// (src/jueying_lio/app/run_mapping_offline.cc:46-82, rosbag::View dispatching
// CustomMsg / PointCloud2 / Imu). This is the equivalent native IO path for
// the TPU framework: it parses the bag container (records, chunks,
// connections), deserializes the three front-end message types, and hands
// fixed-layout arrays to the caller — pairing with the ingest shim
// (ingest.cpp) so the whole sensor path from file bytes to padded device
// frames is native. Covers uncompressed and lz4 chunks (rosbag's common
// default — native LZ4 frame/block decoder below); bz2 chunks fall back to
// Python's io/rosbag.py (no libbz2 on this image).
//
// Container format (wiki.ros.org/Bags/Format/2.0): "#ROSBAG V2.0\n" magic,
// then records of <u32 hlen><header><u32 dlen><data>; header fields are
// <u32 len>name=value; field "op" selects the record type.
//
// C ABI for ctypes. One reader = one open bag; iteration is chronological
// over the record timestamps of the selected topics.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint8_t OP_MSG = 0x02;
constexpr uint8_t OP_CHUNK = 0x05;
constexpr uint8_t OP_CONNECTION = 0x07;

struct Field {           // PointCloud2 PointField
  std::string name;
  uint32_t offset = 0;
  uint8_t datatype = 0;  // sensor_msgs/PointField constants (1..8)
  uint32_t count = 1;
};

struct Conn {
  std::string topic;
  std::string type;
};

struct Msg {
  uint32_t conn = 0;
  double t = 0.0;        // record time
  const uint8_t* data = nullptr;  // into Bag::buf or Bag::chunks
  size_t len = 0;
};

struct Cloud {           // deserialized lidar scan (SoA)
  double stamp = 0.0;
  std::vector<float> xyz;      // n x 3 row-major
  std::vector<double> t_abs;   // absolute per-point seconds (stamp + offset)
  std::vector<float> intensity;
  std::vector<int32_t> ring;
  int time_source = 0;  // 0 ramp-fallback, 1 time, 2 t(ns), 3 timestamp, 4 curvature, 5 livox offset
};

struct Bag {
  std::vector<uint8_t> buf;               // whole file
  std::vector<std::vector<uint8_t>> chunks;  // decompressed chunk payload copies
  std::vector<Conn> conns;                // by conn id (sparse -> resized)
  std::vector<Msg> msgs;                  // time-sorted, selected topics only
  size_t cursor = 0;
  std::string lidar_topic, imu_topic;
  std::string error;
  // current message outputs
  double imu_t = 0;
  double imu_acc[3] = {0, 0, 0}, imu_gyro[3] = {0, 0, 0};
  Cloud cloud;
};

struct HeaderView {
  // field name -> (ptr, len) pairs; tiny linear scan is fine (<10 fields)
  std::vector<std::pair<std::string, std::pair<const uint8_t*, size_t>>> fields;
  const uint8_t* get(const char* name, size_t* len) const {
    for (const auto& f : fields)
      if (f.first == name) {
        *len = f.second.second;
        return f.second.first;
      }
    *len = 0;
    return nullptr;
  }
};

uint32_t rd_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}
uint64_t rd_u64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}
float rd_f32(const uint8_t* p) {
  float v;
  std::memcpy(&v, p, 4);
  return v;
}
double rd_f64(const uint8_t* p) {
  double v;
  std::memcpy(&v, p, 8);
  return v;
}

bool parse_header(const uint8_t* p, size_t n, HeaderView* out) {
  size_t o = 0;
  while (o + 4 <= n) {
    uint32_t fl = rd_u32(p + o);
    o += 4;
    if (o + fl > n) return false;
    const uint8_t* eq = static_cast<const uint8_t*>(std::memchr(p + o, '=', fl));
    if (!eq) return false;
    std::string name(reinterpret_cast<const char*>(p + o), eq - (p + o));
    out->fields.push_back({name, {eq + 1, fl - (name.size() + 1)}});
    o += fl;
  }
  return o == n;
}

// ---- LZ4 (public block + frame formats; lz4_Block_format.md /
// lz4_Frame_format.md) — rosbag's default chunk compression on many robots
// is lz4 (written by roslz4 as an LZ4 frame). Decoded natively so the fast
// replay path covers real robot bags; header/block/content checksums (xxh32,
// public spec) are VERIFIED, matching the Python reader's strictness
// (io/lz4.py) — a truncated-but-well-formed chunk must not decode to
// silently wrong bytes on the default fast path. ----

inline uint32_t xxh_rotl(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

// xxHash32 (public spec, github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md)
uint32_t xxh32(const uint8_t* p, size_t n, uint32_t seed = 0) {
  const uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                 P4 = 668265263u, P5 = 374761393u;
  const uint8_t* end = p + n;
  uint32_t h;
  if (n >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 16;
    do {
      v1 = xxh_rotl(v1 + rd_u32(p) * P2, 13) * P1; p += 4;
      v2 = xxh_rotl(v2 + rd_u32(p) * P2, 13) * P1; p += 4;
      v3 = xxh_rotl(v3 + rd_u32(p) * P2, 13) * P1; p += 4;
      v4 = xxh_rotl(v4 + rd_u32(p) * P2, 13) * P1; p += 4;
    } while (p <= limit);
    h = xxh_rotl(v1, 1) + xxh_rotl(v2, 7) + xxh_rotl(v3, 12) + xxh_rotl(v4, 18);
  } else {
    h = seed + P5;
  }
  h += static_cast<uint32_t>(n);
  while (p + 4 <= end) { h = xxh_rotl(h + rd_u32(p) * P3, 17) * P4; p += 4; }
  while (p < end) { h = xxh_rotl(h + (*p++) * P5, 11) * P1; }
  h ^= h >> 15; h *= P2;
  h ^= h >> 13; h *= P3;
  h ^= h >> 16;
  return h;
}

bool lz4_block_decompress(const uint8_t* src, size_t n, std::vector<uint8_t>* out) {
  size_t o = 0;
  while (o < n) {
    uint8_t token = src[o++];
    size_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (o >= n) return false;
        b = src[o++];
        lit += b;
      } while (b == 255);
    }
    if (o + lit > n) return false;
    out->insert(out->end(), src + o, src + o + lit);
    o += lit;
    if (o >= n) break;  // final sequence: literals only
    if (o + 2 > n) return false;
    size_t offset = src[o] | (static_cast<size_t>(src[o + 1]) << 8);
    o += 2;
    if (offset == 0 || offset > out->size()) return false;
    size_t mlen = (token & 0xF) + 4;
    if ((token & 0xF) == 15) {
      uint8_t b;
      do {
        if (o >= n) return false;
        b = src[o++];
        mlen += b;
      } while (b == 255);
    }
    size_t start = out->size() - offset;
    out->reserve(out->size() + mlen);
    for (size_t i = 0; i < mlen; ++i) out->push_back((*out)[start + i]);  // overlap-safe
  }
  return true;
}

bool lz4_frame_decompress(const uint8_t* src, size_t n, std::vector<uint8_t>* out) {
  if (n < 7 || rd_u32(src) != 0x184D2204u) return false;
  size_t o = 4;
  uint8_t flg = src[o];
  if ((flg >> 6) != 0b01) return false;
  // DictID (flg & 1) would shift every following offset by 4; roslz4 never
  // sets it, so reject rather than risk mis-framed reads.
  if (flg & 0x01) return false;
  bool block_checksum = flg & 0x10;
  bool content_size = flg & 0x08;
  bool content_checksum = flg & 0x04;
  size_t desc_len = 2 + (content_size ? 8 : 0);
  if (4 + desc_len + 1 > n) return false;
  uint8_t expect_hc = static_cast<uint8_t>(xxh32(src + 4, desc_len) >> 8);
  o += desc_len;
  if (src[o] != expect_hc) return false;  // header checksum
  o += 1;
  while (o + 4 <= n) {
    uint32_t word = rd_u32(src + o);
    o += 4;
    if (word == 0) {           // EndMark
      if (content_checksum) {
        if (o + 4 > n) return false;
        if (rd_u32(src + o) != xxh32(out->data(), out->size())) return false;
      }
      return true;
    }
    size_t size = word & 0x7FFFFFFFu;
    if (o + size > n) return false;
    if (word & 0x80000000u) {
      out->insert(out->end(), src + o, src + o + size);  // stored block
    } else if (!lz4_block_decompress(src + o, size, out)) {
      return false;
    }
    if (block_checksum) {
      if (o + size + 4 > n) return false;
      if (rd_u32(src + o + size) != xxh32(src + o, size)) return false;
    }
    o += size;
    if (block_checksum) o += 4;
  }
  return false;  // ran off the end without an EndMark
}

// parse a record stream (file tail or decompressed chunk payload); records
// found are appended to bag->msgs / bag->conns; chunk payloads recurse.
bool scan_records(Bag* bag, const uint8_t* p, size_t n) {
  size_t o = 0;
  while (o + 8 <= n) {
    uint32_t hl = rd_u32(p + o);
    if (o + 4 + hl + 4 > n) return false;
    HeaderView h;
    if (!parse_header(p + o + 4, hl, &h)) return false;
    uint32_t dl = rd_u32(p + o + 4 + hl);
    const uint8_t* data = p + o + 8 + hl;
    if (o + 8 + hl + dl > n) return false;
    size_t fl;
    const uint8_t* opf = h.get("op", &fl);
    uint8_t op = (opf && fl >= 1) ? opf[0] : 0;
    if (op == OP_CHUNK) {
      const uint8_t* comp = h.get("compression", &fl);
      std::string c = comp ? std::string(reinterpret_cast<const char*>(comp), fl) : "none";
      if (c == "none") {
        if (!scan_records(bag, data, dl)) return false;
      } else if (c == "lz4") {
        // decompressed payload is owned by the bag (Msg::data points into it)
        bag->chunks.emplace_back();
        std::vector<uint8_t>& payload = bag->chunks.back();
        if (!lz4_frame_decompress(data, dl, &payload)) {
          bag->error = "bad lz4 chunk";
          return false;
        }
        if (!scan_records(bag, payload.data(), payload.size())) return false;
      } else {
        // bz2 chunks need the Python reader (no libbz2 on this image)
        bag->error = "bag chunk compression '" + c + "' not supported by the native reader";
        return false;
      }
    } else if (op == OP_CONNECTION) {
      const uint8_t* cid_f = h.get("conn", &fl);
      if (!cid_f || fl != 4) return false;
      uint32_t cid = rd_u32(cid_f);
      HeaderView ch;
      if (!parse_header(data, dl, &ch)) return false;
      if (bag->conns.size() <= cid) bag->conns.resize(cid + 1);
      const uint8_t* tf = h.get("topic", &fl);
      if (!tf) tf = ch.get("topic", &fl);
      if (tf) bag->conns[cid].topic.assign(reinterpret_cast<const char*>(tf), fl);
      const uint8_t* ty = ch.get("type", &fl);
      if (ty) bag->conns[cid].type.assign(reinterpret_cast<const char*>(ty), fl);
    } else if (op == OP_MSG) {
      const uint8_t* cid_f = h.get("conn", &fl);
      const uint8_t* t_f = h.get("time", &fl);
      if (!cid_f || !t_f || fl != 8) return false;
      Msg m;
      m.conn = rd_u32(cid_f);
      m.t = rd_u32(t_f) + rd_u32(t_f + 4) * 1e-9;
      m.data = data;
      m.len = dl;
      bag->msgs.push_back(m);
    }
    o += 8 + hl + dl;
  }
  return true;
}

// ---- message deserializers (layouts match the .msg definitions) ----

bool read_std_header(const uint8_t* p, size_t n, double* stamp, size_t* off) {
  if (n < 16) return false;
  *stamp = rd_u32(p + 4) + rd_u32(p + 8) * 1e-9;
  uint32_t fl = rd_u32(p + 12);
  *off = 16 + fl;
  return *off <= n;
}

bool parse_imu_msg(Bag* bag, const uint8_t* p, size_t n) {
  size_t o;
  if (!read_std_header(p, n, &bag->imu_t, &o)) return false;
  // orientation (4 f64) + cov (9 f64)
  o += 4 * 8 + 9 * 8;
  if (o + 3 * 8 > n) return false;
  for (int i = 0; i < 3; ++i) bag->imu_gyro[i] = rd_f64(p + o + 8 * i);
  o += 3 * 8 + 9 * 8;
  if (o + 3 * 8 > n) return false;
  for (int i = 0; i < 3; ++i) bag->imu_acc[i] = rd_f64(p + o + 8 * i);
  return true;
}

double field_as_double(const uint8_t* p, uint8_t datatype) {
  switch (datatype) {
    case 1: return static_cast<int8_t>(*p);
    case 2: return *p;
    case 3: { int16_t v; std::memcpy(&v, p, 2); return v; }
    case 4: { uint16_t v; std::memcpy(&v, p, 2); return v; }
    case 5: { int32_t v; std::memcpy(&v, p, 4); return v; }
    case 6: return rd_u32(p);
    case 7: return rd_f32(p);
    case 8: return rd_f64(p);
  }
  return 0.0;
}

bool parse_pc2_msg(Bag* bag, const uint8_t* p, size_t n) {
  Cloud& c = bag->cloud;
  c.xyz.clear(); c.t_abs.clear(); c.intensity.clear(); c.ring.clear();
  size_t o;
  if (!read_std_header(p, n, &c.stamp, &o)) return false;
  if (o + 12 > n) return false;
  uint32_t height = rd_u32(p + o), width = rd_u32(p + o + 4);
  uint32_t nf = rd_u32(p + o + 8);
  o += 12;
  std::vector<Field> fields(nf);
  for (uint32_t i = 0; i < nf; ++i) {
    if (o + 4 > n) return false;
    uint32_t sl = rd_u32(p + o);
    o += 4;
    if (o + sl + 9 > n) return false;
    fields[i].name.assign(reinterpret_cast<const char*>(p + o), sl);
    o += sl;
    fields[i].offset = rd_u32(p + o);
    fields[i].datatype = p[o + 4];
    fields[i].count = rd_u32(p + o + 5);
    o += 9;
  }
  // is_bigendian(1) + point_step(4) + row_step(4) + data_len(4)
  if (o + 13 > n) return false;
  uint8_t bigendian = p[o];
  o += 1;
  uint32_t point_step = rd_u32(p + o);
  o += 8;  // point_step + row_step
  uint32_t dn = rd_u32(p + o);
  o += 4;
  if (bigendian || o + dn > n) return false;
  const uint8_t* data = p + o;
  size_t npts = static_cast<size_t>(height) * width;
  if (point_step == 0 || npts > dn / point_step) npts = point_step ? dn / point_step : 0;

  const Field *fx = nullptr, *fy = nullptr, *fz = nullptr, *fi = nullptr, *fr = nullptr;
  const Field *f_time = nullptr, *f_t = nullptr, *f_ts = nullptr, *f_curv = nullptr;
  for (const auto& f : fields) {
    if (f.name == "x") fx = &f;
    else if (f.name == "y") fy = &f;
    else if (f.name == "z") fz = &f;
    else if (f.name == "intensity") fi = &f;
    else if (f.name == "ring") fr = &f;
    else if (f.name == "time") f_time = &f;
    else if (f.name == "t") f_t = &f;
    else if (f.name == "timestamp") f_ts = &f;
    else if (f.name == "curvature") f_curv = &f;
  }
  if (!fx || !fy || !fz) return false;
  c.xyz.resize(npts * 3);
  c.t_abs.resize(npts);
  c.intensity.assign(npts, 0.f);
  c.ring.assign(npts, 0);

  // per-point time priority chain = converters.point_times_from_cloud
  // (pointcloud_preprocess.cc:150-305 fallbacks): time [s] > t [ns] >
  // timestamp [abs s] > curvature [ms] > linear ramp. Offsets are rebased to
  // min and re-anchored at the header stamp.
  const Field* tf = nullptr;
  double tscale = 1.0;
  if (f_time) { tf = f_time; tscale = 1.0; c.time_source = 1; }
  else if (f_t) { tf = f_t; tscale = 1e-9; c.time_source = 2; }
  else if (f_ts) { tf = f_ts; tscale = 1.0; c.time_source = 3; }
  else if (f_curv) { tf = f_curv; tscale = 1e-3; c.time_source = 4; }
  else c.time_source = 0;

  double tmin = 1e300, tmax = -1e300;
  for (size_t i = 0; i < npts; ++i) {
    const uint8_t* row = data + i * point_step;
    c.xyz[3 * i + 0] = static_cast<float>(field_as_double(row + fx->offset, fx->datatype));
    c.xyz[3 * i + 1] = static_cast<float>(field_as_double(row + fy->offset, fy->datatype));
    c.xyz[3 * i + 2] = static_cast<float>(field_as_double(row + fz->offset, fz->datatype));
    if (fi) c.intensity[i] = static_cast<float>(field_as_double(row + fi->offset, fi->datatype));
    if (fr) c.ring[i] = static_cast<int32_t>(field_as_double(row + fr->offset, fr->datatype));
    if (tf) {
      double tv = field_as_double(row + tf->offset, tf->datatype) * tscale;
      c.t_abs[i] = tv;
      tmin = std::min(tmin, tv);
      tmax = std::max(tmax, tv);
    }
  }
  if (tf && tmax > tmin) {
    for (size_t i = 0; i < npts; ++i) c.t_abs[i] = c.stamp + (c.t_abs[i] - tmin);
  } else {
    // no usable per-point time: linear 0.1 s ramp (spinning-lidar default)
    c.time_source = 0;
    for (size_t i = 0; i < npts; ++i)
      c.t_abs[i] = c.stamp + 0.1 * static_cast<double>(i) / std::max<size_t>(npts, 1);
  }
  return true;
}

bool parse_livox_msg(Bag* bag, const uint8_t* p, size_t n) {
  Cloud& c = bag->cloud;
  c.xyz.clear(); c.t_abs.clear(); c.intensity.clear(); c.ring.clear();
  size_t o;
  if (!read_std_header(p, n, &c.stamp, &o)) return false;
  if (o + 8 + 4 + 4 + 4 > n) return false;
  o += 8;        // timebase (ns) — stamp carries the same epoch in our writer
  o += 4;        // point_num
  o += 4;        // lidar_id + rsvd[3]
  uint32_t npts = rd_u32(p + o);
  o += 4;
  constexpr size_t REC = 19;  // CustomPoint: u32 + 3*f32 + 3*u8
  if (o + static_cast<size_t>(npts) * REC > n) return false;
  c.xyz.resize(npts * 3);
  c.t_abs.resize(npts);
  c.intensity.resize(npts);
  c.ring.resize(npts);
  c.time_source = 5;
  uint32_t off_min = npts ? 0xFFFFFFFFu : 0;
  for (uint32_t i = 0; i < npts; ++i)
    off_min = std::min(off_min, rd_u32(p + o + i * REC));
  for (uint32_t i = 0; i < npts; ++i) {
    const uint8_t* r = p + o + i * REC;
    uint32_t offset_ns = rd_u32(r);
    c.xyz[3 * i + 0] = rd_f32(r + 4);
    c.xyz[3 * i + 1] = rd_f32(r + 8);
    c.xyz[3 * i + 2] = rd_f32(r + 12);
    uint8_t refl = r[16], line = r[18];
    // livox_repub.cpp:31-33 intensity packing: line + reflectivity/10000
    c.intensity[i] = static_cast<float>(line) + static_cast<float>(refl) / 10000.0f;
    c.ring[i] = line;
    // rebased to the first return, matching point_times_from_cloud's
    // `t - t.min()` convention (the deskew consumer wants scan-relative time)
    c.t_abs[i] = c.stamp + (offset_ns - off_min) * 1e-9;
  }
  return true;
}

bool is_lidar_type(const std::string& t) {
  return t == "sensor_msgs/PointCloud2" || t == "livox_ros_driver/CustomMsg" ||
         t == "livox_ros_driver2/CustomMsg";
}

}  // namespace

namespace {
thread_local std::string g_err;
}  // namespace

extern "C" {

// Open + index. Empty topic strings select any sensor_msgs/Imu and any
// lidar-typed topic (the offline app's defaults). Returns nullptr on error;
// bag_last_error() then describes it (thread-local buffer).
const char* bag_last_error() { return g_err.c_str(); }

void* bag_open(const char* path, const char* lidar_topic, const char* imu_topic) {
  auto* bag = new Bag();
  bag->lidar_topic = lidar_topic ? lidar_topic : "";
  bag->imu_topic = imu_topic ? imu_topic : "";
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    g_err = std::string("cannot open ") + path;
    delete bag;
    return nullptr;
  }
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  bag->buf.resize(sz);
  if (std::fread(bag->buf.data(), 1, sz, f) != static_cast<size_t>(sz)) {
    std::fclose(f);
    g_err = "short read";
    delete bag;
    return nullptr;
  }
  std::fclose(f);
  static const char MAGIC[] = "#ROSBAG V2.0\n";
  const size_t ml = sizeof(MAGIC) - 1;
  if (bag->buf.size() < ml || std::memcmp(bag->buf.data(), MAGIC, ml) != 0) {
    g_err = std::string(path) + ": not a ROS bag 2.0 file";
    delete bag;
    return nullptr;
  }
  if (!scan_records(bag, bag->buf.data() + ml, bag->buf.size() - ml)) {
    g_err = bag->error.empty() ? "malformed bag record stream" : bag->error;
    delete bag;
    return nullptr;
  }
  // filter to selected topics and time-sort (stable: ties keep record order)
  std::vector<Msg> keep;
  for (const auto& m : bag->msgs) {
    if (m.conn >= bag->conns.size()) continue;
    const Conn& c = bag->conns[m.conn];
    bool imu = c.type == "sensor_msgs/Imu" &&
               (bag->imu_topic.empty() || c.topic == bag->imu_topic);
    bool lidar = is_lidar_type(c.type) &&
                 (bag->lidar_topic.empty() || c.topic == bag->lidar_topic);
    if (imu || lidar) keep.push_back(m);
  }
  std::stable_sort(keep.begin(), keep.end(),
                   [](const Msg& a, const Msg& b) { return a.t < b.t; });
  bag->msgs = std::move(keep);
  return bag;
}

void bag_close(void* h) { delete static_cast<Bag*>(h); }

int bag_num_messages(void* h) { return static_cast<int>(static_cast<Bag*>(h)->msgs.size()); }

// Advance to the next selected message. Returns 1=imu, 2=cloud, 0=eof,
// -1=deserialization error (message skipped; call again to continue).
int bag_next(void* h) {
  auto* bag = static_cast<Bag*>(h);
  if (bag->cursor >= bag->msgs.size()) return 0;
  const Msg& m = bag->msgs[bag->cursor++];
  const Conn& c = bag->conns[m.conn];
  if (c.type == "sensor_msgs/Imu")
    return parse_imu_msg(bag, m.data, m.len) ? 1 : -1;
  if (c.type == "sensor_msgs/PointCloud2")
    return parse_pc2_msg(bag, m.data, m.len) ? 2 : -1;
  return parse_livox_msg(bag, m.data, m.len) ? 2 : -1;
}

void bag_imu(void* h, double* t, double* acc, double* gyro) {
  auto* bag = static_cast<Bag*>(h);
  *t = bag->imu_t;
  std::memcpy(acc, bag->imu_acc, 3 * sizeof(double));
  std::memcpy(gyro, bag->imu_gyro, 3 * sizeof(double));
}

int bag_cloud_size(void* h) { return static_cast<int>(static_cast<Bag*>(h)->cloud.t_abs.size()); }
double bag_cloud_stamp(void* h) { return static_cast<Bag*>(h)->cloud.stamp; }
int bag_cloud_time_source(void* h) { return static_cast<Bag*>(h)->cloud.time_source; }

// Copy the current cloud into caller arrays (xyz (cap,3) row-major float32,
// t_abs (cap,) float64 absolute seconds, intensity (cap,) float32, ring
// (cap,) int32). Returns points copied.
int bag_cloud_read(void* h, float* xyz, double* t_abs, float* intensity, int32_t* ring, int cap) {
  auto* bag = static_cast<Bag*>(h);
  const Cloud& c = bag->cloud;
  int n = std::min<int>(cap, static_cast<int>(c.t_abs.size()));
  std::memcpy(xyz, c.xyz.data(), static_cast<size_t>(n) * 3 * sizeof(float));
  std::memcpy(t_abs, c.t_abs.data(), static_cast<size_t>(n) * sizeof(double));
  std::memcpy(intensity, c.intensity.data(), static_cast<size_t>(n) * sizeof(float));
  std::memcpy(ring, c.ring.data(), static_cast<size_t>(n) * sizeof(int32_t));
  return n;
}

}  // extern "C"

// Native scan-file decoder: threaded batch loading of LiDAR binaries.
//
// TPU-native counterpart of the reference's per-file CPU readers
// (save_probability_img.cpp:65-113 for KITTI stride-4 / nuScenes stride-5
// float32, nclt_s2s.py:41-70 for NCLT packed uint16) — rebuilt as a batch
// API that decodes a list of files into one preallocated padded tensor
// (B, max_points, 4) with validity counts, using a thread pool so the host
// keeps up with the device. Exposed to Python via ctypes (data/native.py).
//
// Build: make -C native   (produces libscanloader.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Returns number of points written (<= max_points). Pads nothing; caller
// pre-zeroes the buffer.
int64_t decode_file(const char* path, int fmt, float* out, int64_t max_points) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const int64_t bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);

  int64_t n = 0;
  if (fmt == 0 || fmt == 1) {  // KITTI stride-4 / nuScenes stride-5 float32
    const int stride = (fmt == 0) ? 4 : 5;
    const int64_t count = bytes / (stride * (int64_t)sizeof(float));
    std::vector<float> buf(count * stride);
    if (std::fread(buf.data(), sizeof(float), buf.size(), f) !=
        buf.size()) {
      std::fclose(f);
      return -1;
    }
    n = count < max_points ? count : max_points;
    for (int64_t i = 0; i < n; ++i) {
      out[i * 4 + 0] = buf[i * stride + 0];
      out[i * 4 + 1] = buf[i * stride + 1];
      out[i * 4 + 2] = buf[i * stride + 2];
      out[i * 4 + 3] = buf[i * stride + 3];
    }
  } else if (fmt == 2) {  // NCLT packed: 3x uint16 (x,y,z) + 2x uint8 (i,l)
    const int64_t count = bytes / 8;
    std::vector<uint8_t> buf(count * 8);
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
      std::fclose(f);
      return -1;
    }
    n = count < max_points ? count : max_points;
    constexpr float kScale = 0.005f;   // 5 mm (nclt_s2s.py:42)
    constexpr float kOffset = -100.0f;  // nclt_s2s.py:43
    for (int64_t i = 0; i < n; ++i) {
      const uint8_t* r = &buf[i * 8];
      uint16_t xs, ys, zs;
      std::memcpy(&xs, r + 0, 2);
      std::memcpy(&ys, r + 2, 2);
      std::memcpy(&zs, r + 4, 2);
      out[i * 4 + 0] = xs * kScale + kOffset;
      out[i * 4 + 1] = ys * kScale + kOffset;
      out[i * 4 + 2] = zs * kScale + kOffset;
      out[i * 4 + 3] = (float)r[6];
    }
  } else {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  return n;
}

}  // namespace

extern "C" {

// paths: array of B C-strings; fmt: 0=kitti, 1=nuscenes, 2=nclt.
// out: (B, max_points, 4) float32, pre-zeroed by caller.
// counts: (B,) int64 — points decoded per file, -1 on error.
// Returns 0 on success (all files decoded), 1 if any file failed.
int load_scan_batch(const char** paths, int64_t num_files, int fmt,
                    float* out, int64_t max_points, int64_t* counts,
                    int num_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> failed(0);
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> workers;
  workers.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) {
    workers.emplace_back([&]() {
      for (;;) {
        const int64_t i = next.fetch_add(1);
        if (i >= num_files) return;
        const int64_t n =
            decode_file(paths[i], fmt, out + i * max_points * 4, max_points);
        counts[i] = n;
        if (n < 0) failed.store(1);
      }
    });
  }
  for (auto& w : workers) w.join();
  return failed.load();
}

}  // extern "C"

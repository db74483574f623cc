// Native host-side image preprocessing for the posenet-tpu data path.
//
// The reference delegates all preprocessing to OpenCV's C++ kernels
// (reference posenet/utils.py:21-22: cv2.resize + cvtColor on every frame).
// This library is the first-party equivalent, shaped for the TPU serving
// pipeline: it produces uint8 RGB frames at the stride-valid target
// resolution so the host->device transfer is 3 bytes/pixel and the
// [-1, 1] normalization runs fused on-device (posenet_tpu/pipeline.py).
//
// - Bilinear resize with half-pixel centers (cv2.INTER_LINEAR convention)
//   in fixed-point (11-bit weights). NOT bit-identical to OpenCV: the
//   vertical pass keeps the full 22-bit product in a 64-bit accumulator
//   where OpenCV's SIMD path truncates intermediates to 16 bits, so
//   outputs can differ from cv2 by +-1 LSB on rounding-edge pixels (ours
//   is the higher-precision result; tests/test_preprocess.py asserts the
//   <=1 bound). Within one deployment the path is deterministic; callers
//   needing cv2-identical frames should use the cv2 fallback explicitly.
// - BGR -> RGB channel swap fused into the resize output write.
// - A persistent pthread pool parallelizes across batch items AND row
//   blocks, overlapping preprocessing of frame N+1 with device compute of
//   frame N (the Python layer dispatches asynchronously).
//
// Build: make -C native   (produces libposenet_preprocess.so)
// Python binding: posenet_tpu/native_preprocess.py via ctypes.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

constexpr int kWeightBits = 11;            // OpenCV INTER_LINEAR fixed point
constexpr int kWeightOne = 1 << kWeightBits;

struct ResizePlan {
  std::vector<int> x0, x1;                 // source column pairs
  std::vector<int16_t> wx0, wx1;           // fixed-point column weights
  int src_w;
  int dst_w;
};

// Precompute horizontal sampling positions (half-pixel centers, clamped).
ResizePlan plan_axis(int src, int dst) {
  ResizePlan p;
  p.src_w = src;
  p.dst_w = dst;
  p.x0.resize(dst);
  p.x1.resize(dst);
  p.wx0.resize(dst);
  p.wx1.resize(dst);
  const double scale = static_cast<double>(src) / dst;
  for (int x = 0; x < dst; ++x) {
    double fx = (x + 0.5) * scale - 0.5;
    int ix = static_cast<int>(std::floor(fx));
    double frac = fx - ix;
    if (ix < 0) { ix = 0; frac = 0.0; }
    if (ix >= src - 1) { ix = src - 2 >= 0 ? src - 2 : 0; frac = 1.0; }
    int w1 = static_cast<int>(frac * kWeightOne + 0.5);
    p.x0[x] = ix;
    p.x1[x] = std::min(ix + 1, src - 1);
    p.wx0[x] = static_cast<int16_t>(kWeightOne - w1);
    p.wx1[x] = static_cast<int16_t>(w1);
  }
  return p;
}

// Resize one row range of one image; optionally swap B and R on write.
void resize_rows(const uint8_t* src, int src_h, int src_w, uint8_t* dst,
                 int dst_h, int dst_w, int y_begin, int y_end,
                 const ResizePlan& px, bool swap_rb) {
  const double yscale = static_cast<double>(src_h) / dst_h;
  for (int y = y_begin; y < y_end; ++y) {
    double fy = (y + 0.5) * yscale - 0.5;
    int iy = static_cast<int>(std::floor(fy));
    double frac = fy - iy;
    if (iy < 0) { iy = 0; frac = 0.0; }
    if (iy >= src_h - 1) { iy = src_h - 2 >= 0 ? src_h - 2 : 0; frac = 1.0; }
    const int wy1 = static_cast<int>(frac * kWeightOne + 0.5);
    const int wy0 = kWeightOne - wy1;
    const uint8_t* r0 = src + static_cast<size_t>(iy) * src_w * 3;
    const uint8_t* r1 =
        src + static_cast<size_t>(std::min(iy + 1, src_h - 1)) * src_w * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dst_w * 3;
    for (int x = 0; x < dst_w; ++x) {
      const int s0 = px.x0[x] * 3, s1 = px.x1[x] * 3;
      const int w0 = px.wx0[x], w1 = px.wx1[x];
      for (int c = 0; c < 3; ++c) {
        const int top = r0[s0 + c] * w0 + r0[s1 + c] * w1;    // 8+11+? bits
        const int bot = r1[s0 + c] * w0 + r1[s1 + c] * w1;
        // OpenCV: ((top>>4)*wy0 + (bot>>4)*wy1 + round) >> 22-4... we keep
        // full precision: (top*wy0 + bot*wy1 + half) >> 22 with 64-bit acc.
        const int64_t acc = static_cast<int64_t>(top) * wy0 +
                            static_cast<int64_t>(bot) * wy1;
        int v = static_cast<int>((acc + (1ll << (2 * kWeightBits - 1))) >>
                                 (2 * kWeightBits));
        const int oc = swap_rb ? 2 - c : c;
        out[x * 3 + oc] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Persistent thread pool
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false), active_(0) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(m_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
          if (--active_ == 0) {
            std::lock_guard<std::mutex> lk(m_);
            done_cv_.notify_all();
          }
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(m_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void submit(std::function<void()> job) {
    ++active_;
    {
      std::lock_guard<std::mutex> lk(m_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

  void wait_all() {
    std::unique_lock<std::mutex> lk(m_);
    done_cv_.wait(lk, [this] { return active_.load() == 0; });
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex m_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  bool stop_;
  std::atomic<int> active_;
};

ThreadPool* pool() {
  static ThreadPool p(std::max(2u, std::thread::hardware_concurrency()));
  return &p;
}

}  // namespace

extern "C" {

// Resize one BGR/RGB uint8 HWC image; swap_rb != 0 also swaps R/B (BGR->RGB).
void posenet_resize_bilinear(const uint8_t* src, int src_h, int src_w,
                             uint8_t* dst, int dst_h, int dst_w, int swap_rb) {
  ResizePlan px = plan_axis(src_w, dst_w);
  resize_rows(src, src_h, src_w, dst, dst_h, dst_w, 0, dst_h, px,
              swap_rb != 0);
}

// Batch variant: `n` images with per-image source dims, all resized to one
// (dst_h, dst_w); parallelized over images x row blocks on the pool.
void posenet_resize_batch(const uint8_t** srcs, const int* src_hs,
                          const int* src_ws, uint8_t* dst, int n, int dst_h,
                          int dst_w, int swap_rb) {
  std::vector<ResizePlan> plans(n);
  for (int i = 0; i < n; ++i) plans[i] = plan_axis(src_ws[i], dst_w);
  const size_t dst_stride = static_cast<size_t>(dst_h) * dst_w * 3;
  const int rows_per_task = std::max(16, dst_h / 8);
  for (int i = 0; i < n; ++i) {
    for (int y = 0; y < dst_h; y += rows_per_task) {
      const int y_end = std::min(y + rows_per_task, dst_h);
      pool()->submit([=, &plans] {
        resize_rows(srcs[i], src_hs[i], src_ws[i], dst + i * dst_stride,
                    dst_h, dst_w, y, y_end, plans[i], swap_rb != 0);
      });
    }
  }
  pool()->wait_all();
}

// Fused resize + normalize to float32 in [-1, 1] (NHWC), for callers that
// want host-side normalization (parity path).
void posenet_resize_normalize(const uint8_t* src, int src_h, int src_w,
                              float* dst, int dst_h, int dst_w, int swap_rb) {
  std::vector<uint8_t> tmp(static_cast<size_t>(dst_h) * dst_w * 3);
  posenet_resize_bilinear(src, src_h, src_w, tmp.data(), dst_h, dst_w,
                          swap_rb);
  const size_t count = tmp.size();
  const float scale = 2.0f / 255.0f;
  for (size_t i = 0; i < count; ++i) dst[i] = tmp[i] * scale - 1.0f;
}

}  // extern "C"

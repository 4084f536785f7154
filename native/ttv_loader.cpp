// ttv_loader — native data-loading runtime for the Bridge pipeline.
//
// The reference's data path is Python cv2 calls per frame inside torch
// DataLoader workers (data_loader/video_dataset.py:20-84).  Here the whole
// instance batch is decoded, channel-reversed (BGR->RGB, replicating the
// reference's RGB2BGR-on-BGR quirk), bicubic-resized, optionally flipped and
// normalised to [-1, 1] by a C++ thread pool in one ctypes call — no GIL, no
// per-frame Python overhead.  Numerics are identical to the cv2 Python path
// (same OpenCV build underneath).
//
// Build: make -C native   (produces libttv_loader.so)

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <atomic>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Returns false when the image cannot be decoded (caller reports the index
// instead of training on silently zero-filled frames).
bool decode_one(const char* path, int height, int width, int flip,
                float scale, float shift, float* out) {
  cv::Mat img = cv::imread(path, cv::IMREAD_COLOR);  // BGR
  if (img.empty()) {
    std::memset(out, 0, sizeof(float) * 3 * height * width);
    return false;
  }
  cv::cvtColor(img, img, cv::COLOR_BGR2RGB);
  cv::Mat resized;
  cv::resize(img, resized, cv::Size(width, height), 0, 0, cv::INTER_CUBIC);
  if (flip) cv::flip(resized, resized, 1);  // horizontal (np.fliplr)
  cv::Mat f32;
  resized.convertTo(f32, CV_32FC3, scale, shift);
  std::memcpy(out, f32.ptr<float>(0), sizeof(float) * 3 * height * width);
  return true;
}

void run_pool(int n, int num_threads,
              const std::function<void(int)>& work) {
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) work(i);
  };
  int t = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Decode n images into out [n, height, width, 3] float32 in [-1, 1].
// paths: array of n C strings. flip: per-batch horizontal flip flag.
// Returns 0 on success, or (1 + first failing index) when any image could
// not be decoded — the Python binding raises, matching the cv2 path's
// behavior instead of silently training on zero-filled frames.
int ttv_load_frames(const char** paths, int n, int height, int width,
                    int flip, int num_threads, float* out) {
  const float scale = 1.0f / 127.5f;
  const float shift = -1.0f;
  std::atomic<int> first_bad{n};
  run_pool(n, num_threads, [&](int i) {
    if (!decode_one(paths[i], height, width, flip, scale, shift,
                    out + static_cast<size_t>(i) * 3 * height * width)) {
      int cur = first_bad.load();
      while (i < cur && !first_bad.compare_exchange_weak(cur, i)) {}
    }
  });
  return first_bad.load() == n ? 0 : 1 + first_bad.load();
}

// Raw uint8 RGB variant (for the demo/eval tools): out [n, h, w, 3] uint8.
int ttv_load_frames_u8(const char** paths, int n, int height, int width,
                       int flip, int num_threads, unsigned char* out) {
  std::atomic<int> first_bad{n};
  run_pool(n, num_threads, [&](int i) {
    cv::Mat img = cv::imread(paths[i], cv::IMREAD_COLOR);
    size_t stride = static_cast<size_t>(3) * height * width;
    if (img.empty()) {
      std::memset(out + i * stride, 0, stride);
      int cur = first_bad.load();
      while (i < cur && !first_bad.compare_exchange_weak(cur, i)) {}
      return;
    }
    cv::cvtColor(img, img, cv::COLOR_BGR2RGB);
    cv::Mat resized;
    cv::resize(img, resized, cv::Size(width, height), 0, 0, cv::INTER_CUBIC);
    if (flip) cv::flip(resized, resized, 1);
    std::memcpy(out + i * stride, resized.ptr<unsigned char>(0), stride);
  });
  return first_bad.load() == n ? 0 : 1 + first_bad.load();
}

}  // extern "C"

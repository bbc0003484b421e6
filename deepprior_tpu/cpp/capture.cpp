// Native capture shim — the lib_dscapture equivalent of the TPU framework.
//
// The reference ships a DepthSense-SDK CPython extension
// (src/util/initdepthsense.cxx / depthsense.cxx) whose essential design is:
//   * a capture loop producing depth frames at a fixed rate,
//   * double-buffered publication via an atomic pointer swap, so the Python
//     reader never observes a torn frame (initdepthsense.cxx:95-111), and
//   * a module surface start/stop/getDepthMap/getIntrinsics/getAcceleration
//     (depthsense.cxx:203-223).
//
// This shim reproduces that contract hardware-free: a std::thread capture
// loop (in-process; the reference used fork+mmap because of the SDK's event
// loop) with two selectable backends:
//   * "synthetic": renders a moving-blob hand scene (deterministic),
//   * "file":      replays raw float32 frames from a binary file whose
//                  layout is [int32 h, int32 w, int32 n, float32 data...].
// A real camera SDK backend slots into the same CaptureBackend interface.
//
// Exposed as a plain C API consumed from Python via ctypes
// (deepprior_tpu/realtime/camera.py::CaptureDevice).

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct FrameBuffer {
  std::vector<float> data;
};

struct CaptureState {
  int width = 320;
  int height = 240;
  float fx = 224.5f, fy = 230.5f, ux = 160.0f, uy = 120.0f;
  double fps = 30.0;

  // double buffer + atomic swap: writer fills the back buffer, then
  // publishes it by swapping the front pointer (same scheme as the
  // reference's onNewDepthSample handler)
  FrameBuffer buffers[2];
  std::atomic<FrameBuffer*> front{nullptr};
  FrameBuffer* back = nullptr;

  std::atomic<long long> frame_counter{0};
  std::atomic<bool> running{false};
  std::thread worker;

  // backends
  std::string mode;
  std::vector<float> file_frames;  // file backend: n*h*w floats
  int file_n = 0;

  float accel[3] = {0.0f, -9.81f, 0.0f};
};

CaptureState* g_state = nullptr;

void render_synthetic(CaptureState& s, float* out, long long t) {
  // moving hand-blob: a sphere sweeping a Lissajous path, everything else 0
  const float cx = s.ux + 60.0f * std::sin(static_cast<float>(t) / 20.0f);
  const float cy = s.uy + 40.0f * std::cos(static_cast<float>(t) / 25.0f);
  const float cz = 700.0f + 80.0f * std::sin(static_cast<float>(t) / 30.0f);
  const float radius_mm = 90.0f;
  const float r_px = radius_mm * s.fx / cz;
  const float r2 = r_px * r_px;
  for (int v = 0; v < s.height; ++v) {
    for (int u = 0; u < s.width; ++u) {
      const float du = static_cast<float>(u) - cx;
      const float dv = static_cast<float>(v) - cy;
      const float d2 = du * du + dv * dv;
      if (d2 <= r2) {
        const float bulge =
            radius_mm * std::sqrt(1.0f - d2 / (r2 > 1e-6f ? r2 : 1e-6f));
        out[v * s.width + u] = cz - bulge;
      } else {
        out[v * s.width + u] = 0.0f;
      }
    }
  }
}

bool load_file_frames(CaptureState& s, const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  int32_t hdr[3];
  if (std::fread(hdr, sizeof(int32_t), 3, f) != 3) {
    std::fclose(f);
    return false;
  }
  s.height = hdr[0];
  s.width = hdr[1];
  s.file_n = hdr[2];
  const size_t total =
      static_cast<size_t>(s.height) * s.width * static_cast<size_t>(s.file_n);
  s.file_frames.resize(total);
  const size_t got = std::fread(s.file_frames.data(), sizeof(float), total, f);
  std::fclose(f);
  return got == total;
}

void capture_loop(CaptureState* s) {
  using clock = std::chrono::steady_clock;
  const auto period = std::chrono::duration<double>(1.0 / s->fps);
  auto next = clock::now();
  while (s->running.load(std::memory_order_acquire)) {
    const long long t = s->frame_counter.load(std::memory_order_relaxed);
    float* dst = s->back->data.data();
    if (s->mode == "file" && s->file_n > 0) {
      const size_t frame_px = static_cast<size_t>(s->height) * s->width;
      const float* src = s->file_frames.data() + (t % s->file_n) * frame_px;
      std::memcpy(dst, src, frame_px * sizeof(float));
    } else {
      render_synthetic(*s, dst, t);
    }
    // publish: swap front/back (readers snapshot the front pointer and
    // memcpy out under no lock; the writer never touches a published
    // buffer until the next swap, and readers copy immediately)
    FrameBuffer* published = s->back;
    s->back = s->front.exchange(published, std::memory_order_acq_rel);
    s->frame_counter.fetch_add(1, std::memory_order_release);

    next += std::chrono::duration_cast<clock::duration>(period);
    std::this_thread::sleep_until(next);
  }
}

}  // namespace

extern "C" {

int ds_start(const char* mode, const char* source, double fps) {
  if (g_state && g_state->running.load()) return 1;  // already running
  delete g_state;
  g_state = new CaptureState();
  g_state->mode = mode ? mode : "synthetic";
  g_state->fps = fps > 0 ? fps : 30.0;
  if (g_state->mode == "file") {
    if (!load_file_frames(*g_state, source)) {
      delete g_state;
      g_state = nullptr;
      return 2;  // bad file
    }
  }
  const size_t px = static_cast<size_t>(g_state->width) * g_state->height;
  g_state->buffers[0].data.assign(px, 0.0f);
  g_state->buffers[1].data.assign(px, 0.0f);
  g_state->front.store(&g_state->buffers[0]);
  g_state->back = &g_state->buffers[1];
  g_state->running.store(true, std::memory_order_release);
  g_state->worker = std::thread(capture_loop, g_state);
  return 0;
}

void ds_stop(void) {
  if (!g_state) return;
  g_state->running.store(false, std::memory_order_release);
  if (g_state->worker.joinable()) g_state->worker.join();
}

int ds_get_depth(float* out, int capacity) {
  if (!g_state || !g_state->running.load(std::memory_order_acquire)) return 0;
  const int px = g_state->width * g_state->height;
  if (capacity < px) return 0;
  if (g_state->frame_counter.load(std::memory_order_acquire) == 0) return 0;
  FrameBuffer* fb = g_state->front.load(std::memory_order_acquire);
  std::memcpy(out, fb->data.data(), static_cast<size_t>(px) * sizeof(float));
  return 1;
}

int ds_depth_width(void) { return g_state ? g_state->width : 0; }
int ds_depth_height(void) { return g_state ? g_state->height : 0; }

long long ds_frame_counter(void) {
  return g_state ? g_state->frame_counter.load(std::memory_order_acquire) : 0;
}

void ds_get_intrinsics(float* out4) {
  if (!g_state) return;
  out4[0] = g_state->fx;
  out4[1] = g_state->fy;
  out4[2] = g_state->ux;
  out4[3] = g_state->uy;
}

void ds_get_accel(float* out3) {
  if (!g_state) return;
  std::memcpy(out3, g_state->accel, 3 * sizeof(float));
}

}  // extern "C"

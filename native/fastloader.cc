// fastloader — multi-threaded host-side sample loader for the colon-video formats.
//
// TPU-native equivalent of the reference ecosystem's native data path (the
// multi-threaded C++ HDF5 reader op configured in Demon_Data_loader.py and the TF1
// queue-runner threads): worker threads decode JPEG frames (libjpeg), read raw float32
// depth dumps, apply the TF1-parity separable bilinear resize, and hand fixed-shape
// float32 sample buffers to Python through a bounded ring buffer.  Python touches only
// whole, ready buffers (single C API, ctypes binding in
// tf_depth_estimation_tpu/data/native.py) — no GIL on the decode path.
//
// Build: make -C native   (produces libfastloader.so)
#include <csetjmp>
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ----------------------------- image ops ---------------------------------------
struct ImageF32 {
  int h = 0, w = 0, c = 0;
  std::vector<float> data;  // HWC
};

// libjpeg's default error manager calls exit() on fatal errors — one corrupt
// frame must not kill the training process, so route fatal errors through
// setjmp/longjmp (the canonical libjpeg recovery pattern) and return false.
struct JpegErrJmp {
  jpeg_error_mgr pub;
  std::jmp_buf env;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
  std::longjmp(static_cast<JpegErrJmp*>(
                   reinterpret_cast<void*>(cinfo->err))->env, 1);
}

bool decode_jpeg(const std::string& path, ImageF32* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrJmp jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_longjmp;
  jpeg_create_decompress(&cinfo);
  if (setjmp(jerr.env)) {  // fatal decode error (corrupt/truncated file)
    // The scanline buffer lives in libjpeg's own memory pool (alloc_sarray), so
    // this destroy frees it too — no C++ object with a destructor is live
    // between setjmp and any longjmp (strictly-defined recovery; the earlier
    // std::vector row had indeterminate state after longjmp per C11 7.13.2.1).
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = 3;
  out->data.resize(size_t(out->h) * out->w * 3);
  JSAMPARRAY row = (*cinfo.mem->alloc_sarray)(
      reinterpret_cast<j_common_ptr>(&cinfo), JPOOL_IMAGE,
      cinfo.output_width * 3, 1);
  for (int y = 0; y < out->h; ++y) {
    jpeg_read_scanlines(&cinfo, row, 1);
    float* dst = out->data.data() + size_t(y) * out->w * 3;
    for (int i = 0; i < out->w * 3; ++i) dst[i] = float(row[0][i]);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// TF1 align_corners=false bilinear taps: src = dst * in/out.
struct Taps {
  std::vector<int> lo, hi;
  std::vector<float> frac;
};

Taps make_taps(int in, int out) {
  Taps t;
  t.lo.resize(out);
  t.hi.resize(out);
  t.frac.resize(out);
  const double scale = double(in) / out;
  for (int i = 0; i < out; ++i) {
    double src = i * scale;
    int lo = int(src);
    if (lo > in - 1) lo = in - 1;
    int hi = lo + 1 < in ? lo + 1 : in - 1;
    t.lo[i] = lo;
    t.hi[i] = hi;
    t.frac[i] = float(src - lo);
  }
  return t;
}

// separable bilinear resize, HWC float32 (exact TF1 semantics, matches ops/resize.py)
void resize_bilinear(const ImageF32& src, int out_h, int out_w, float* dst) {
  if (src.h == out_h && src.w == out_w) {
    std::memcpy(dst, src.data.data(), src.data.size() * sizeof(float));
    return;
  }
  const Taps ty = make_taps(src.h, out_h);
  const Taps tx = make_taps(src.w, out_w);
  const int c = src.c;
  std::vector<float> rows(size_t(out_h) * src.w * c);
  for (int y = 0; y < out_h; ++y) {
    const float fy = ty.frac[y];
    const float* r0 = src.data.data() + size_t(ty.lo[y]) * src.w * c;
    const float* r1 = src.data.data() + size_t(ty.hi[y]) * src.w * c;
    float* out_row = rows.data() + size_t(y) * src.w * c;
    for (int i = 0; i < src.w * c; ++i)
      out_row[i] = r0[i] * (1.f - fy) + r1[i] * fy;
  }
  for (int y = 0; y < out_h; ++y) {
    const float* row = rows.data() + size_t(y) * src.w * c;
    float* out_row = dst + size_t(y) * out_w * c;
    for (int x = 0; x < out_w; ++x) {
      const float fx = tx.frac[x];
      const float* a = row + size_t(tx.lo[x]) * c;
      const float* b = row + size_t(tx.hi[x]) * c;
      for (int k = 0; k < c; ++k)
        out_row[size_t(x) * c + k] = a[k] * (1.f - fx) + b[k] * fx;
    }
  }
}

bool read_f32_file(const std::string& path, size_t count, float* dst) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  size_t got = std::fread(dst, sizeof(float), count, f);
  std::fclose(f);
  return got == count;
}

// ----------------------------- loader core ---------------------------------------
struct Sample {
  std::vector<float> image;  // [h, 2w or w, 3] resized frame (packed pair or single)
  std::vector<float> depth;  // [dh, dw]
  bool ok = false;
  long index = -1;
};

struct Loader {
  // config
  std::vector<std::string> image_paths;
  std::vector<std::string> depth_paths;
  int out_h, out_w;        // resized image dims (full packed width)
  int depth_h, depth_w;    // native depth dims
  int num_threads;
  size_t queue_cap;

  // state
  std::deque<Sample> queue;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<long> next_index{0};
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::vector<long> order;  // index order (shuffled by Python)
  long total = 0;

  void worker() {
    while (!stop.load()) {
      long i = next_index.fetch_add(1);
      if (i >= total) break;
      long idx = order[i];
      Sample s;
      s.index = idx;
      s.image.resize(size_t(out_h) * out_w * 3);
      s.depth.resize(size_t(depth_h) * depth_w);
      ImageF32 img;
      s.ok = decode_jpeg(image_paths[idx], &img);
      if (s.ok) {
        resize_bilinear(img, out_h, out_w, s.image.data());
        s.ok = read_f32_file(depth_paths[idx], s.depth.size(), s.depth.data());
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return queue.size() < queue_cap || stop.load(); });
      if (stop.load()) break;
      queue.push_back(std::move(s));
      cv_pop.notify_one();
    }
    // signal possible end-of-stream
    cv_pop.notify_all();
  }

  bool pop(Sample* out) {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [&] {
      return !queue.empty() || stop.load() ||
             (next_index.load() >= total && queue.empty() && all_idle());
    });
    if (queue.empty()) return false;
    *out = std::move(queue.front());
    queue.pop_front();
    cv_push.notify_one();
    return true;
  }

  bool all_idle() {
    // heuristic end-of-stream: all indices handed out; workers push remaining
    // samples before exiting, after which the queue drains to empty.
    return done_workers.load() == (int)workers.size();
  }
  std::atomic<int> done_workers{0};
};

}  // namespace

extern "C" {

// Creates a loader over parallel arrays of NUL-separated path strings.
void* fastloader_create(const char* image_paths, const char* depth_paths, long n,
                        const long* order, int out_h, int out_w, int depth_h,
                        int depth_w, int num_threads, int queue_cap) {
  auto* L = new Loader();
  const char* p = image_paths;
  for (long i = 0; i < n; ++i) {
    L->image_paths.emplace_back(p);
    p += L->image_paths.back().size() + 1;
  }
  p = depth_paths;
  for (long i = 0; i < n; ++i) {
    L->depth_paths.emplace_back(p);
    p += L->depth_paths.back().size() + 1;
  }
  L->order.assign(order, order + n);
  L->total = n;
  L->out_h = out_h;
  L->out_w = out_w;
  L->depth_h = depth_h;
  L->depth_w = depth_w;
  L->num_threads = num_threads;
  L->queue_cap = queue_cap;
  for (int t = 0; t < num_threads; ++t)
    L->workers.emplace_back([L] {
      L->worker();
      L->done_workers.fetch_add(1);
      L->cv_pop.notify_all();
    });
  return L;
}

// Pops one sample into caller-provided buffers. Returns the sample index,
// -1 on end-of-stream, -2 on a decode/read failure (buffers untouched).
long fastloader_next(void* handle, float* image_out, float* depth_out) {
  auto* L = static_cast<Loader*>(handle);
  Sample s;
  if (!L->pop(&s)) return -1;
  if (!s.ok) return -2;
  std::memcpy(image_out, s.image.data(), s.image.size() * sizeof(float));
  std::memcpy(depth_out, s.depth.data(), s.depth.size() * sizeof(float));
  return s.index;
}

void fastloader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_push.notify_all();
  L->cv_pop.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"

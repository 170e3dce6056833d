// Native host data-loader runtime for dl_attack_on_imagenet_tpu.
//
// The reference stages input through torch DataLoader worker processes with
// pinned memory (adil.py:130, :363 — multiprocess JPEG decode via PIL). This
// is the TPU-framework equivalent as a C++ library: a libjpeg decode path
// (decode -> bilinear shorter-side resize -> center crop -> [0,1] float NHWC,
// matching DS_ImageNet.py:14-18 semantics), a pthread decode pool, and a
// ring-buffer prefetching loader that assembles shuffled batches on worker
// threads while the accelerator consumes earlier ones.
//
// C ABI (consumed from Python via ctypes — see
// dl_attack_on_imagenet_tpu/runtime/host_loader.py):
//   adil_decode_batch(paths, n, size, resize, out)     -> 0 on success
//   adil_loader_create(paths, labels, n, batch, size, resize,
//                      shuffle, seed, queue_depth, n_threads) -> handle
//   adil_loader_next(handle, out_images, out_labels)   -> batch index or -1
//   adil_loader_destroy(handle)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file into an RGB8 buffer. Returns false on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>* rgb, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Separable antialiased triangle-filter resample of one axis (PIL-style
// BILINEAR with antialias): out pixel i pulls from source pixels weighted by
// a triangle of support max(1, in/out) centered at (i+0.5)*in/out.
// in: (rows, in_len, 3) float; out: (rows, out_len, 3), resampling axis 1.
void resample_axis(const std::vector<float>& in, int rows, int in_len,
                   std::vector<float>* out, int out_len) {
  out->assign(static_cast<size_t>(rows) * out_len * 3, 0.0f);
  const double scale = static_cast<double>(in_len) / out_len;
  const double filterscale = std::max(scale, 1.0);
  const double support = filterscale;  // triangle filter support = 1.0
  std::vector<double> weights;
  for (int i = 0; i < out_len; ++i) {
    const double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(std::max(center - support, 0.0));
    int xmax = static_cast<int>(std::min(center + support + 0.5,
                                         static_cast<double>(in_len)));
    weights.clear();
    double total = 0.0;
    for (int j = xmin; j < xmax; ++j) {
      double x = (j + 0.5 - center) / filterscale;
      double wgt = x < 0 ? 1.0 + x : 1.0 - x;
      if (wgt < 0) wgt = 0;
      weights.push_back(wgt);
      total += wgt;
    }
    if (total <= 0) total = 1.0;
    for (int r = 0; r < rows; ++r) {
      const float* src = in.data() + static_cast<size_t>(r) * in_len * 3;
      float* dst = out->data() + (static_cast<size_t>(r) * out_len + i) * 3;
      double acc[3] = {0, 0, 0};
      for (int j = xmin; j < xmax; ++j) {
        const double wgt = weights[j - xmin];
        for (int c = 0; c < 3; ++c) acc[c] += src[j * 3 + c] * wgt;
      }
      for (int c = 0; c < 3; ++c) dst[c] = static_cast<float>(acc[c] / total);
    }
  }
}

// Decode one file into a (size, size, 3) float32 [0,1] NHWC slice:
// shorter-side resize to `resize` (antialiased, PIL-parity), center crop
// `size` (DS_ImageNet.py:14-18).
bool decode_transform(const char* path, int size, int resize, float* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, &rgb, &w, &h)) return false;
  // torchvision computes the long side as int(size * long / short) —
  // TRUNCATION, not lround (F._compute_resized_output_size); must match
  // data/imagenet.py::default_transform exactly (decode-parity tests).
  int rw, rh;
  if (w <= h) {
    rw = resize;
    rh = static_cast<int>(static_cast<double>(resize) * h / w);
  } else {
    rh = resize;
    rw = static_cast<int>(static_cast<double>(resize) * w / h);
  }

  std::vector<float> img(rgb.size());
  for (size_t i = 0; i < rgb.size(); ++i) img[i] = rgb[i] / 255.0f;

  // Horizontal pass: (h, w, 3) -> (h, rw, 3); rows = h along axis 0.
  std::vector<float> horiz;
  resample_axis(img, h, w, &horiz, rw);
  // Vertical pass: transpose to rows = rw, resample h -> rh, transpose back.
  std::vector<float> tr(static_cast<size_t>(rw) * h * 3);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < rw; ++x)
      for (int c = 0; c < 3; ++c)
        tr[(static_cast<size_t>(x) * h + y) * 3 + c] =
            horiz[(static_cast<size_t>(y) * rw + x) * 3 + c];
  std::vector<float> vert;
  resample_axis(tr, rw, h, &vert, rh);  // (rw, rh, 3) transposed layout

  // torchvision rounds the crop half-margin half-to-even (matches Python
  // round(); see data/imagenet.py default_transform) — nearbyint under the
  // default FE_TONEAREST mode is exactly that.
  const int left = static_cast<int>(std::nearbyint((rw - size) / 2.0));
  const int top = static_cast<int>(std::nearbyint((rh - size) / 2.0));
  for (int y = 0; y < size; ++y) {
    const int sy = std::min(std::max(top + y, 0), rh - 1);
    for (int x = 0; x < size; ++x) {
      const int sx = std::min(std::max(left + x, 0), rw - 1);
      float* px = out + (static_cast<size_t>(y) * size + x) * 3;
      const float* sp = vert.data() + (static_cast<size_t>(sx) * rh + sy) * 3;
      for (int c = 0; c < 3; ++c)
        px[c] = std::min(std::max(sp[c], 0.0f), 1.0f);
    }
  }
  return true;
}

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 1;
}

// ---------------------------------------------------------------------------
// Prefetching batch loader: producer threads decode shuffled batches into a
// bounded queue; the consumer pops in order.
// ---------------------------------------------------------------------------

struct Batch {
  int64_t index;
  std::vector<float> images;
  std::vector<int64_t> labels;
  std::vector<int64_t> indices;  // original dataset row ids (-1 = padding)
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<int64_t> labels;
  int batch, size, resize;
  bool shuffle;
  uint64_t seed;
  size_t queue_depth;
  int n_threads;

  std::vector<int64_t> order;
  std::atomic<int64_t> next_batch{0};
  int64_t n_batches = 0;

  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::queue<Batch> ready;
  int64_t next_emit = 0;  // batches are emitted to the consumer in order
  std::vector<Batch> out_of_order;
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    const size_t img_elems = static_cast<size_t>(size) * size * 3;
    while (true) {
      int64_t b = next_batch.fetch_add(1);
      if (b >= n_batches) break;
      Batch batch;
      batch.index = b;
      batch.images.assign(static_cast<size_t>(this->batch) * img_elems, 0.0f);
      batch.labels.assign(this->batch, -1);
      batch.indices.assign(this->batch, -1);
      for (int i = 0; i < this->batch; ++i) {
        int64_t pos = b * this->batch + i;
        if (pos >= static_cast<int64_t>(order.size())) break;
        int64_t idx = order[pos];
        batch.indices[i] = idx;
        // Failed decodes (corrupt file, non-JPEG format) get label -2 so
        // consumers can distinguish them from padding (-1) and filter them
        // instead of silently training/serving on black images.
        if (decode_transform(paths[idx].c_str(), size, resize,
                             batch.images.data() + static_cast<size_t>(i) * img_elems)) {
          batch.labels[i] = labels[idx];
        } else {
          batch.labels[i] = -2;
        }
      }
      std::unique_lock<std::mutex> lock(mu);
      cv_push.wait(lock, [&] { return ready.size() < queue_depth || stop; });
      if (stop) break;
      out_of_order.push_back(std::move(batch));
      // Move any in-order batches to the ready queue.
      bool moved = true;
      while (moved) {
        moved = false;
        for (size_t i = 0; i < out_of_order.size(); ++i) {
          if (out_of_order[i].index == next_emit) {
            ready.push(std::move(out_of_order[i]));
            out_of_order.erase(out_of_order.begin() + i);
            ++next_emit;
            moved = true;
            break;
          }
        }
      }
      cv_pop.notify_all();
    }
    std::unique_lock<std::mutex> lock(mu);
    cv_pop.notify_all();
  }

  void start() {
    order.resize(paths.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = i;
    if (shuffle) {
      std::mt19937_64 rng(seed);
      std::shuffle(order.begin(), order.end(), rng);
    }
    n_batches = (static_cast<int64_t>(paths.size()) + batch - 1) / batch;
    for (int t = 0; t < n_threads; ++t) {
      workers.emplace_back([this] { worker(); });
    }
  }

  ~Loader() {
    {
      std::unique_lock<std::mutex> lock(mu);
      stop = true;
      cv_push.notify_all();
      cv_pop.notify_all();
    }
    for (auto& t : workers) t.join();
  }
};

}  // namespace

extern "C" {

// Parallel decode of n files into out (n, size, size, 3) float32.
int adil_decode_batch(const char** paths, int64_t n, int size, int resize,
                      float* out) {
  const size_t img_elems = static_cast<size_t>(size) * size * 3;
  std::atomic<int64_t> next{0};
  std::atomic<int> failures{0};
  int n_threads = std::min<int64_t>(hardware_threads(), n);
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&] {
      while (true) {
        int64_t i = next.fetch_add(1);
        if (i >= n) break;
        if (!decode_transform(paths[i], size, resize, out + i * img_elems)) {
          failures.fetch_add(1);
        }
      }
    });
  }
  for (auto& t : threads) t.join();
  return failures.load() == 0 ? 0 : -failures.load();
}

void* adil_loader_create(const char** paths, const int64_t* labels, int64_t n,
                         int batch, int size, int resize, int shuffle,
                         uint64_t seed, int queue_depth, int n_threads) {
  Loader* l = new Loader();
  l->paths.reserve(n);
  l->labels.assign(labels, labels + n);
  for (int64_t i = 0; i < n; ++i) l->paths.emplace_back(paths[i]);
  l->batch = batch;
  l->size = size;
  l->resize = resize;
  l->shuffle = shuffle != 0;
  l->seed = seed;
  l->queue_depth = queue_depth > 0 ? queue_depth : 2;
  l->n_threads = n_threads > 0 ? n_threads : hardware_threads();
  l->start();
  return l;
}

int64_t adil_loader_num_batches(void* handle) {
  return static_cast<Loader*>(handle)->n_batches;
}

// Pops the next batch (blocking). Returns its index, or -1 when exhausted.
// out_labels entries for padded slots are -1 (failed decodes -2);
// out_indices (when non-null) receives the original dataset row id of each
// slot (-1 = padding) — required by training consumers that address
// per-image state (the ADiL code matrix v) by global row
// (imagenet_loading.py:8-18's Subset_I.indexed analog, done natively).
int64_t adil_loader_next_indexed(void* handle, float* out_images,
                                 int64_t* out_labels, int64_t* out_indices) {
  Loader* l = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(l->mu);
  l->cv_pop.wait(lock, [&] {
    return !l->ready.empty() ||
           (l->next_emit >= l->n_batches && l->out_of_order.empty() &&
            l->next_batch.load() >= l->n_batches) ||
           l->stop;
  });
  if (l->ready.empty()) return -1;
  Batch b = std::move(l->ready.front());
  l->ready.pop();
  l->cv_push.notify_all();
  lock.unlock();
  std::memcpy(out_images, b.images.data(), b.images.size() * sizeof(float));
  std::memcpy(out_labels, b.labels.data(), b.labels.size() * sizeof(int64_t));
  if (out_indices) {
    std::memcpy(out_indices, b.indices.data(),
                b.indices.size() * sizeof(int64_t));
  }
  return b.index;
}

int64_t adil_loader_next(void* handle, float* out_images,
                         int64_t* out_labels) {
  return adil_loader_next_indexed(handle, out_images, out_labels, nullptr);
}

void adil_loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"

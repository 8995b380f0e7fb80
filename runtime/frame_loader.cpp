// Native threaded frame-tensor loader.
//
// The reference's data path leans on decord (C++) for video decode and
// multi-worker torch DataLoaders (SURVEY.md §2.9). This library is the
// TPU-native equivalent for the pre-extracted-tensor pipeline: a pool of
// worker threads reads .npy frame tensors (the extract_video_frames output
// format re-encoded as numpy) into a bounded ring of reusable host buffers so
// the Python host loop never blocks on file IO while the device computes.
//
// C ABI (consumed via ctypes from
// memory_augmented_vlm_tpu/data/native_loader.py):
//   fl_create(paths, n_paths, n_threads, queue_cap) -> handle
//   fl_next(handle, out_data, out_shape, out_ndim, out_index) -> status
//   fl_release(handle, buffer_ptr)  — return a buffer to the pool
//   fl_destroy(handle)
//
// Status codes: 0 = ok, 1 = end of stream, <0 = error.

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

struct Buffer {
  std::vector<float> data;
  std::vector<int64_t> shape;
  int64_t index = -1;  // source position in the path list
  int status = 0;
};

// Minimal .npy parser: v1/v2 headers, little-endian f4/f8/u1 C-contiguous.
bool load_npy(const std::string& path, Buffer* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return false;
  }
  uint32_t header_len = 0;
  if (magic[6] == 1) {
    uint16_t len16;
    if (fread(&len16, 2, 1, f) != 1) { fclose(f); return false; }
    header_len = len16;
  } else {
    if (fread(&header_len, 4, 1, f) != 1) { fclose(f); return false; }
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) { fclose(f); return false; }

  auto find_val = [&](const char* key) -> std::string {
    size_t p = header.find(key);
    if (p == std::string::npos) return "";
    p = header.find(':', p);
    size_t e = header.find(',', p);
    // shape tuple contains commas; handle separately
    return header.substr(p + 1, e - p - 1);
  };
  std::string descr = find_val("'descr'");
  bool fortran = header.find("'fortran_order': True") != std::string::npos;
  if (fortran) { fclose(f); return false; }

  size_t sp = header.find("'shape'");
  size_t l = header.find('(', sp), r = header.find(')', sp);
  std::vector<int64_t> shape;
  {
    std::string tup = header.substr(l + 1, r - l - 1);
    const char* s = tup.c_str();
    char* end = nullptr;
    while (*s) {
      long long v = strtoll(s, &end, 10);
      if (end == s) break;
      shape.push_back(v);
      s = end;
      while (*s == ',' || *s == ' ') ++s;
    }
  }
  int64_t count = 1;
  for (int64_t d : shape) count *= d;

  int dtype = 0;  // 0=f4, 1=f8, 2=u1
  if (descr.find("f4") != std::string::npos) dtype = 0;
  else if (descr.find("f8") != std::string::npos) dtype = 1;
  else if (descr.find("u1") != std::string::npos || descr.find("|u1") != std::string::npos) dtype = 2;
  else { fclose(f); return false; }

  out->shape = shape;
  out->data.resize(count);
  bool ok = true;
  if (dtype == 0) {
    ok = fread(out->data.data(), 4, count, f) == static_cast<size_t>(count);
  } else if (dtype == 1) {
    std::vector<double> tmp(count);
    ok = fread(tmp.data(), 8, count, f) == static_cast<size_t>(count);
    for (int64_t i = 0; i < count; ++i) out->data[i] = static_cast<float>(tmp[i]);
  } else {
    std::vector<uint8_t> tmp(count);
    ok = fread(tmp.data(), 1, count, f) == static_cast<size_t>(count);
    for (int64_t i = 0; i < count; ++i) out->data[i] = static_cast<float>(tmp[i]);
  }
  fclose(f);
  return ok;
}

struct Loader {
  std::vector<std::string> paths;
  std::atomic<int64_t> next_index{0};
  size_t queue_cap;

  std::mutex mu;
  std::condition_variable cv_push;  // workers wait for space
  std::condition_variable cv_pop;   // consumer waits for data
  std::deque<Buffer*> ready;
  Buffer* last_delivered = nullptr;  // freed on the next fl_next
  int64_t delivered = 0;
  bool stopping = false;
  std::vector<std::thread> threads;
  std::vector<Buffer*> all_buffers;  // for cleanup

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_push.notify_all();
    cv_pop.notify_all();
    for (auto& t : threads) t.join();
    for (auto* b : all_buffers) delete b;
  }

  void worker() {
    while (true) {
      int64_t idx = next_index.fetch_add(1);
      if (idx >= static_cast<int64_t>(paths.size())) return;
      Buffer* buf = new Buffer();
      buf->index = idx;
      buf->status = load_npy(paths[idx], buf) ? 0 : -1;
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return ready.size() < queue_cap || stopping; });
      if (stopping) { delete buf; return; }
      all_buffers.push_back(buf);
      ready.push_back(buf);
      cv_pop.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* fl_create(const char** paths, int64_t n_paths, int n_threads,
                int queue_cap) {
  Loader* L = new Loader();
  for (int64_t i = 0; i < n_paths; ++i) L->paths.emplace_back(paths[i]);
  L->queue_cap = queue_cap > 0 ? queue_cap : 4;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; ++i) {
    L->threads.emplace_back([L] { L->worker(); });
  }
  return L;
}

// Returns 0 with a buffer, 1 at end of stream, -1 on a load error for that
// item (stream continues), filling outputs.
int fl_next(void* handle, const float** out_data, int64_t* out_shape,
            int* out_ndim, int64_t* out_index) {
  Loader* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_pop.wait(lk, [&] {
    return !L->ready.empty() ||
           L->delivered + static_cast<int64_t>(L->ready.size()) >=
               static_cast<int64_t>(L->paths.size());
  });
  if (L->ready.empty()) return 1;  // end of stream
  // the consumer copies each buffer before requesting the next one; release
  // the previous payload here so host memory stays bounded by queue_cap
  // instead of growing with every file processed
  if (L->last_delivered) {
    L->last_delivered->data.clear();
    L->last_delivered->data.shrink_to_fit();
  }
  Buffer* buf = L->ready.front();
  L->ready.pop_front();
  L->last_delivered = buf;
  L->delivered += 1;
  L->cv_push.notify_one();
  *out_data = buf->data.data();
  *out_ndim = static_cast<int>(buf->shape.size());
  for (size_t i = 0; i < buf->shape.size() && i < 8; ++i)
    out_shape[i] = buf->shape[i];
  *out_index = buf->index;
  return buf->status;
}

void fl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

// ---------------------------------------------------------------------------
// Y4M (YUV4MPEG2) decode — the native "decord replacement" for a real video
// container this image can produce without codecs. BT.601 limited-range
// 4:2:0 -> interleaved RGB, multi-threaded over frames.
//
//   fl_decode_y4m(path, &data, shape[4], &fps) -> 0 ok / <0 error
//   fl_free_u8(data)
// ---------------------------------------------------------------------------

int fl_decode_y4m(const char* path, unsigned char** out_data,
                  int64_t* out_shape, double* out_fps) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> raw(size);
  if (fread(raw.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return -2;
  }
  fclose(f);

  long nl = 0;
  while (nl < size && raw[nl] != '\n') ++nl;
  std::string header(reinterpret_cast<char*>(raw.data()), nl);
  if (header.rfind("YUV4MPEG2", 0) != 0) return -3;
  long w = 0, h = 0;
  double fps = 30.0;
  bool c420 = true;
  size_t tok_start = 0;
  while (tok_start < header.size()) {
    size_t sp = header.find(' ', tok_start);
    std::string tok = header.substr(
        tok_start, sp == std::string::npos ? std::string::npos
                                           : sp - tok_start);
    if (!tok.empty()) {
      switch (tok[0]) {
        case 'W': w = atol(tok.c_str() + 1); break;
        case 'H': h = atol(tok.c_str() + 1); break;
        case 'F': {
          long num = 0, den = 1;
          sscanf(tok.c_str() + 1, "%ld:%ld", &num, &den);
          if (den > 0) fps = static_cast<double>(num) / den;
          break;
        }
        case 'C': c420 = tok.rfind("C420", 0) == 0; break;
        default: break;
      }
    }
    if (sp == std::string::npos) break;
    tok_start = sp + 1;
  }
  if (w <= 0 || h <= 0 || !c420) return -4;

  const long ysz = w * h, csz = (w / 2) * (h / 2);
  const long frame_bytes = ysz + 2 * csz;
  // index frame payload offsets
  std::vector<long> offsets;
  long pos = nl + 1;
  while (pos < size) {
    long fnl = pos;
    while (fnl < size && raw[fnl] != '\n') ++fnl;
    if (fnl - pos < 5 || memcmp(&raw[pos], "FRAME", 5) != 0) return -5;
    pos = fnl + 1;
    if (pos + frame_bytes > size) return -6;
    offsets.push_back(pos);
    pos += frame_bytes;
  }
  const long n_frames = static_cast<long>(offsets.size());
  unsigned char* rgb = static_cast<unsigned char*>(
      malloc(static_cast<size_t>(n_frames) * h * w * 3));
  if (!rgb) return -7;

  auto convert = [&](long fi) {
    const unsigned char* yp = &raw[offsets[fi]];
    const unsigned char* up = yp + ysz;
    const unsigned char* vp = up + csz;
    unsigned char* dst = rgb + static_cast<size_t>(fi) * h * w * 3;
    for (long row = 0; row < h; ++row) {
      const unsigned char* urow = up + (row / 2) * (w / 2);
      const unsigned char* vrow = vp + (row / 2) * (w / 2);
      for (long col = 0; col < w; ++col) {
        float yf = 1.164383f * (static_cast<float>(yp[row * w + col]) - 16.0f);
        float uf = static_cast<float>(urow[col / 2]) - 128.0f;
        float vf = static_cast<float>(vrow[col / 2]) - 128.0f;
        float r = yf + 1.596027f * vf;
        float g = yf - 0.391762f * uf - 0.812968f * vf;
        float b = yf + 2.017232f * uf;
        unsigned char* px = dst + (row * w + col) * 3;
        px[0] = static_cast<unsigned char>(
            r < 0 ? 0 : (r > 255 ? 255 : r + 0.5f));
        px[1] = static_cast<unsigned char>(
            g < 0 ? 0 : (g > 255 ? 255 : g + 0.5f));
        px[2] = static_cast<unsigned char>(
            b < 0 ? 0 : (b > 255 ? 255 : b + 0.5f));
      }
    }
  };
  long n_threads = std::min<long>(n_frames, 8);
  if (n_threads > 1) {
    std::vector<std::thread> pool;
    std::atomic<long> next_frame{0};
    for (long t = 0; t < n_threads; ++t) {
      pool.emplace_back([&] {
        for (long fi = next_frame.fetch_add(1); fi < n_frames;
             fi = next_frame.fetch_add(1)) {
          convert(fi);
        }
      });
    }
    for (auto& th : pool) th.join();
  } else {
    for (long fi = 0; fi < n_frames; ++fi) convert(fi);
  }
  *out_data = rgb;
  out_shape[0] = n_frames;
  out_shape[1] = h;
  out_shape[2] = w;
  out_shape[3] = 3;
  *out_fps = fps;
  return 0;
}

void fl_free_u8(unsigned char* ptr) { free(ptr); }

}  // extern "C"

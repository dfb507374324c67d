// faceshard: native data loader for the FaceShard format.
//
// The TPU-native equivalent of the C++ input stage the reference leaned
// on inside TensorFlow (queue runners + libjpeg decode ops — SURVEY.md
// §2b): mmap'd random-access record store, a persistent worker pool,
// multi-threaded JPEG decode (libjpeg) with optional bilinear resize to
// a fixed output geometry, filling caller-owned contiguous uint8
// batches that feed jax.device_put directly.
//
// Format: see tf_face_toolbox_tpu/data/format.py (little-endian; magic
// "FACE"). This file intentionally has no Python/JAX dependency — the
// Python side binds via ctypes (tf_face_toolbox_tpu/data/native.py).
//
// Build: `make` in this directory → libfaceshard.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <memory>
#include <fcntl.h>
#include <functional>
#include <mutex>
#include <queue>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

#include <jpeglib.h>

namespace {

constexpr uint32_t kMagic = 0x45434146;  // "FACE"
constexpr uint32_t kVersion = 1;
constexpr uint32_t kPayloadJpeg = 0;
constexpr uint32_t kPayloadRaw = 1;

#pragma pack(push, 1)
struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t payload;
  uint32_t height;
  uint32_t width;
  uint32_t channels;
  uint64_t count;
};
#pragma pack(pop)

// ───────────────────────── thread pool ──────────────────────────────

class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { Loop(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      work_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !work_.empty(); });
        if (stop_ && work_.empty()) return;
        fn = std::move(work_.front());
        work_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> work_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// ───────────────────────── jpeg decode ──────────────────────────────

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void JpegErrorExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG blob to RGB; returns false on corrupt input.
bool DecodeJpeg(const uint8_t* blob, size_t len, std::vector<uint8_t>* out,
                int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrorExit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(blob),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize(size_t(*h) * (*w) * 3);
  const size_t stride = size_t(*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Entropy-decode only: extract quantized DCT coefficient blocks and the
// quantization tables, skipping IDCT + upsampling + color conversion —
// those run on the TPU as batched 8x8 matmuls (ops/jpeg_tpu.py). This
// is the expensive half of JPEG decode moved off the (serial) host.
// Requires a 3-component 4:4:4 JPEG of exactly (8*bh, 8*bw) pixels —
// the geometry cli.pack --recode_size writes.
bool ReadDctCoefficients(const uint8_t* blob, size_t len, int bh, int bw,
                         int16_t* coef, uint16_t* qtab) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrorExit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(blob),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr* arrays = jpeg_read_coefficients(&cinfo);
  // Pixel dims must be exact block multiples too: a JPEG up to 7 px
  // smaller per axis has the same block counts but pads the edge
  // blocks — accepting it would silently diverge from the resize path.
  bool ok = arrays != nullptr && cinfo.num_components == 3 &&
            int(cinfo.image_height) == 8 * bh &&
            int(cinfo.image_width) == 8 * bw;
  for (int c = 0; ok && c < 3; ++c) {
    jpeg_component_info* ci = &cinfo.comp_info[c];
    ok = ci->h_samp_factor == 1 && ci->v_samp_factor == 1 &&
         int(ci->height_in_blocks) == bh && int(ci->width_in_blocks) == bw &&
         cinfo.quant_tbl_ptrs[ci->quant_tbl_no] != nullptr;
  }
  if (ok) {
    for (int c = 0; c < 3; ++c) {
      jpeg_component_info* ci = &cinfo.comp_info[c];
      // libjpeg keeps quantval[] de-zigzagged (natural order), exactly
      // what the device-side dequantize multiplies against.
      const JQUANT_TBL* qt = cinfo.quant_tbl_ptrs[ci->quant_tbl_no];
      for (int k = 0; k < DCTSIZE2; ++k)
        qtab[c * DCTSIZE2 + k] = qt->quantval[k];
      for (int by = 0; by < bh; ++by) {
        JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
            reinterpret_cast<j_common_ptr>(&cinfo), arrays[c], by, 1,
            FALSE);
        for (int bx = 0; bx < bw; ++bx) {
          // coefficient blocks are natural-order JCOEF[64] (int16)
          int16_t* dst =
              coef + ((size_t(by) * bw + bx) * 3 + c) * DCTSIZE2;
          static_assert(sizeof(JCOEF) == sizeof(int16_t),
                        "JCOEF expected 16-bit");
          memcpy(dst, rows[0][bx], DCTSIZE2 * sizeof(int16_t));
        }
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return ok;
}

// Bilinear resize (half-pixel centers — matches the framework's device
// resize semantics; host resize is only used when payload geometry
// differs from the requested batch geometry).
void ResizeBilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                    int dh, int dw) {
  const float scale_h = float(sh) / dh, scale_w = float(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * scale_h - 0.5f;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sh ? sh - 1 : y0 + 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * scale_w - 0.5f;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sw ? sw - 1 : x0 + 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(size_t(y0c) * sw + x0c) * 3 + c];
        float v01 = src[(size_t(y0c) * sw + x1c) * 3 + c];
        float v10 = src[(size_t(y1c) * sw + x0c) * 3 + c];
        float v11 = src[(size_t(y1c) * sw + x1c) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(size_t(y) * dw + x) * 3 + c] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// ───────────────────────── shard handle ─────────────────────────────

struct Shard {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_len = 0;
  Header hdr{};
  const uint64_t* offsets = nullptr;  // count+1
  const int32_t* labels = nullptr;    // count
  const uint8_t* data = nullptr;
  std::unique_ptr<ThreadPool> pool;
};

// Run `work(slot)` for slot 0..n on the shard's pool (serial fallback
// when no pool), blocking until every slot completes — the shared
// batch-dispatch scaffolding of fs_decode_batch / fs_dct_batch.
void RunBatch(Shard* s, int n, const std::function<void(int)>& work) {
  if (!s->pool) {
    for (int i = 0; i < n; ++i) work(i);
    return;
  }
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    s->pool->Submit([&, i] {
      work(i);
      if (done.fetch_add(1) + 1 == n) {
        std::unique_lock<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
}

}  // namespace

extern "C" {

// Open a FaceShard; returns handle or null. num_threads for decode pool.
void* fs_open(const char* path, int num_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) { close(fd); return nullptr; }
  auto* s = new Shard;
  s->fd = fd;
  s->map = static_cast<const uint8_t*>(map);
  s->map_len = st.st_size;
  auto fail = [&]() {
    munmap(map, st.st_size); close(fd); delete s;
    return static_cast<void*>(nullptr);
  };
  if (s->map_len < sizeof(Header)) return fail();
  memcpy(&s->hdr, s->map, sizeof(Header));
  if (s->hdr.magic != kMagic || s->hdr.version != kVersion) return fail();
  // Truncation guards: the mapping must cover the full index, and the
  // index's final offset must fit inside the payload region — otherwise
  // decode would read past the mapping (SIGSEGV, not a clean error).
  const uint64_t count = s->hdr.count;
  const uint64_t index_bytes = 8 * (count + 1) + 4 * count;
  if (count > (s->map_len / 8) ||
      s->map_len < sizeof(Header) + index_bytes) return fail();
  const uint8_t* p = s->map + sizeof(Header);
  s->offsets = reinterpret_cast<const uint64_t*>(p);
  p += 8 * (count + 1);
  s->labels = reinterpret_cast<const int32_t*>(p);
  p += 4 * count;
  s->data = p;
  const uint64_t data_len = s->map_len - (p - s->map);
  if (s->offsets[count] > data_len) return fail();
  for (uint64_t i = 0; i < count; ++i) {
    if (s->offsets[i] > s->offsets[i + 1]) return fail();
  }
  if (num_threads > 0) s->pool.reset(new ThreadPool(num_threads));
  return s;
}

void fs_close(void* handle) {
  auto* s = static_cast<Shard*>(handle);
  if (!s) return;
  munmap(const_cast<uint8_t*>(s->map), s->map_len);
  close(s->fd);
  delete s;
}

int64_t fs_count(void* handle) {
  return static_cast<Shard*>(handle)->hdr.count;
}

int fs_payload(void* handle) {
  return static_cast<Shard*>(handle)->hdr.payload;
}

// Copies all labels into out (int32[count]).
void fs_labels(void* handle, int32_t* out) {
  auto* s = static_cast<Shard*>(handle);
  memcpy(out, s->labels, 4 * s->hdr.count);
}

// Hint the kernel to page in records `ids[0..n)` (madvise WILLNEED on
// the mmap'd byte ranges, coalescing adjacent/overlapping pages). The
// pipeline calls this for batch k+1 while batch k decodes, so cold
// shards (bigger than page cache, first epoch, network filesystems)
// overlap their read latency with decode instead of stalling the
// decode pool on major faults. Returns the number of madvise calls.
int fs_prefetch(void* handle, const int64_t* ids, int n) {
  auto* s = static_cast<Shard*>(handle);
  const long page = sysconf(_SC_PAGESIZE);
  // Collect per-record page ranges, then merge to minimize syscalls.
  std::vector<std::pair<uintptr_t, uintptr_t>> ranges;
  ranges.reserve(n);
  for (int i = 0; i < n; ++i) {
    int64_t id = ids[i];
    if (id < 0 || uint64_t(id) >= s->hdr.count) continue;
    uintptr_t beg = reinterpret_cast<uintptr_t>(s->data + s->offsets[id]);
    uintptr_t end =
        reinterpret_cast<uintptr_t>(s->data + s->offsets[id + 1]);
    beg -= beg % page;
    end = (end + page - 1) / page * page;
    if (end > beg) ranges.emplace_back(beg, end);
  }
  std::sort(ranges.begin(), ranges.end());
  int calls = 0;
  size_t i = 0;
  while (i < ranges.size()) {
    uintptr_t beg = ranges[i].first, end = ranges[i].second;
    while (++i < ranges.size() && ranges[i].first <= end)
      end = ranges[i].second > end ? ranges[i].second : end;
    madvise(reinterpret_cast<void*>(beg), end - beg, MADV_WILLNEED);
    ++calls;
  }
  return calls;
}

// Decode records `ids[0..n)` into out (uint8[n, out_h, out_w, 3]),
// resizing when source geometry differs. Returns number of failures
// (failed slots are zero-filled).
int fs_decode_batch(void* handle, const int64_t* ids, int n,
                    uint8_t* out, int out_h, int out_w) {
  auto* s = static_cast<Shard*>(handle);
  const size_t img_bytes = size_t(out_h) * out_w * 3;
  std::atomic<int> failures{0};

  auto decode_one = [&](int slot) {
    int64_t id = ids[slot];
    uint8_t* dst = out + size_t(slot) * img_bytes;
    if (id < 0 || uint64_t(id) >= s->hdr.count) {
      memset(dst, 0, img_bytes); failures++; return;
    }
    const uint8_t* blob = s->data + s->offsets[id];
    const size_t len = s->offsets[id + 1] - s->offsets[id];
    if (s->hdr.payload == kPayloadRaw) {
      const int sh = s->hdr.height, sw = s->hdr.width;
      if (sh == out_h && sw == out_w && s->hdr.channels == 3) {
        memcpy(dst, blob, img_bytes);
      } else if (s->hdr.channels == 3) {
        ResizeBilinear(blob, sh, sw, dst, out_h, out_w);
      } else {
        memset(dst, 0, img_bytes); failures++;
      }
      return;
    }
    std::vector<uint8_t> rgb;
    int sh = 0, sw = 0;
    if (!DecodeJpeg(blob, len, &rgb, &sh, &sw)) {
      memset(dst, 0, img_bytes); failures++; return;
    }
    if (sh == out_h && sw == out_w) {
      memcpy(dst, rgb.data(), img_bytes);
    } else {
      ResizeBilinear(rgb.data(), sh, sw, dst, out_h, out_w);
    }
  };

  RunBatch(s, n, decode_one);
  return failures.load();
}

// Entropy-decode records `ids[0..n)` into quantized DCT coefficients
// coef (int16[n, blocks_h, blocks_w, 3, 64], natural order) and
// per-image quant tables qtab (uint16[n, 3, 64]). Geometry/sampling
// mismatches and corrupt records count as failures (slots zeroed).
// The TPU finishes the decode (dequantize + IDCT + YCbCr→RGB).
int fs_dct_batch(void* handle, const int64_t* ids, int n, int16_t* coef,
                 uint16_t* qtab, int blocks_h, int blocks_w) {
  auto* s = static_cast<Shard*>(handle);
  const size_t coef_elems = size_t(blocks_h) * blocks_w * 3 * DCTSIZE2;
  std::atomic<int> failures{0};

  auto decode_one = [&](int slot) {
    int16_t* cdst = coef + size_t(slot) * coef_elems;
    uint16_t* qdst = qtab + size_t(slot) * 3 * DCTSIZE2;
    int64_t id = ids[slot];
    bool ok = id >= 0 && uint64_t(id) < s->hdr.count &&
              s->hdr.payload == kPayloadJpeg;
    if (ok) {
      const uint8_t* blob = s->data + s->offsets[id];
      const size_t len = s->offsets[id + 1] - s->offsets[id];
      ok = ReadDctCoefficients(blob, len, blocks_h, blocks_w, cdst, qdst);
    }
    if (!ok) {
      memset(cdst, 0, coef_elems * sizeof(int16_t));
      memset(qdst, 0, 3 * DCTSIZE2 * sizeof(uint16_t));
      failures++;
    }
  };

  RunBatch(s, n, decode_one);
  return failures.load();
}

}  // extern "C"

// anakin_host — native host-side runtime components.
//
// The reference engine's runtime is C++ end-to-end; on TPU the device side
// belongs to XLA, so the native layer owns what stays on the host:
//
//  * JPEG decode + bilinear resize + normalize into NHWC float batches —
//    the serving data path (reference examples feed cv::Mat-style buffers;
//    `framework/c_api/anakin_runner.h` exposes the same staging role).
//  * The one-way first-fit arena planner — the C++ twin of
//    `anakin_tpu/graph/passes/memory.py`, matching the reference's
//    in-place memory scheduler discipline
//    (`framework/graph/llvm/optimizer/memory_scheduler.cpp:187-444`) for
//    large graphs where Python planning would be slow.
//
// Exposed as a C ABI (ctypes-friendly), mirroring the spirit of the
// reference's C API (`framework/c_api/anakin_runner.h:9-56`).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <csetjmp>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <string>
extern "C" {
#include <jpeglib.h>
}

extern "C" {

// ---------------------------------------------------------------- version
int ak_version() { return 1; }

// ------------------------------------------------------------ jpeg decode
struct AkJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

static void ak_jpeg_error_exit(j_common_ptr cinfo) {
  AkJpegErr* err = reinterpret_cast<AkJpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// Decode a JPEG byte buffer to RGB8. Returns 0 on success.
// On success *out_w/*out_h are set and out (caller-allocated with
// capacity out_cap bytes) holds h*w*3 RGB bytes.
int ak_decode_jpeg(const uint8_t* data, int64_t len, uint8_t* out,
                   int64_t out_cap, int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  AkJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = ak_jpeg_error_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  if (static_cast<int64_t>(w) * h * 3 > out_cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<int64_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_w = w;
  *out_h = h;
  return 0;
}

// ----------------------------------------------- resize + normalize batch
// in:  n images, each in_h x in_w x c uint8 (NHWC, contiguous)
// out: n x out_h x out_w x c float32, value = (px/255 - mean[ch]) / std[ch]
// Bilinear, half-pixel centers (align_corners=false convention).
static void resize_norm_one(const uint8_t* in, float* out, int in_h, int in_w,
                            int out_h, int out_w, int c, const float* mean,
                            const float* stddev) {
  const float sy = static_cast<float>(in_h) / out_h;
  const float sx = static_cast<float>(in_w) / out_w;
  std::vector<float> inv_std(c);
  for (int k = 0; k < c; ++k) inv_std[k] = 1.0f / stddev[k];
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(in_h - 1));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, in_h - 1);
    const float wy = fy - y0;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      fx = std::min(std::max(fx, 0.0f), static_cast<float>(in_w - 1));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, in_w - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = in + (static_cast<int64_t>(y0) * in_w + x0) * c;
      const uint8_t* p01 = in + (static_cast<int64_t>(y0) * in_w + x1) * c;
      const uint8_t* p10 = in + (static_cast<int64_t>(y1) * in_w + x0) * c;
      const uint8_t* p11 = in + (static_cast<int64_t>(y1) * in_w + x1) * c;
      float* o = out + (static_cast<int64_t>(oy) * out_w + ox) * c;
      for (int k = 0; k < c; ++k) {
        const float top = p00[k] + (p01[k] - p00[k]) * wx;
        const float bot = p10[k] + (p11[k] - p10[k]) * wx;
        const float v = (top + (bot - top) * wy) * (1.0f / 255.0f);
        o[k] = (v - mean[k]) * inv_std[k];
      }
    }
  }
}

void ak_preprocess_batch(const uint8_t* in, int n, int in_h, int in_w, int c,
                         float* out, int out_h, int out_w, const float* mean,
                         const float* stddev, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      resize_norm_one(in + static_cast<int64_t>(i) * in_h * in_w * c,
                      out + static_cast<int64_t>(i) * out_h * out_w * c,
                      in_h, in_w, out_h, out_w, c, mean, stddev);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < num_threads; ++t) ts.emplace_back(worker);
  worker();
  for (auto& t : ts) t.join();
}

// -------------------------------------------------------- arena planning
// One-way first-fit arena over edge live ranges, identical discipline to
// the Python planner: edges birth in step order, free after their last
// consumer, best-fit block reuse. Returns total arena bytes.
// sizes are pre-aligned by the caller. births/deaths are step indices;
// edges must be passed in birth order.
int64_t ak_plan_arena(int n, const int64_t* sizes, const int32_t* births,
                      const int32_t* deaths, int64_t* offsets_out) {
  struct Block {
    int64_t off, size;
  };
  std::vector<Block> free_list;
  struct Live {
    int idx;
    int64_t off, size;
    int32_t death;
  };
  std::vector<Live> live;
  int64_t top = 0;
  int i = 0;
  auto release = [&](int32_t now) {
    for (size_t k = 0; k < live.size();) {
      if (live[k].death < now) {
        free_list.push_back({live[k].off, live[k].size});
        live[k] = live.back();
        live.pop_back();
      } else {
        ++k;
      }
    }
  };
  for (i = 0; i < n; ++i) {
    release(births[i]);
    // best-fit search
    int best = -1;
    for (size_t k = 0; k < free_list.size(); ++k) {
      if (free_list[k].size >= sizes[i] &&
          (best < 0 || free_list[k].size < free_list[best].size)) {
        best = static_cast<int>(k);
      }
    }
    int64_t off;
    if (best >= 0) {
      off = free_list[best].off;
      const int64_t bsz = free_list[best].size;
      free_list[best] = free_list.back();
      free_list.pop_back();
      live.push_back({i, off, bsz, deaths[i]});
    } else {
      off = top;
      top += sizes[i];
      live.push_back({i, off, sizes[i], deaths[i]});
    }
    offsets_out[i] = off;
  }
  return top;
}

}  // extern "C"

// --------------------------------------------------- safetensors loader
// mmap-based zero-copy weight loading — the C++ twin of the reference's
// model parser (`framework/model_parser/parser/parser.cpp:29-115` reads
// the whole protobuf model into memory; weights here stay mapped and are
// paged in on demand, so serving restarts touch only what they use).
//
// Format: 8-byte LE header length N, then N bytes of JSON
//   {"tensor": {"dtype":"F32","shape":[..],"data_offsets":[b,e]}, ...},
// then the data section. The bundled mini-parser covers exactly this
// subset (flat object, string/int-array values; __metadata__ skipped).

struct AkStTensor {
  std::string name, dtype;
  std::vector<int64_t> shape;
  int64_t begin, end;  // offsets into the data section
};

struct AkStFile {
  int fd = -1;
  uint8_t* map = nullptr;
  int64_t size = 0;
  int64_t data_off = 0;
  std::vector<AkStTensor> tensors;
};

namespace {

// minimal JSON scanner for the safetensors header subset
struct MiniJson {
  const char* p;
  const char* end;
  bool fail = false;

  void ws() {
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\t' || *p == '\r'))
      ++p;
  }
  bool eat(char c) {
    ws();
    if (p < end && *p == c) {
      ++p;
      return true;
    }
    return false;
  }
  std::string str() {
    ws();
    std::string out;
    if (p >= end || *p != '"') {
      fail = true;
      return out;
    }
    ++p;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) ++p;  // keep escaped char verbatim
      out.push_back(*p++);
    }
    if (p < end) ++p;
    return out;
  }
  int64_t num() {
    ws();
    int64_t v = 0;
    bool neg = p < end && *p == '-';
    if (neg) ++p;
    while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    return neg ? -v : v;
  }
  void skip_value();  // skips strings/numbers/objects/arrays
};

void MiniJson::skip_value() {
  ws();
  if (p >= end) return;
  if (*p == '"') {
    str();
  } else if (*p == '{') {
    ++p;
    ws();
    if (eat('}')) return;
    do {
      str();
      eat(':');
      skip_value();
    } while (eat(','));
    eat('}');
  } else if (*p == '[') {
    ++p;
    ws();
    if (eat(']')) return;
    do {
      skip_value();
    } while (eat(','));
    eat(']');
  } else {
    while (p < end && *p != ',' && *p != '}' && *p != ']') ++p;
  }
}

}  // namespace

extern "C" {

void ak_st_close(void* h);

void* ak_st_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) {
    close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto* f = new AkStFile();
  f->fd = fd;
  f->map = static_cast<uint8_t*>(map);
  f->size = st.st_size;
  int64_t hlen = 0;
  memcpy(&hlen, f->map, 8);  // little-endian header length
  if (hlen <= 0 || 8 + hlen > f->size) {
    ak_st_close(f);
    return nullptr;
  }
  f->data_off = 8 + hlen;
  MiniJson j{reinterpret_cast<const char*>(f->map) + 8,
             reinterpret_cast<const char*>(f->map) + 8 + hlen};
  if (!j.eat('{')) {
    ak_st_close(f);
    return nullptr;
  }
  if (!j.eat('}')) {
    do {
      AkStTensor t;
      t.name = j.str();
      j.eat(':');
      if (t.name == "__metadata__") {
        j.skip_value();
        continue;
      }
      if (!j.eat('{')) {
        j.fail = true;
        break;
      }
      do {
        std::string key = j.str();
        j.eat(':');
        if (key == "dtype") {
          t.dtype = j.str();
        } else if (key == "shape") {
          j.eat('[');
          j.ws();
          if (*j.p != ']') {
            do {
              t.shape.push_back(j.num());
            } while (j.eat(','));
          }
          j.eat(']');
        } else if (key == "data_offsets") {
          j.eat('[');
          t.begin = j.num();
          j.eat(',');
          t.end = j.num();
          j.eat(']');
        } else {
          j.skip_value();
        }
      } while (j.eat(','));
      j.eat('}');
      if (t.begin < 0 || t.end < t.begin ||
          f->data_off + t.end > f->size) {
        j.fail = true;
        break;
      }
      f->tensors.push_back(std::move(t));
    } while (j.eat(','));
  }
  if (j.fail) {
    ak_st_close(f);
    return nullptr;
  }
  return f;
}

int ak_st_count(void* h) {
  return h ? static_cast<int>(static_cast<AkStFile*>(h)->tensors.size()) : 0;
}

const char* ak_st_name(void* h, int i) {
  auto* f = static_cast<AkStFile*>(h);
  return f->tensors[i].name.c_str();
}

const char* ak_st_dtype(void* h, int i) {
  auto* f = static_cast<AkStFile*>(h);
  return f->tensors[i].dtype.c_str();
}

int ak_st_shape(void* h, int i, int64_t* shape_out) {
  auto* f = static_cast<AkStFile*>(h);
  const auto& s = f->tensors[i].shape;
  for (size_t k = 0; k < s.size(); ++k) shape_out[k] = s[k];
  return static_cast<int>(s.size());
}

// pointer to tensor i's bytes within the mapping (valid until close)
const uint8_t* ak_st_data(void* h, int i, int64_t* nbytes_out) {
  auto* f = static_cast<AkStFile*>(h);
  const auto& t = f->tensors[i];
  *nbytes_out = t.end - t.begin;
  return f->map + f->data_off + t.begin;
}

void ak_st_close(void* h) {
  if (!h) return;
  auto* f = static_cast<AkStFile*>(h);
  if (f->map) munmap(f->map, f->size);
  if (f->fd >= 0) close(f->fd);
  delete f;
}

}  // extern "C"

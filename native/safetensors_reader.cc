// Native safetensors reader: mmap + parallel multi-shard tensor loading.
//
// TPU-native runtime component with no reference counterpart (the reference
// loads checkpoints through HF transformers' Python path, generate.py:54-67).
// Loading a 7B+ checkpoint is IO+memcpy bound; this loader:
//   * mmaps each shard (zero-copy for the OS page cache),
//   * parses the safetensors JSON header with a minimal embedded parser,
//   * exposes a flat C ABI (ctypes-friendly) so Python can wrap tensor data
//     as numpy arrays without copying, and
//   * copies/casts on a std::thread pool when materialization is requested.
//
// Safetensors format: u64 little-endian header length N, then N bytes of
// JSON: { "tensor_name": {"dtype": "F32", "shape": [..],
//         "data_offsets": [begin, end]}, ..., "__metadata__": {...} }
// followed by the raw data buffer.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libsafetensors_reader.so \
//            safetensors_reader.cc -lpthread   (see build.sh)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct TensorInfo {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;  // offsets into the data section
  uint64_t end = 0;
};

struct Shard {
  int fd = -1;
  const uint8_t *map = nullptr;
  size_t map_size = 0;
  const uint8_t *data = nullptr;  // start of the data section
  std::vector<TensorInfo> tensors;
  std::string error;
};

// ---- minimal JSON parsing (only the safetensors header subset) ----

struct Parser {
  const char *p, *end;
  bool ok = true;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool expect(char c) {
    skip_ws();
    if (p < end && *p == c) { p++; return true; }
    ok = false;
    return false;
  }
  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (p >= end || *p != '"') { ok = false; return out; }
    p++;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) { p++; out.push_back(*p++); }
      else out.push_back(*p++);
    }
    if (p < end) p++;  // closing quote
    return out;
  }
  int64_t parse_int() {
    skip_ws();
    bool neg = p < end && *p == '-';
    if (neg) p++;
    int64_t v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p++ - '0'); any = true; }
    if (!any) ok = false;
    return neg ? -v : v;
  }
  // skip any JSON value (for __metadata__ and unknown fields)
  void skip_value() {
    skip_ws();
    if (p >= end) { ok = false; return; }
    char c = *p;
    if (c == '"') { parse_string(); return; }
    if (c == '{') {
      p++;
      if (peek('}')) { p++; return; }
      while (ok) {
        parse_string(); expect(':'); skip_value();
        if (peek(',')) { p++; continue; }
        expect('}'); return;
      }
      return;
    }
    if (c == '[') {
      p++;
      if (peek(']')) { p++; return; }
      while (ok) {
        skip_value();
        if (peek(',')) { p++; continue; }
        expect(']'); return;
      }
      return;
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') p++;
  }
};

bool parse_header(const char *json, size_t len, std::vector<TensorInfo> *out,
                  std::string *err) {
  Parser ps{json, json + len};
  if (!ps.expect('{')) { *err = "header: expected {"; return false; }
  if (ps.peek('}')) return true;
  while (ps.ok) {
    std::string name = ps.parse_string();
    ps.expect(':');
    if (name == "__metadata__") {
      ps.skip_value();
    } else {
      TensorInfo ti;
      ti.name = name;
      if (!ps.expect('{')) break;
      while (ps.ok) {
        std::string key = ps.parse_string();
        ps.expect(':');
        if (key == "dtype") {
          ti.dtype = ps.parse_string();
        } else if (key == "shape") {
          ps.expect('[');
          if (!ps.peek(']')) {
            while (ps.ok) {
              ti.shape.push_back(ps.parse_int());
              if (ps.peek(',')) { ps.p++; continue; }
              break;
            }
          }
          ps.expect(']');
        } else if (key == "data_offsets") {
          ps.expect('[');
          ti.begin = (uint64_t)ps.parse_int();
          ps.expect(',');
          ti.end = (uint64_t)ps.parse_int();
          ps.expect(']');
        } else {
          ps.skip_value();
        }
        if (ps.peek(',')) { ps.p++; continue; }
        ps.expect('}');
        break;
      }
      out->push_back(std::move(ti));
    }
    if (ps.peek(',')) { ps.p++; continue; }
    ps.expect('}');
    break;
  }
  if (!ps.ok) { *err = "header: parse error"; return false; }
  return true;
}

}  // namespace

extern "C" {

// Opens a shard; returns an opaque handle (nullptr on failure).
void *st_open(const char *path) {
  auto *s = new Shard();
  s->fd = ::open(path, O_RDONLY);
  if (s->fd < 0) { delete s; return nullptr; }
  struct stat st;
  if (fstat(s->fd, &st) != 0 || (size_t)st.st_size < 8) {
    ::close(s->fd); delete s; return nullptr;
  }
  s->map_size = (size_t)st.st_size;
  void *m = mmap(nullptr, s->map_size, PROT_READ, MAP_PRIVATE, s->fd, 0);
  if (m == MAP_FAILED) { ::close(s->fd); delete s; return nullptr; }
  s->map = (const uint8_t *)m;
  madvise(m, s->map_size, MADV_WILLNEED);

  uint64_t hlen;
  memcpy(&hlen, s->map, 8);  // little-endian on all supported targets
  // Overflow-safe: map_size >= 8 was checked above, so compare against the
  // remaining bytes instead of computing 8 + hlen (which can wrap).
  if (hlen > s->map_size - 8) {
    munmap(m, s->map_size); ::close(s->fd); delete s; return nullptr;
  }
  s->data = s->map + 8 + hlen;
  const uint64_t data_size = s->map_size - 8 - hlen;
  std::string err;
  if (!parse_header((const char *)(s->map + 8), hlen, &s->tensors, &err)) {
    munmap(m, s->map_size); ::close(s->fd); delete s; return nullptr;
  }
  // Validate every tensor's extent against the data section before any
  // st_tensor_data/st_copy_tensors can dereference it: safetensors must be
  // safe to parse from untrusted input, so a corrupt/malicious header
  // (negative offsets, spans past EOF, negative dims) is a clean open
  // failure, never an OOB read.
  for (const auto &ti : s->tensors) {
    bool bad = ti.begin > ti.end || ti.end > data_size;
    for (int64_t d : ti.shape) bad = bad || d < 0;
    if (bad) {
      munmap(m, s->map_size); ::close(s->fd); delete s; return nullptr;
    }
  }
  return s;
}

void st_close(void *handle) {
  auto *s = (Shard *)handle;
  if (!s) return;
  if (s->map) munmap((void *)s->map, s->map_size);
  if (s->fd >= 0) ::close(s->fd);
  delete s;
}

int64_t st_num_tensors(void *handle) {
  return (int64_t)((Shard *)handle)->tensors.size();
}

const char *st_tensor_name(void *handle, int64_t i) {
  return ((Shard *)handle)->tensors[i].name.c_str();
}

const char *st_tensor_dtype(void *handle, int64_t i) {
  return ((Shard *)handle)->tensors[i].dtype.c_str();
}

int64_t st_tensor_ndim(void *handle, int64_t i) {
  return (int64_t)((Shard *)handle)->tensors[i].shape.size();
}

void st_tensor_shape(void *handle, int64_t i, int64_t *out) {
  const auto &sh = ((Shard *)handle)->tensors[i].shape;
  for (size_t d = 0; d < sh.size(); d++) out[d] = sh[d];
}

int64_t st_tensor_nbytes(void *handle, int64_t i) {
  const auto &t = ((Shard *)handle)->tensors[i];
  return (int64_t)(t.end - t.begin);
}

// Zero-copy pointer into the mmap (valid until st_close).
const void *st_tensor_data(void *handle, int64_t i) {
  auto *s = (Shard *)handle;
  return s->data + s->tensors[i].begin;
}

// Parallel materialization: copy `count` tensors (by index) into
// caller-provided buffers using `nthreads` threads. Buffers must be
// st_tensor_nbytes each. Returns 0 on success.
int st_copy_tensors(void *handle, const int64_t *indices, void **dsts,
                    int64_t count, int nthreads) {
  auto *s = (Shard *)handle;
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> ts;
  std::atomic<int64_t> next{0};
  for (int t = 0; t < nthreads; t++) {
    ts.emplace_back([&]() {
      for (;;) {
        int64_t j = next.fetch_add(1);
        if (j >= count) break;
        const auto &ti = s->tensors[indices[j]];
        memcpy(dsts[j], s->data + ti.begin, ti.end - ti.begin);
      }
    });
  }
  for (auto &th : ts) th.join();
  return 0;
}

}  // extern "C"

// Native runtime kernels for the host-side datapath.
//
// The reference leans on C++ libraries for its host runtime (faiss,
// pyworld, webrtcvad, pedalboard, soxr, MLX core). This module provides
// the framework's own native implementations of the host-side hot ops:
//
//   * faiss IVFFlat file parsing (mmap + single-pass scatter — large
//     .index files parse at memory bandwidth instead of Python struct)
//   * SOLA alignment (normalized cross-correlation argmax — the realtime
//     engine's per-block host op)
//   * PCM conversions (float32 <-> int16 for the streaming server)
//   * circular buffer shift-write
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// FAISS IVFFlat reader
// ---------------------------------------------------------------------------

struct FaissInfo {
  int32_t d;
  int64_t ntotal;
  int64_t nlist;
  int64_t nprobe;
  int32_t metric;  // 0 = IP, 1 = L2
};

static uint32_t rd_u32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }
static int32_t rd_i32(const uint8_t* p) { int32_t v; memcpy(&v, p, 4); return v; }
static int64_t rd_i64(const uint8_t* p) { int64_t v; memcpy(&v, p, 8); return v; }

// Parse header info. Returns 0 on success.
int faiss_ivf_info(const char* path, FaissInfo* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -2; }
  size_t len = (size_t)st.st_size;
  const uint8_t* data =
      (const uint8_t*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return -3;

  int rc = -4;
  if (len > 0x40 && memcmp(data, "IwFl", 4) == 0) {
    size_t pos = 4;
    out->d = rd_i32(data + pos); pos += 4;
    out->ntotal = rd_i64(data + pos); pos += 8;
    pos += 16;  // two dummies
    pos += 1;   // is_trained
    out->metric = rd_i32(data + pos); pos += 4;
    if (out->metric > 1) pos += 4;
    out->nlist = rd_i64(data + pos); pos += 8;
    out->nprobe = rd_i64(data + pos); pos += 8;
    rc = 0;
  }
  munmap((void*)data, len);
  return rc;
}

// Parse the full index: fills centroids (nlist*d), vectors (ntotal*d,
// id-ordered) and list_ids (ntotal). Buffers must be preallocated by the
// caller using the sizes from faiss_ivf_info. Returns 0 on success.
int faiss_ivf_read(const char* path, float* centroids, float* vectors,
                   int32_t* list_ids) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -2; }
  size_t len = (size_t)st.st_size;
  const uint8_t* data =
      (const uint8_t*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (data == MAP_FAILED) return -3;

  int rc = -4;
  do {
    if (len < 0x40 || memcmp(data, "IwFl", 4) != 0) break;
    size_t pos = 4;
    int32_t d = rd_i32(data + pos); pos += 4;
    pos += 8 + 16 + 1;  // ntotal + dummies + is_trained
    int32_t metric = rd_i32(data + pos); pos += 4;
    if (metric > 1) pos += 4;
    pos += 16;  // nlist + nprobe

    // quantizer IndexFlat
    if (memcmp(data + pos, "IxF2", 4) != 0 && memcmp(data + pos, "IxFI", 4) != 0 &&
        memcmp(data + pos, "IxFl", 4) != 0) { rc = -5; break; }
    pos += 4;
    int32_t qd = rd_i32(data + pos); pos += 4;
    int64_t qn = rd_i64(data + pos); pos += 8;
    pos += 16 + 1 + 4;  // dummies + trained + metric
    int64_t count = rd_i64(data + pos); pos += 8;
    size_t cbytes;
    if (count == qn * qd * 4) cbytes = (size_t)count;          // byte codes
    else if (count == qn * qd) cbytes = (size_t)count * 4;     // float xb
    else { rc = -6; break; }
    memcpy(centroids, data + pos, cbytes);
    pos += cbytes;

    // direct map: type byte + vector len (assume NoMap/array)
    pos += 1;
    int64_t dmlen = rd_i64(data + pos); pos += 8 + (size_t)dmlen * 8;

    if (pos + 4 > len || memcmp(data + pos, "ilar", 4) != 0) {
      // scan forward for marker (tolerate version drift)
      const uint8_t* found = nullptr;
      for (size_t i = pos; i + 4 <= len; i++) {
        if (memcmp(data + i, "ilar", 4) == 0) { found = data + i; break; }
      }
      if (!found) { rc = -7; break; }
      pos = (size_t)(found - data);
    }
    pos += 4;
    int64_t nlist = rd_i64(data + pos); pos += 8;
    int64_t code_size = rd_i64(data + pos); pos += 8;
    if (memcmp(data + pos, "full", 4) != 0) { rc = -8; break; }
    pos += 4;
    int64_t nsizes = rd_i64(data + pos); pos += 8;
    if (nsizes != nlist) { rc = -9; break; }
    const uint8_t* sizes_p = data + pos;
    pos += (size_t)nlist * 8;

    int64_t dim = code_size / 4;
    for (int64_t li = 0; li < nlist; li++) {
      int64_t n = rd_i64(sizes_p + li * 8);
      const uint8_t* ids_p = data + pos;
      pos += (size_t)n * 8;
      const uint8_t* codes_p = data + pos;
      pos += (size_t)n * (size_t)code_size;
      for (int64_t j = 0; j < n; j++) {
        int64_t id = rd_i64(ids_p + j * 8);
        memcpy(vectors + id * dim, codes_p + (size_t)j * code_size,
               (size_t)code_size);
        list_ids[id] = (int32_t)li;
      }
    }
    rc = 0;
  } while (false);

  munmap((void*)data, len);
  return rc;
}

// ---------------------------------------------------------------------------
// SOLA alignment: argmax_t sum(x[t..t+L] * ref) / sqrt(sum(x[t..t+L]^2))
// ---------------------------------------------------------------------------

int sola_align(const float* x, int64_t x_len, const float* ref,
               int64_t ref_len, int64_t search) {
  if (x_len < ref_len) return 0;
  int64_t n_pos = x_len - ref_len + 1;
  if (n_pos > search + 1) n_pos = search + 1;

  // running energy via prefix sums
  double best = -1e30;
  int64_t best_t = 0;
  double energy = 0.0;
  for (int64_t i = 0; i < ref_len; i++) energy += (double)x[i] * x[i];
  for (int64_t t = 0; t < n_pos; t++) {
    double dot = 0.0;
    const float* xt = x + t;
    for (int64_t i = 0; i < ref_len; i++) dot += (double)xt[i] * ref[i];
    double score = dot / sqrt(energy + 1e-8);
    if (score > best) { best = score; best_t = t; }
    if (t + ref_len < x_len) {
      energy += (double)x[t + ref_len] * x[t + ref_len] - (double)x[t] * x[t];
    }
  }
  return (int)best_t;
}

// ---------------------------------------------------------------------------
// PCM conversions + circular write
// ---------------------------------------------------------------------------

void f32_to_i16(const float* in, int16_t* out, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    float v = in[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    out[i] = (int16_t)lrintf(v * 32767.0f);
  }
}

void i16_to_f32(const int16_t* in, float* out, int64_t n) {
  const float s = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; i++) out[i] = in[i] * s;
}

void circular_write_f32(const float* data, int64_t n, float* buffer,
                        int64_t buf_len) {
  if (n >= buf_len) {
    memcpy(buffer, data + (n - buf_len), (size_t)buf_len * 4);
  } else {
    memmove(buffer, buffer + n, (size_t)(buf_len - n) * 4);
    memcpy(buffer + (buf_len - n), data, (size_t)n * 4);
  }
}

}  // extern "C"

// rpagp native runtime: fast dataset IO + split planning (C++17).
//
// The reference's data layer is Python scipy.io loading of the Wilson
// UCI .mat collection (SURVEY.md §1 L0). This native module is the
// TPU-framework equivalent of a native data loader: it parses datasets
// and builds split plans at C speed, off the Python hot path, so a
// many-dataset × many-fold experiment sweep spends its host time in jit
// compilation rather than text parsing.
//
//   * load_csv        — mmap'd single-pass numeric CSV parser (strtod),
//                       ~10x faster than numpy.loadtxt.
//   * load_mat_data   — minimal MATLAB v5 MAT-file reader for the
//                       Wilson-collection layout (one 2-D double matrix
//                       named "data"), including miCOMPRESSED elements
//                       (zlib inflate).
//   * zscore_fit_apply — column means/stds + in-place normalization.
//   * kfold_perm      — deterministic Fisher-Yates permutation
//                       (splitmix64), matching rpagp.utils.datasets.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>
#include <zlib.h>

extern "C" {

// ------------------------------------------------------------------ CSV

// Parse a numeric CSV/whitespace table. Returns rows, cols via out
// params; data is malloc'd row-major double, caller frees with
// rpagp_free. Returns 0 on success.
int load_csv(const char* path, double** out_data, int64_t* out_rows,
             int64_t* out_cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return 1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return 1; }
  size_t len = (size_t)st.st_size;
  char* buf = (char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (buf == MAP_FAILED) return 1;

  std::vector<double> vals;
  vals.reserve(len / 8);
  int64_t cols = -1, cur_cols = 0, rows = 0;
  size_t row_start = 0;  // vals.size() at the start of the current line
  const char* p = buf;
  const char* end = buf + len;
  while (p < end) {
    // skip separators
    while (p < end && (*p == ',' || *p == ' ' || *p == '\t' || *p == '\r'))
      ++p;
    if (p < end && *p == '\n') {
      if (cur_cols > 0) {
        if (cols < 0) cols = cur_cols;
        if (cur_cols != cols) { munmap(buf, len); return 2; }
        ++rows;
      }
      cur_cols = 0;
      row_start = vals.size();
      ++p;
      continue;
    }
    if (p >= end) break;
    char* next = nullptr;
    double v = strtod(p, &next);
    if (next == p) {  // non-numeric token (header?) — skip the line,
      // dropping any values already pushed from it (otherwise a line
      // like "1stcol,2ndcol" leaks a leading 1 and shifts every row)
      vals.resize(row_start);
      while (p < end && *p != '\n') ++p;
      cur_cols = 0;
      continue;
    }
    vals.push_back(v);
    ++cur_cols;
    p = next;
  }
  if (cur_cols > 0) {  // last line without newline
    if (cols < 0) cols = cur_cols;
    if (cur_cols != cols) { munmap(buf, len); return 2; }
    ++rows;
  }
  munmap(buf, len);
  if (rows == 0 || cols <= 0) return 3;
  double* data = (double*)malloc(sizeof(double) * (size_t)rows * cols);
  memcpy(data, vals.data(), sizeof(double) * (size_t)rows * cols);
  *out_data = data;
  *out_rows = rows;
  *out_cols = cols;
  return 0;
}

// ----------------------------------------------------------------- MAT5

namespace {

struct Cursor {
  const uint8_t* p;
  size_t n;
  bool ok(size_t k) const { return k <= n; }
  uint32_t u32(size_t off) const { uint32_t v; memcpy(&v, p + off, 4); return v; }
};

// Parse a miMATRIX element body; extract a 2-D double matrix.
// MAT stores column-major; we emit row-major.
int parse_matrix(const uint8_t* body, size_t len, const char* want_name,
                 double** out, int64_t* rows, int64_t* cols,
                 char* found_name) {
  size_t off = 0;
  auto read_tag = [&](uint32_t* type, uint32_t* sz, size_t* data_off,
                      size_t* advance) -> bool {
    if (off + 8 > len) return false;
    uint32_t t;
    memcpy(&t, body + off, 4);
    if (t >> 16) {  // small data element: type in low 16, size in high 16
      *type = t & 0xffff;
      *sz = t >> 16;
      *data_off = off + 4;
      *advance = 8;
    } else {
      memcpy(sz, body + off + 4, 4);
      *type = t;
      *data_off = off + 8;
      *advance = 8 + ((*sz + 7) & ~7u);  // 8-byte aligned
    }
    // reject truncated/malformed elements whose payload runs past body
    if (*data_off + (size_t)*sz > len) return false;
    return true;
  };

  uint32_t type, sz;
  size_t doff, adv;
  // array flags
  if (!read_tag(&type, &sz, &doff, &adv) || sz < 4) return 10;
  uint32_t cls;
  memcpy(&cls, body + doff, 4);
  cls &= 0xff;
  off += adv;
  // dimensions
  if (!read_tag(&type, &sz, &doff, &adv)) return 11;
  if (sz < 8) return 12;
  int32_t d0, d1;
  memcpy(&d0, body + doff, 4);
  memcpy(&d1, body + doff + 4, 4);
  off += adv;
  // name
  if (!read_tag(&type, &sz, &doff, &adv)) return 13;
  size_t name_len = sz < 63 ? sz : 63;
  memcpy(found_name, body + doff, name_len);
  found_name[name_len] = 0;
  off += adv;
  if (want_name && want_name[0] && strcmp(found_name, want_name) != 0)
    return 1;  // not the droid we're looking for (caller may continue)
  if (cls != 6 /*mxDOUBLE_CLASS*/) return 14;
  // real part
  if (!read_tag(&type, &sz, &doff, &adv)) return 15;
  // validate dims BEFORE sizing anything off them: negative/huge d0,d1
  // from a malformed file would overflow count and under-allocate.
  // Each element is >= 4 bytes, so a legitimate count never exceeds len.
  if (d0 <= 0 || d1 <= 0 ||
      (uint64_t)d0 * (uint64_t)d1 > (uint64_t)len) return 12;
  size_t count = (size_t)d0 * (size_t)d1;
  double* data = (double*)malloc(sizeof(double) * count);
  if (type == 9 /*miDOUBLE*/) {
    if ((size_t)sz < count * 8) { free(data); return 16; }
    // column-major -> row-major
    const double* src = (const double*)(body + doff);
    for (int64_t c = 0; c < d1; ++c)
      for (int64_t r = 0; r < d0; ++r) data[r * d1 + c] = src[c * d0 + r];
  } else if (type == 7 /*miSINGLE*/) {
    if ((size_t)sz < count * 4) { free(data); return 16; }
    const float* src = (const float*)(body + doff);
    for (int64_t c = 0; c < d1; ++c)
      for (int64_t r = 0; r < d0; ++r) data[r * d1 + c] = src[c * d0 + r];
  } else {
    free(data);
    return 17;
  }
  *out = data;
  *rows = d0;
  *cols = d1;
  return 0;
}

}  // namespace

// Load the first 2-D double matrix (preferring one named `want_name`)
// from a MATLAB v5 .mat file. Handles miCOMPRESSED elements.
int load_mat_data(const char* path, const char* want_name, double** out,
                  int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long flen = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (flen < 136) { fclose(f); return 2; }
  std::vector<uint8_t> buf((size_t)flen);
  if (fread(buf.data(), 1, (size_t)flen, f) != (size_t)flen) {
    fclose(f);
    return 3;
  }
  fclose(f);
  // 128-byte header; check version/endianness at 124
  size_t off = 128;
  char name[64];
  int fallback_found = 1;
  while (off + 8 <= (size_t)flen) {
    uint32_t type, sz;
    memcpy(&type, buf.data() + off, 4);
    memcpy(&sz, buf.data() + off + 4, 4);
    const uint8_t* body = buf.data() + off + 8;
    // clamp to what is actually in the buffer: a truncated file's tag
    // can claim more bytes than exist
    size_t avail = (size_t)flen - off - 8;
    size_t body_len = (size_t)sz < avail ? (size_t)sz : avail;
    std::vector<uint8_t> inflated;
    if (type == 15 /*miCOMPRESSED*/) {
      uLongf cap = (uLongf)sz * 8 + 1024;
      for (int tries = 0; tries < 6; ++tries) {
        inflated.resize(cap);
        uLongf got = cap;
        int rc = uncompress(inflated.data(), &got, body, body_len);
        if (rc == Z_OK) {
          inflated.resize(got);
          break;
        }
        if (rc == Z_BUF_ERROR) { cap *= 4; continue; }
        inflated.clear();
        break;
      }
      if (inflated.size() < 8) { off += 8 + ((sz + 7) & ~7u); continue; }
      memcpy(&type, inflated.data(), 4);
      uint32_t isz;
      memcpy(&isz, inflated.data() + 4, 4);
      body = inflated.data() + 8;
      body_len = isz;
    }
    if (type == 14 /*miMATRIX*/) {
      int rc = parse_matrix(body, body_len, want_name, out, rows, cols, name);
      if (rc == 0) return 0;
      if (rc == 1) fallback_found = 1;  // wrong name; keep scanning
    }
    off += 8 + ((sz + 7) & ~7u);
  }
  // second pass: accept ANY 2-D double matrix if the name wasn't found
  off = 128;
  while (off + 8 <= (size_t)flen) {
    uint32_t type, sz;
    memcpy(&type, buf.data() + off, 4);
    memcpy(&sz, buf.data() + off + 4, 4);
    const uint8_t* body = buf.data() + off + 8;
    // clamp to what is actually in the buffer: a truncated file's tag
    // can claim more bytes than exist
    size_t avail = (size_t)flen - off - 8;
    size_t body_len = (size_t)sz < avail ? (size_t)sz : avail;
    std::vector<uint8_t> inflated;
    if (type == 15) {
      uLongf cap = (uLongf)sz * 8 + 1024;
      for (int tries = 0; tries < 6; ++tries) {
        inflated.resize(cap);
        uLongf got = cap;
        int rc = uncompress(inflated.data(), &got, body, body_len);
        if (rc == Z_OK) { inflated.resize(got); break; }
        if (rc == Z_BUF_ERROR) { cap *= 4; continue; }
        inflated.clear();
        break;
      }
      if (inflated.size() < 8) { off += 8 + ((sz + 7) & ~7u); continue; }
      memcpy(&type, inflated.data(), 4);
      uint32_t isz;
      memcpy(&isz, inflated.data() + 4, 4);
      body = inflated.data() + 8;
      body_len = isz;
    }
    if (type == 14) {
      int rc = parse_matrix(body, body_len, nullptr, out, rows, cols, name);
      if (rc == 0) return 0;
    }
    off += 8 + ((sz + 7) & ~7u);
  }
  (void)fallback_found;
  return 4;
}

// -------------------------------------------------------- normalization

// Column-wise z-score fit+apply in place (row-major X, n x d).
// means/stds are outputs (d,). Zero-variance columns get std 1.
void zscore_fit_apply(double* X, int64_t n, int64_t d, double* means,
                      double* stds) {
  for (int64_t j = 0; j < d; ++j) {
    double s = 0;
    for (int64_t i = 0; i < n; ++i) s += X[i * d + j];
    double mu = s / (double)n;
    double v = 0;
    for (int64_t i = 0; i < n; ++i) {
      double t = X[i * d + j] - mu;
      v += t * t;
    }
    double sd = n > 1 ? __builtin_sqrt(v / (double)n) : 1.0;
    if (sd < 1e-10) sd = 1.0;
    means[j] = mu;
    stds[j] = sd;
    for (int64_t i = 0; i < n; ++i) X[i * d + j] = (X[i * d + j] - mu) / sd;
  }
}

// ------------------------------------------------------------ k-fold

// Deterministic permutation of [0, n) via Fisher-Yates + splitmix64.
void kfold_perm(int64_t n, uint64_t seed, int64_t* perm) {
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  uint64_t s = seed;
  auto next = [&]() {
    s += 0x9e3779b97f4a7c15ull;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  };
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = (int64_t)(next() % (uint64_t)(i + 1));
    int64_t t = perm[i];
    perm[i] = perm[j];
    perm[j] = t;
  }
}

void rpagp_free(void* p) { free(p); }

}  // extern "C"

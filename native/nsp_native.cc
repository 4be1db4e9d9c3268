// Native data-loader core + scoring kernels for neural_sp_tpu.
//
// The reference outsources its native needs to external C++ deps (kaldiio's
// C parsing, python-Levenshtein, torch DataLoader workers — SURVEY.md §2.11).
// This library is the in-repo equivalent: zero-copy feature file readers
// (npy / Kaldi binary ark), a fused read+pad batch collator (the host-side
// hot loop feeding the TPU), and S/I/D edit distance. Exposed via ctypes
// (no pybind11 dependency).
//
// Build: make -C native   ->  libnsp_native.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------- npy ----
// Minimal .npy reader: v1.0/2.0 headers, C-order, dtype '<f4'.
// Returns 0 on success; fills rows/cols and copies data into out
// (caller-allocated, max_elems floats).
int nsp_read_npy_f32(const char* path, float* out, int64_t max_elems,
                     int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f); return -2;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    uint16_t h16;
    if (fread(&h16, 2, 1, f) != 1) { fclose(f); return -2; }
    hlen = h16;
  } else {
    if (fread(&hlen, 4, 1, f) != 1) { fclose(f); return -2; }
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) { fclose(f); return -2; }
  if (header.find("'<f4'") == std::string::npos ||
      header.find("'fortran_order': False") == std::string::npos) {
    fclose(f); return -3;  // unsupported dtype/layout
  }
  size_t p = header.find("'shape':");
  if (p == std::string::npos) { fclose(f); return -2; }
  p = header.find('(', p);
  int64_t r = 0, c = 1;
  if (sscanf(header.c_str() + p, "(%ld, %ld)", &r, &c) < 1) {
    fclose(f); return -2;
  }
  int64_t n = r * c;
  if (n > max_elems) { fclose(f); return -4; }
  if (fread(out, sizeof(float), n, f) != (size_t)n) { fclose(f); return -2; }
  fclose(f);
  *rows = r; *cols = c;
  return 0;
}

// ----------------------------------------------------------- kaldi ark ----
// Binary float-matrix at path:offset ("\0B" marker, "FM " type).
int nsp_read_kaldi_f32(const char* path, int64_t offset, float* out,
                       int64_t max_elems, int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, (long)offset, SEEK_SET) != 0) { fclose(f); return -2; }
  char marker[2];
  if (fread(marker, 1, 2, f) != 2 || marker[0] != '\0' || marker[1] != 'B') {
    fclose(f); return -2;
  }
  char type[4] = {0};
  if (fread(type, 1, 3, f) != 3 || strncmp(type, "FM ", 3) != 0) {
    fclose(f); return -3;
  }
  unsigned char sz;
  int32_t r = 0, c = 0;
  if (fread(&sz, 1, 1, f) != 1 || sz != 4) { fclose(f); return -2; }
  if (fread(&r, 4, 1, f) != 1) { fclose(f); return -2; }
  if (fread(&sz, 1, 1, f) != 1 || sz != 4) { fclose(f); return -2; }
  if (fread(&c, 4, 1, f) != 1) { fclose(f); return -2; }
  int64_t n = (int64_t)r * c;
  if (n > max_elems) { fclose(f); return -4; }
  if (fread(out, sizeof(float), n, f) != (size_t)n) { fclose(f); return -2; }
  fclose(f);
  *rows = r; *cols = c;
  return 0;
}

// ------------------------------------------------------ fused collate ----
// Read n feature files (npy or ark via offsets[i] >= 0) directly into a
// zero-initialised padded batch [n, t_pad, dim]; writes per-utterance
// lengths. Returns 0, or the first failing utterance index + 1.
int nsp_collate_batch(const char** paths, const int64_t* offsets, int n,
                      float* batch, int64_t t_pad, int64_t dim,
                      int32_t* lens) {
  std::vector<float> buf((size_t)(t_pad * dim));
  for (int i = 0; i < n; ++i) {
    int64_t r = 0, c = 0;
    int rc;
    if (offsets[i] >= 0) {
      rc = nsp_read_kaldi_f32(paths[i], offsets[i], buf.data(),
                              t_pad * dim, &r, &c);
    } else {
      rc = nsp_read_npy_f32(paths[i], buf.data(), t_pad * dim, &r, &c);
    }
    if (rc != 0 || c != dim) return i + 1;
    memcpy(batch + (size_t)i * t_pad * dim, buf.data(),
           sizeof(float) * (size_t)r * dim);
    lens[i] = (int32_t)r;
  }
  return 0;
}

// -------------------------------------------------------- edit distance ----
// Levenshtein with S/I/D backtrace counts; returns total errors.
int nsp_edit_distance(const int32_t* ref, int nr, const int32_t* hyp, int nh,
                      int32_t* n_sub, int32_t* n_ins, int32_t* n_del) {
  std::vector<int32_t> d((size_t)(nr + 1) * (nh + 1));
  auto D = [&](int i, int j) -> int32_t& { return d[(size_t)i * (nh + 1) + j]; };
  for (int i = 0; i <= nr; ++i) D(i, 0) = i;
  for (int j = 0; j <= nh; ++j) D(0, j) = j;
  for (int i = 1; i <= nr; ++i)
    for (int j = 1; j <= nh; ++j) {
      int32_t sub = D(i - 1, j - 1) + (ref[i - 1] != hyp[j - 1]);
      D(i, j) = std::min({sub, D(i - 1, j) + 1, D(i, j - 1) + 1});
    }
  int i = nr, j = nh;
  int32_t s = 0, ins = 0, del = 0;
  while (i > 0 || j > 0) {
    if (i > 0 && j > 0 && D(i, j) == D(i - 1, j - 1) &&
        ref[i - 1] == hyp[j - 1]) { --i; --j; }
    else if (i > 0 && j > 0 && D(i, j) == D(i - 1, j - 1) + 1) {
      ++s; --i; --j;
    } else if (i > 0 && D(i, j) == D(i - 1, j) + 1) { ++del; --i; }
    else { ++ins; --j; }
  }
  *n_sub = s; *n_ins = ins; *n_del = del;
  return s + ins + del;
}

}  // extern "C"

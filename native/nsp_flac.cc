// Native FLAC decoder for corpus stage-0 prep (LibriSpeech ships .flac;
// this image has no sox/ffmpeg/soundfile — the reference leans on Kaldi's
// sox pipeline, examples/librispeech/s5/run.sh stage 0/1).
//
// Implements the full fixed-blocksize FLAC subset those corpora use:
// CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, 4/5-bit Rice
// partitions with escape codes, wasted bits, left/right/mid-side stereo
// decorrelation, UTF-8 frame numbers. CRCs are parsed but not verified
// (archival corpora, local files).
//
// Exposed via ctypes from neural_sp_tpu/utils/native.py.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool fail = false;

  bool eof() const { return byte_pos >= size; }

  uint64_t bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; i++) {
      if (byte_pos >= size) { fail = true; return 0; }
      v = (v << 1) | ((data[byte_pos] >> (7 - bit_pos)) & 1);
      if (++bit_pos == 8) { bit_pos = 0; byte_pos++; }
    }
    return v;
  }

  int64_t sbits(int n) {
    uint64_t v = bits(n);
    if (n == 0) return 0;
    if (v & (1ull << (n - 1))) return (int64_t)(v | (~0ull << n));
    return (int64_t)v;
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (!fail && bits(1) == 0) {
      q++;
      if (q > 1u << 24) { fail = true; break; }  // corrupt stream guard
    }
    return q;
  }

  void align() { if (bit_pos) { bit_pos = 0; byte_pos++; } }
};

// UTF-8-style coded number in frame headers (up to 56 bits)
uint64_t read_utf8(BitReader& br) {
  uint64_t b0 = br.bits(8);
  if (!(b0 & 0x80)) return b0;
  int n = 0;
  for (uint64_t m = 0x40; b0 & m; m >>= 1) n++;
  uint64_t v = b0 & (0x7F >> n);
  for (int i = 0; i < n; i++) v = (v << 6) | (br.bits(8) & 0x3F);
  return v;
}

bool decode_residual(BitReader& br, int order, int blocksize,
                     int64_t* out /* blocksize entries, warmup filled */) {
  int method = (int)br.bits(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t esc = method == 0 ? 0xF : 0x1F;
  int po = (int)br.bits(4);
  int nparts = 1 << po;
  int idx = order;
  for (int p = 0; p < nparts; p++) {
    int n = blocksize >> po;
    if (p == 0) n -= order;
    if (n < 0) return false;
    uint32_t param = (uint32_t)br.bits(pbits);
    if (param == esc) {
      int raw = (int)br.bits(5);
      for (int i = 0; i < n; i++) out[idx++] = raw ? br.sbits(raw) : 0;
    } else {
      for (int i = 0; i < n; i++) {
        uint32_t q = br.unary();
        uint64_t low = param ? br.bits((int)param) : 0;
        uint64_t u = ((uint64_t)q << param) | low;
        out[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    if (br.fail) return false;
  }
  return idx == blocksize;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& s) {
  s.assign(blocksize, 0);
  if (br.bits(1) != 0) return false;      // padding bit
  int type = (int)br.bits(6);
  int wasted = 0;
  if (br.bits(1)) wasted = (int)br.unary() + 1;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  if (type == 0) {                         // CONSTANT
    int64_t v = br.sbits(bps);
    for (int i = 0; i < blocksize; i++) s[i] = v;
  } else if (type == 1) {                  // VERBATIM
    for (int i = 0; i < blocksize; i++) s[i] = br.sbits(bps);
  } else if (type >= 8 && type <= 12) {    // FIXED order 0-4
    int order = type - 8;
    for (int i = 0; i < order; i++) s[i] = br.sbits(bps);
    if (!decode_residual(br, order, blocksize, s.data())) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = s[i - 1]; break;
        case 2: p = 2 * s[i - 1] - s[i - 2]; break;
        case 3: p = 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3]; break;
        case 4: p = 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3]
                    - s[i - 4]; break;
      }
      s[i] += p;  // residual already in s[i]
    }
  } else if (type >= 32) {                 // LPC order 1-32
    int order = type - 31;
    for (int i = 0; i < order; i++) s[i] = br.sbits(bps);
    int prec = (int)br.bits(4);
    if (prec == 15) return false;
    prec += 1;
    int shift = (int)br.sbits(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; i++) coef[i] = br.sbits(prec);
    if (!decode_residual(br, order, blocksize, s.data())) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += coef[j] * s[i - 1 - j];
      s[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < blocksize; i++) s[i] <<= wasted;
  return !br.fail;
}

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
  size_t frames_offset = 0;  // byte offset of first frame
};

bool parse_header(const uint8_t* data, size_t size, StreamInfo* si) {
  if (size < 42 || memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  bool last = false;
  while (!last) {
    if (pos + 4 > size) return false;
    last = data[pos] & 0x80;
    int type = data[pos] & 0x7F;
    uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8)
                   | data[pos + 3];
    pos += 4;
    if (type == 0) {  // STREAMINFO
      if (len < 34 || pos + 34 > size) return false;
      const uint8_t* p = data + pos;
      si->sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      si->channels = ((p[12] >> 1) & 0x7) + 1;
      si->bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si->total_samples = ((uint64_t)(p[13] & 0xF) << 32)
          | ((uint64_t)p[14] << 24) | (p[15] << 16) | (p[16] << 8) | p[17];
    }
    pos += len;
    if (pos > size) return false;
  }
  si->frames_offset = pos;
  return si->sample_rate > 0 && si->channels > 0;
}

}  // namespace

extern "C" {

// Probe STREAMINFO. Returns 0 on success.
int nsp_flac_info(const char* path, int64_t* total_samples,
                  int32_t* sample_rate, int32_t* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz > 65536 ? 65536 : sz);
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f); return -2;
  }
  fclose(f);
  StreamInfo si;
  if (!parse_header(buf.data(), buf.size(), &si)) return -3;
  *total_samples = (int64_t)si.total_samples;
  *sample_rate = (int32_t)si.sample_rate;
  *channels = si.channels;
  return 0;
}

// Decode the whole file to interleaved int16 (samples above 16 bps are
// right-shifted to 16). Returns 0 on success; n_samples = per-channel
// count actually decoded.
int nsp_flac_decode(const char* path, int16_t* out, int64_t max_samples,
                    int64_t* n_samples, int32_t* sample_rate,
                    int32_t* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(sz);
  if (sz <= 0 || fread(buf.data(), 1, sz, f) != (size_t)sz) {
    fclose(f); return -2;
  }
  fclose(f);

  StreamInfo si;
  if (!parse_header(buf.data(), buf.size(), &si)) return -3;
  *sample_rate = (int32_t)si.sample_rate;
  *channels = si.channels;
  int shift_out = si.bps > 16 ? si.bps - 16 : 0;

  BitReader br{buf.data(), buf.size()};
  br.byte_pos = si.frames_offset;

  int64_t written = 0;  // per-channel samples
  std::vector<std::vector<int64_t>> ch(si.channels);
  while (br.byte_pos < br.size && !br.fail) {
    // frame header
    uint64_t sync = br.bits(14);
    if (br.fail) break;                      // clean EOF
    if (sync != 0x3FFE) return -4;
    br.bits(1);                              // reserved
    br.bits(1);                              // blocking strategy
    uint32_t bs_code = (uint32_t)br.bits(4);
    uint32_t sr_code = (uint32_t)br.bits(4);
    uint32_t ch_code = (uint32_t)br.bits(4);
    uint32_t ss_code = (uint32_t)br.bits(3);
    br.bits(1);                              // reserved
    read_utf8(br);                           // frame/sample number
    int blocksize;
    switch (bs_code) {
      case 1: blocksize = 192; break;
      case 2: case 3: case 4: case 5:
        blocksize = 576 << (bs_code - 2); break;
      case 6: blocksize = (int)br.bits(8) + 1; break;
      case 7: blocksize = (int)br.bits(16) + 1; break;
      default:
        if (bs_code >= 8) blocksize = 256 << (bs_code - 8);
        else return -5;
    }
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    int bps;
    switch (ss_code) {
      case 0: bps = si.bps; break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -6;
    }
    br.bits(8);                              // CRC-8 (unverified)

    int nch = si.channels;
    int mode = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
    if (ch_code <= 7) {
      nch = (int)ch_code + 1;
    } else if (ch_code == 8) { nch = 2; mode = 1; }
    else if (ch_code == 9) { nch = 2; mode = 2; }
    else if (ch_code == 10) { nch = 2; mode = 3; }
    else return -7;
    if (nch != si.channels) return -7;

    for (int c = 0; c < nch; c++) {
      int sub_bps = bps;
      if ((mode == 1 && c == 1) || (mode == 2 && c == 0) ||
          (mode == 3 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, blocksize, sub_bps, ch[c])) return -8;
    }
    br.align();
    br.bits(16);                             // frame CRC-16 (unverified)

    // stereo decorrelation
    if (mode == 1) {         // left/side: R = L - S
      for (int i = 0; i < blocksize; i++) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (mode == 2) {  // right/side: L = S + R
      for (int i = 0; i < blocksize; i++) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (mode == 3) {  // mid/side
      for (int i = 0; i < blocksize; i++) {
        int64_t mid = ch[0][i], side = ch[1][i];
        mid = (mid << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    for (int i = 0; i < blocksize; i++) {
      if (written >= max_samples) { *n_samples = written; return -9; }
      for (int c = 0; c < nch; c++)
        out[written * nch + c] = (int16_t)(ch[c][i] >> shift_out);
      written++;
    }
  }
  *n_samples = written;
  return 0;
}

}  // extern "C"

// Native batch feature loader: fused file-read -> npy/npz decode -> padded
// batch write, multithreaded and GIL-free (called through ctypes, which
// releases the GIL for the duration of the call).
//
// TPU-native counterpart of the torch multi-worker DataLoader the reference
// relies on for feature IO (/root/reference/captioning/data/dataloader.py:
// 304-368 runs HybridLoader.get + collate inside torch's C++ worker pool).
// Here the per-image hot path — open the .npy/.npz, parse the header,
// inflate if deflated, and scatter rows into the padded [B, pad, D] batch
// slot — runs entirely in C++, so a single producer thread saturates the
// page cache without serializing on the Python interpreter lock.
//
// Two-phase protocol (both phases parallel over files):
//   dataio_scan(paths, n, feat_dim, out_rows, ...)   header-only row counts
//   dataio_load(paths, n, feat_dim, pad, out, rows, ...)  full decode into
//                                   slots, verified against the scan rows
// The Python side sizes the bucketed batch buffer between the phases
// (captioning_tpu/data/native_io.py).
//
// Supported payloads: .npy (raw little-endian f4/f8/f2, C order) and .npz
// (zip stored or deflate, member 'feat.npy' preferred, then 'z.npy' —
// mirroring HybridLoader's key fallback, hybrid_loader.py:24-27).

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <functional>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Err {
  char msg[512];
  std::atomic<int> set{0};
  void record(const std::string& s) {
    int expected = 0;
    if (set.compare_exchange_strong(expected, 1)) {
      std::snprintf(msg, sizeof(msg), "%s", s.c_str());
    }
  }
};

bool read_file(const char* path, std::vector<uint8_t>& out, std::string* err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    *err = std::string("open failed: ") + path;
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 0) {
    std::fclose(f);
    *err = std::string("ftell failed: ") + path;
    return false;
  }
  out.resize((size_t)n);
  size_t got = n ? std::fread(out.data(), 1, (size_t)n, f) : 0;
  std::fclose(f);
  if (got != (size_t)n) {
    *err = std::string("short read: ") + path;
    return false;
  }
  return true;
}

uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}

// Locate a member's payload in a zip buffer via the end-of-central-directory
// record (robust to data descriptors / zip64-free numpy output). Accepts
// 'feat.npy', then 'z.npy' — any other npz errors, exactly like the Python
// path's KeyError (hybrid_loader.py:_load_npz), which routes the batch to
// the Python fallback so the failure surfaces identically.
bool zip_find_member(const std::vector<uint8_t>& zip, const uint8_t** data,
                     size_t* comp_size, size_t* raw_size, int* method,
                     std::string* err) {
  if (zip.size() < 22) {
    *err = "zip too small";
    return false;
  }
  // scan backwards for EOCD signature PK\x05\x06 (comment <= 64KB)
  size_t lo = zip.size() >= (1 << 16) + 22 ? zip.size() - ((1 << 16) + 22) : 0;
  size_t eocd = (size_t)-1;
  for (size_t i = zip.size() - 22 + 1; i-- > lo;) {
    if (zip[i] == 0x50 && zip[i + 1] == 0x4b && zip[i + 2] == 0x05 &&
        zip[i + 3] == 0x06) {
      eocd = i;
      break;
    }
  }
  if (eocd == (size_t)-1) {
    *err = "zip EOCD not found";
    return false;
  }
  uint16_t nent = rd16(&zip[eocd + 10]);
  uint32_t cdofs = rd32(&zip[eocd + 16]);
  size_t best_ofs = (size_t)-1, best_comp = 0, best_raw = 0;
  int best_method = 0, best_rank = 99;
  size_t p = cdofs;
  for (uint16_t e = 0; e < nent; e++) {
    if (p + 46 > zip.size() || rd32(&zip[p]) != 0x02014b50) {
      *err = "zip central directory corrupt";
      return false;
    }
    int method_ = rd16(&zip[p + 10]);
    uint32_t comp = rd32(&zip[p + 20]);
    uint32_t raw = rd32(&zip[p + 24]);
    uint16_t nlen = rd16(&zip[p + 28]);
    uint16_t xlen = rd16(&zip[p + 30]);
    uint16_t clen = rd16(&zip[p + 32]);
    uint32_t lofs = rd32(&zip[p + 42]);
    std::string name((const char*)&zip[p + 46], nlen);
    int rank = name == "feat.npy" ? 0 : (name == "z.npy" ? 1 : 99);
    if (rank < best_rank) {
      best_rank = rank;
      best_ofs = lofs;
      best_comp = comp;
      best_raw = raw;
      best_method = method_;
    }
    p += 46 + nlen + xlen + clen;
  }
  if (best_ofs == (size_t)-1) {
    *err = "npz has neither 'feat.npy' nor 'z.npy' member";
    return false;
  }
  // local header: 30 bytes + name + extra (lengths may differ from central)
  size_t lh = best_ofs;
  if (lh + 30 > zip.size() || rd32(&zip[lh]) != 0x04034b50) {
    *err = "zip local header corrupt";
    return false;
  }
  uint16_t lnlen = rd16(&zip[lh + 26]);
  uint16_t lxlen = rd16(&zip[lh + 28]);
  size_t payload = lh + 30 + lnlen + lxlen;
  if (payload + best_comp > zip.size()) {
    *err = "zip payload out of range";
    return false;
  }
  *data = &zip[payload];
  *comp_size = best_comp;
  *raw_size = best_raw;
  *method = best_method;
  return true;
}

bool inflate_raw(const uint8_t* src, size_t src_len, uint8_t* dst,
                 size_t dst_len, std::string* err) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) {
    *err = "inflateInit2 failed";
    return false;
  }
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = (uInt)src_len;
  zs.next_out = dst;
  zs.avail_out = (uInt)dst_len;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (rc != Z_STREAM_END || zs.total_out != dst_len) {
    *err = "inflate failed";
    return false;
  }
  return true;
}

struct NpyInfo {
  int word = 4;        // bytes per element: 2 (f2), 4 (f4), 8 (f8)
  size_t elems = 0;    // total element count
  int64_t last_dim = 0;
  size_t data_ofs = 0; // payload offset of the raw array data
};

// Parse the npy preamble from `buf` (at least the header; full file for load).
bool npy_parse(const uint8_t* buf, size_t len, NpyInfo* info,
               std::string* err) {
  static const uint8_t magic[6] = {0x93, 'N', 'U', 'M', 'P', 'Y'};
  if (len < 10 || std::memcmp(buf, magic, 6) != 0) {
    *err = "not an npy file";
    return false;
  }
  int major = buf[6];
  size_t hlen, hofs;
  if (major == 1) {
    hlen = rd16(&buf[8]);
    hofs = 10;
  } else {
    if (len < 12) {
      *err = "npy header truncated";
      return false;
    }
    hlen = rd32(&buf[8]);
    hofs = 12;
  }
  if (hofs + hlen > len) {
    *err = "npy header truncated";
    return false;
  }
  std::string hdr((const char*)buf + hofs, hlen);
  if (hdr.find("'fortran_order': False") == std::string::npos) {
    *err = "npy fortran_order unsupported";
    return false;
  }
  size_t dp = hdr.find("'descr':");
  if (dp == std::string::npos) {
    *err = "npy descr missing";
    return false;
  }
  size_t q1 = hdr.find('\'', dp + 8);
  size_t q2 = q1 == std::string::npos ? q1 : hdr.find('\'', q1 + 1);
  if (q2 == std::string::npos) {
    *err = "npy descr unparsable";
    return false;
  }
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4")
    info->word = 4;
  else if (descr == "<f8")
    info->word = 8;
  else if (descr == "<f2")
    info->word = 2;
  else {
    *err = "npy dtype unsupported: " + descr;
    return false;
  }
  size_t sp = hdr.find("'shape':");
  size_t po = sp == std::string::npos ? sp : hdr.find('(', sp);
  size_t pc = po == std::string::npos ? po : hdr.find(')', po);
  if (pc == std::string::npos) {
    *err = "npy shape unparsable";
    return false;
  }
  std::string shape = hdr.substr(po + 1, pc - po - 1);
  info->elems = 1;
  info->last_dim = 0;
  size_t pos = 0;
  int ndims = 0;
  while (pos < shape.size()) {
    while (pos < shape.size() && (shape[pos] == ' ' || shape[pos] == ','))
      pos++;
    if (pos >= shape.size()) break;
    char* end = nullptr;
    long v = std::strtol(shape.c_str() + pos, &end, 10);
    if (end == shape.c_str() + pos) break;
    pos = end - shape.c_str();
    info->elems *= (size_t)v;
    info->last_dim = v;
    ndims++;
  }
  if (ndims == 0) {  // scalar: treat as 1 element, last_dim 1
    info->elems = 1;
    info->last_dim = 1;
  }
  info->data_ofs = hofs + hlen;
  return true;
}

bool has_suffix(const char* s, const char* suf) {
  size_t n = std::strlen(s), m = std::strlen(suf);
  return n >= m && std::memcmp(s + n - m, suf, m) == 0;
}

// Decode one feature file. header_only: stop after the npy preamble (for
// npz-deflate this inflates just enough bytes to cover it).
// On success fills `info` and, when !header_only, `raw` with the full
// little-endian payload (raw.data() + info.data_ofs points at the numbers).
bool decode_file(const char* path, bool header_only, NpyInfo* info,
                 std::vector<uint8_t>& raw, std::string* err) {
  std::vector<uint8_t> file;
  if (!read_file(path, file, err)) return false;
  if (has_suffix(path, ".npy")) {
    raw.swap(file);
    return npy_parse(raw.data(), raw.size(), info, err);
  }
  const uint8_t* payload;
  size_t comp, rawsz;
  int method;
  if (!zip_find_member(file, &payload, &comp, &rawsz, &method, err)) {
    *err += std::string(" (") + path + ")";
    return false;
  }
  if (method == 0) {  // stored
    if (comp != rawsz) {
      *err = std::string("zip stored size mismatch: ") + path;
      return false;
    }
    raw.assign(payload, payload + rawsz);
    return npy_parse(raw.data(), raw.size(), info, err);
  }
  if (method != 8) {
    *err = std::string("zip compression method unsupported: ") + path;
    return false;
  }
  if (header_only) {
    // inflate just the first KB — enough for any sane npy preamble
    size_t want = rawsz < 1024 ? rawsz : 1024;
    raw.resize(want);
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) {
      *err = "inflateInit2 failed";
      return false;
    }
    zs.next_in = const_cast<Bytef*>(payload);
    zs.avail_in = (uInt)comp;
    zs.next_out = raw.data();
    zs.avail_out = (uInt)want;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END && rc != Z_OK && rc != Z_BUF_ERROR) {
      *err = std::string("inflate failed: ") + path;
      return false;
    }
    return npy_parse(raw.data(), want - zs.avail_out, info, err);
  }
  raw.resize(rawsz);
  if (!inflate_raw(payload, comp, raw.data(), rawsz, err)) {
    *err += std::string(" (") + path + ")";
    return false;
  }
  return npy_parse(raw.data(), raw.size(), info, err);
}

// Convert `elems` elements at src (f2/f4/f8 little-endian) to f4 at dst.
void to_f32(const uint8_t* src, int word, size_t elems, float* dst) {
  if (word == 4) {
    std::memcpy(dst, src, elems * 4);
    return;
  }
  if (word == 8) {
    const double* s = (const double*)src;
    for (size_t i = 0; i < elems; i++) dst[i] = (float)s[i];
    return;
  }
  // f2: IEEE binary16 -> binary32
  const uint16_t* s = (const uint16_t*)src;
  for (size_t i = 0; i < elems; i++) {
    uint16_t h = s[i];
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1f;
    uint32_t man = h & 0x3ff;
    uint32_t out;
    if (exp == 0) {
      if (man == 0) {
        out = sign;
      } else {  // subnormal
        int e = -1;
        do {
          e++;
          man <<= 1;
        } while (!(man & 0x400));
        out = sign | ((uint32_t)(127 - 15 - e) << 23) | ((man & 0x3ff) << 13);
      }
    } else if (exp == 0x1f) {
      out = sign | 0x7f800000 | (man << 13);
    } else {
      out = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    std::memcpy(&dst[i], &out, 4);
  }
}

void run_pool(int nthreads, int n, const std::function<void(int)>& body) {
  if (nthreads <= 1 || n <= 1) {
    for (int i = 0; i < n; i++) body(i);
    return;
  }
  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      body(i);
    }
  };
  int nt = nthreads < n ? nthreads : n;
  std::vector<std::thread> pool;
  pool.reserve(nt - 1);
  for (int t = 0; t < nt - 1; t++) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Phase 1: header scan. out_rows[i] = row count of att_paths[i] when its
// trailing dim == feat_dim (reshape(-1, D) semantics, dataset.py:163).
// Returns 0 on success; nonzero + message in err otherwise.
//
// A single-read variant (scan keeps the file bytes in a context, load
// decodes from the cache) was measured SLOWER on a warm page cache
// (3.4-3.7k vs 3.8-4.0k img/s, tools/bench_data.py): holding a batch of
// ~300 KB buffers across the phase boundary costs more in allocator and
// cache churn than re-reading cached pages. The two-phase re-read stays;
// load() instead verifies its row counts against the scan's.
int dataio_scan(const char** att_paths, int n, long long feat_dim,
                long long* out_rows, int nthreads, char* err, int errlen) {
  Err e;
  run_pool(nthreads, n, [&](int i) {
    if (e.set.load()) return;
    NpyInfo info;
    std::vector<uint8_t> raw;
    std::string msg;
    if (!decode_file(att_paths[i], true, &info, raw, &msg)) {
      e.record(msg);
      return;
    }
    // rows follow reshape(-1, shape[-1]) semantics (dataset.py:163): the
    // file's trailing dim must BE the feature dim, else the Python path
    // would produce a different row split — bail to the fallback.
    if (info.last_dim != feat_dim || info.elems % (size_t)feat_dim != 0) {
      e.record(std::string("trailing dim != feat_dim: ") + att_paths[i]);
      return;
    }
    out_rows[i] = (long long)(info.elems / (size_t)feat_dim);
  });
  if (e.set.load()) {
    std::snprintf(err, errlen, "%s", e.msg);
    return 1;
  }
  return 0;
}

// Phase 2: decode att_paths[i] into out_att + i*pad_len*feat_dim (the pad
// tail is left untouched — the caller hands in a zeroed buffer).
// expected_rows (nullable): the scan-phase row counts; a file whose row
// count CHANGED between the phases (rewritten dataset) is a hard error, not
// a silent att_masks/att_feats mismatch. fc_paths[i] (may be null/missing
// -> out_fc_ok[i]=0, caller applies the att-mean fallback,
// dataset.py:178-183) decodes into out_fc + i*fc_dim.
int dataio_load(const char** att_paths, int n, long long feat_dim,
                long long pad_len, float* out_att,
                const long long* expected_rows, const char** fc_paths,
                long long fc_dim, float* out_fc, int* out_fc_ok, int nthreads,
                char* err, int errlen) {
  Err e;
  run_pool(nthreads, n, [&](int i) {
    if (e.set.load()) return;
    NpyInfo info;
    std::vector<uint8_t> raw;
    std::string msg;
    if (!decode_file(att_paths[i], false, &info, raw, &msg)) {
      e.record(msg);
      return;
    }
    size_t rows = info.elems / (size_t)feat_dim;
    bool rows_ok = expected_rows ? rows == (size_t)expected_rows[i]
                                 : rows <= (size_t)pad_len;
    if (info.last_dim != feat_dim || info.elems % (size_t)feat_dim != 0 ||
        !rows_ok || rows > (size_t)pad_len) {
      e.record(std::string("attention shape changed between scan and load: ") +
               att_paths[i]);
      return;
    }
    to_f32(raw.data() + info.data_ofs, info.word, info.elems,
           out_att + (size_t)i * pad_len * feat_dim);
    if (!fc_paths) return;
    if (out_fc_ok) out_fc_ok[i] = 0;
    if (!fc_paths[i] || !fc_paths[i][0]) return;
    // fc semantics (dataset.py:178-183): a MISSING file falls back to the
    // att mean (ok=0, caller-side); a PRESENT file that fails to decode or
    // has the wrong size is a hard error — the Python path would have used
    // or choked on it, so fall all the way back rather than silently
    // substituting the mean.
    FILE* probe = std::fopen(fc_paths[i], "rb");
    if (!probe) {
      // att-mean fallback. The Python path means in the FILE's dtype before
      // the f32 cast (get_item :199-204 + collate); for f8/f2 att that
      // rounds differently than meaning the f32-converted buffer, so only
      // f4 keeps the byte-identity contract — anything else routes the
      // batch to the Python path.
      if (info.word != 4) {
        e.record("fc att-mean fallback needs f4 att features for "
                 "python-path parity");
      }
      return;
    }
    std::fclose(probe);
    NpyInfo finfo;
    std::vector<uint8_t> fraw;
    std::string fmsg;
    if (!decode_file(fc_paths[i], false, &finfo, fraw, &fmsg)) {
      e.record(fmsg);
      return;
    }
    if (finfo.elems != (size_t)fc_dim) {
      e.record(std::string("fc size mismatch: ") + fc_paths[i]);
      return;
    }
    to_f32(fraw.data() + finfo.data_ofs, finfo.word, finfo.elems,
           out_fc + (size_t)i * fc_dim);
    if (out_fc_ok) out_fc_ok[i] = 1;
  });
  if (e.set.load()) {
    std::snprintf(err, errlen, "%s", e.msg);
    return 1;
  }
  return 0;
}

}  // extern "C"

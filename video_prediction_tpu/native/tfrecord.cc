// Native TFRecord reader + tf.train.Example parser (C, ctypes-friendly).
//
// TPU-native replacement for the role tf.data's C++ core plays in the
// reference pipeline (reference datasets/base_dataset.py sits on
// tf.data.TFRecordDataset + tf.io.parse_single_example): record framing with
// masked-CRC32C verification, plus a minimal protobuf walker specialized to
// tf.train.Example (Features -> map<string, Feature> ->
// BytesList/FloatList/Int64List). No TensorFlow, no protobuf library — the
// wire format is stable and small enough to parse directly.
//
// TFRecord framing (each record):
//   uint64 length (LE) | uint32 masked_crc32c(length) | data[length] |
//   uint32 masked_crc32c(data)
//
// Build: g++ -O3 -shared -fPIC -o libtfrecord.so tfrecord.cc
// (see video_prediction_tpu/native/__init__.py, which builds on first use)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

#if defined(__x86_64__)  // _mm_crc32_u64 is only declared on 64-bit x86
#include <immintrin.h>
#define TFR_X86 1
#endif

// ---------------------------------------------------------------------- //
// CRC32C (Castagnoli), masked per the TFRecord spec. Hardware SSE4.2
// crc32 instruction when the CPU has it (~1 byte/cycle table-driven vs
// ~8 bytes/cycle hw — CRC over every record byte otherwise dominates the
// whole read path, measured 78% of read time on BAIR-sized records),
// table-driven fallback elsewhere. Runtime-dispatched so the .so stays
// portable (built without -msse4.2; the hw path carries a target attr).
// ---------------------------------------------------------------------- //

static uint32_t crc32c_table[256];
static bool crc32c_init_done = false;

static void crc32c_init() {
  if (crc32c_init_done) return;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    crc32c_table[i] = c;
  }
  crc32c_init_done = true;
}

static uint32_t crc32c_sw(const uint8_t* data, size_t n) {
  crc32c_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i)
    c = crc32c_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

#ifdef TFR_X86
__attribute__((target("sse4.2"))) static uint32_t crc32c_hw(
    const uint8_t* data, size_t n) {
  uint64_t c = 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t v;
    std::memcpy(&v, data, 8);
    c = _mm_crc32_u64(c, v);
    data += 8;
    n -= 8;
  }
  uint32_t c32 = (uint32_t)c;
  while (n--) c32 = _mm_crc32_u8(c32, *data++);
  return c32 ^ 0xFFFFFFFFu;
}
#endif

static uint32_t crc32c(const uint8_t* data, size_t n) {
#ifdef TFR_X86
  static const bool has_hw = __builtin_cpu_supports("sse4.2");
  if (has_hw) return crc32c_hw(data, n);
#endif
  return crc32c_sw(data, n);
}

static uint32_t masked_crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// ---------------------------------------------------------------------- //
// Record reader
// ---------------------------------------------------------------------- //

struct TfrReader {
  FILE* f = nullptr;
  std::vector<uint8_t> buf;
  bool verify = true;
  std::string error;
  // chunked-read state (tfr_next_chunk)
  std::vector<uint8_t> chunk;
  std::vector<uint64_t> chunk_lens;
};

extern "C" {

TfrReader* tfr_open(const char* path, int verify_crc) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  TfrReader* r = new TfrReader();
  r->f = f;
  r->verify = verify_crc != 0;
  return r;
}

// Returns 1 on success (sets *data/*len; valid until the next call),
// 0 on clean EOF, -1 on framing/CRC error (tfr_error() has the message).
int tfr_next(TfrReader* r, const uint8_t** data, uint64_t* len) {
  uint8_t header[12];
  size_t got = std::fread(header, 1, 12, r->f);
  if (got == 0 && std::feof(r->f)) return 0;
  if (got != 12) {
    r->error = "truncated record header";
    return -1;
  }
  uint64_t length;
  uint32_t length_crc;
  std::memcpy(&length, header, 8);
  std::memcpy(&length_crc, header + 8, 4);
  if (r->verify && masked_crc32c(header, 8) != length_crc) {
    r->error = "length CRC mismatch";
    return -1;
  }
  if (length > (1ull << 33)) {  // 8 GiB sanity bound
    r->error = "record length implausible (corrupt framing?)";
    return -1;
  }
  // catch bad_alloc: a corrupt length under the sanity bound (reachable
  // with verify_crc=0) can demand gigabytes; a C++ exception cannot
  // unwind through the ctypes/libffi frames (std::terminate), so it must
  // become an ordinary -1 error here
  try {
    r->buf.resize(length + 4);
  } catch (const std::bad_alloc&) {
    r->error = "record allocation failed (corrupt length?)";
    return -1;
  }
  if (std::fread(r->buf.data(), 1, length + 4, r->f) != length + 4) {
    r->error = "truncated record body";
    return -1;
  }
  if (r->verify) {
    uint32_t data_crc;
    std::memcpy(&data_crc, r->buf.data() + length, 4);
    if (masked_crc32c(r->buf.data(), length) != data_crc) {
      r->error = "data CRC mismatch";
      return -1;
    }
  }
  *data = r->buf.data();
  *len = length;
  return 1;
}

// Batched framing: read up to max_records records (stopping early once the
// packed payload reaches max_bytes) into one internal buffer, so the Python
// side pays ONE ctypes round-trip per chunk instead of per record. On a
// framing/CRC error the whole chunk is dropped and -1 returned (training
// streams treat a corrupt file as fatal; per-record partial-yield semantics
// live in tfr_next for callers that need them).
// Returns 1 with *count > 0, 0 at clean EOF (*count == 0), -1 on error.
int tfr_next_chunk(TfrReader* r, uint64_t max_records, uint64_t max_bytes,
                   const uint8_t** data, const uint64_t** lens,
                   uint64_t* count) {
  r->chunk.clear();
  r->chunk_lens.clear();
  while (r->chunk_lens.size() < max_records) {
    uint8_t header[12];
    size_t got = std::fread(header, 1, 12, r->f);
    if (got == 0 && std::feof(r->f)) break;
    if (got != 12) {
      r->error = "truncated record header";
      return -1;
    }
    uint64_t length;
    uint32_t length_crc;
    std::memcpy(&length, header, 8);
    std::memcpy(&length_crc, header + 8, 4);
    if (r->verify && masked_crc32c(header, 8) != length_crc) {
      r->error = "length CRC mismatch";
      return -1;
    }
    if (length > (1ull << 33)) {
      r->error = "record length implausible (corrupt framing?)";
      return -1;
    }
    size_t off = r->chunk.size();
    try {  // same bad_alloc-through-ctypes hazard as tfr_next
      r->chunk.resize(off + length);
    } catch (const std::bad_alloc&) {
      r->error = "record allocation failed (corrupt length?)";
      return -1;
    }
    uint8_t crc_buf[4];
    if (std::fread(r->chunk.data() + off, 1, length, r->f) != length ||
        std::fread(crc_buf, 1, 4, r->f) != 4) {
      r->error = "truncated record body";
      return -1;
    }
    if (r->verify) {
      uint32_t data_crc;
      std::memcpy(&data_crc, crc_buf, 4);
      if (masked_crc32c(r->chunk.data() + off, length) != data_crc) {
        r->error = "data CRC mismatch";
        return -1;
      }
    }
    r->chunk_lens.push_back(length);
    if (r->chunk.size() >= max_bytes) break;
  }
  *data = r->chunk.data();
  *lens = r->chunk_lens.data();
  *count = r->chunk_lens.size();
  return *count > 0 ? 1 : 0;
}

const char* tfr_error(TfrReader* r) { return r->error.c_str(); }

void tfr_close(TfrReader* r) {
  if (!r) return;
  if (r->f) std::fclose(r->f);
  delete r;
}

}  // extern "C"

// ---------------------------------------------------------------------- //
// Minimal protobuf walker for tf.train.Example
//
//   Example        { Features features = 1; }
//   Features       { map<string, Feature> feature = 1; }
//   (map entry)    { string key = 1; Feature value = 2; }
//   Feature        { oneof: BytesList=1 | FloatList=2 | Int64List=3 }
//   BytesList      { repeated bytes value = 1; }
//   FloatList      { repeated float value = 1 [packed]; }
//   Int64List      { repeated int64 value = 1 [packed]; }
// ---------------------------------------------------------------------- //

namespace {

struct Slice {
  const uint8_t* p;
  size_t n;
};

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end && shift < 64) {
      uint8_t b = *p++;
      v |= uint64_t(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
    ok = false;
    return 0;
  }

  Slice bytes() {  // length-delimited payload
    uint64_t n = varint();
    // compare against the REMAINING size, never `p + n > end`: n is an
    // unvalidated wire value and `p + n` can overflow the pointer, which
    // would bypass the bound check on a crafted/corrupt record
    if (!ok || n > (uint64_t)(end - p)) {
      ok = false;
      return {nullptr, 0};
    }
    Slice s{p, (size_t)n};
    p += n;
    return s;
  }

  void skip(uint32_t wire) {
    switch (wire) {
      case 0: varint(); break;
      case 1:
        if ((uint64_t)(end - p) < 8) { ok = false; } else { p += 8; }
        break;
      case 2: bytes(); break;
      case 5:
        if ((uint64_t)(end - p) < 4) { ok = false; } else { p += 4; }
        break;
      default: ok = false;
    }
  }
};

}  // namespace

struct FeatureEntry {
  std::string key;
  int type = -1;  // 0 bytes, 1 float, 2 int64
  std::vector<Slice> bytes_vals;   // views into the parse buffer
  std::vector<float> float_vals;
  std::vector<int64_t> int64_vals;
};

struct ExampleParser {
  std::vector<uint8_t> owned;  // copy of the record so Slices stay valid
  std::vector<FeatureEntry> entries;
  std::string error;
  std::vector<int64_t> plan;  // gather: entry index per requested key (-1 missing)
};

static void parse_bytes_list(Cursor c, FeatureEntry* e) {
  e->type = 0;
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    if (!c.ok) break;
    if ((tag >> 3) == 1 && (tag & 7) == 2)
      e->bytes_vals.push_back(c.bytes());
    else
      c.skip(tag & 7);
  }
}

static void parse_float_list(Cursor c, FeatureEntry* e) {
  e->type = 1;
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    if (!c.ok) break;
    if ((tag >> 3) == 1 && (tag & 7) == 2) {  // packed
      Slice s = c.bytes();
      for (size_t i = 0; i + 4 <= s.n; i += 4) {
        float f;
        std::memcpy(&f, s.p + i, 4);
        e->float_vals.push_back(f);
      }
    } else if ((tag >> 3) == 1 && (tag & 7) == 5) {  // unpacked
      if (c.p + 4 > c.end) break;
      float f;
      std::memcpy(&f, c.p, 4);
      c.p += 4;
      e->float_vals.push_back(f);
    } else {
      c.skip(tag & 7);
    }
  }
}

static void parse_int64_list(Cursor c, FeatureEntry* e) {
  e->type = 2;
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    if (!c.ok) break;
    if ((tag >> 3) == 1 && (tag & 7) == 2) {  // packed
      Cursor inner{nullptr, nullptr};
      Slice s = c.bytes();
      inner.p = s.p;
      inner.end = s.p + s.n;
      while (inner.ok && inner.p < inner.end)
        e->int64_vals.push_back((int64_t)inner.varint());
    } else if ((tag >> 3) == 1 && (tag & 7) == 0) {
      e->int64_vals.push_back((int64_t)c.varint());
    } else {
      c.skip(tag & 7);
    }
  }
}

static void parse_feature(Cursor c, FeatureEntry* e) {
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    if (!c.ok) break;
    uint32_t field = tag >> 3, wire = tag & 7;
    if (wire == 2 && field >= 1 && field <= 3) {
      Slice s = c.bytes();
      Cursor inner{s.p, s.p + s.n};
      if (field == 1) parse_bytes_list(inner, e);
      if (field == 2) parse_float_list(inner, e);
      if (field == 3) parse_int64_list(inner, e);
    } else {
      c.skip(wire);
    }
  }
}

static void tfrex_parse_into(ExampleParser* ep, const uint8_t* base,
                             uint64_t len) {
  Cursor c{base, base + len};
  while (c.ok && c.p < c.end) {
    uint64_t tag = c.varint();
    if (!c.ok) break;
    if ((tag >> 3) == 1 && (tag & 7) == 2) {  // Example.features
      Slice feats = c.bytes();
      Cursor fc{feats.p, feats.p + feats.n};
      while (fc.ok && fc.p < fc.end) {
        uint64_t ftag = fc.varint();
        if (!fc.ok) break;
        if ((ftag >> 3) == 1 && (ftag & 7) == 2) {  // map entry
          Slice entry = fc.bytes();
          Cursor mc{entry.p, entry.p + entry.n};
          FeatureEntry fe;
          while (mc.ok && mc.p < mc.end) {
            uint64_t mtag = mc.varint();
            if (!mc.ok) break;
            if ((mtag >> 3) == 1 && (mtag & 7) == 2) {
              Slice k = mc.bytes();
              fe.key.assign((const char*)k.p, k.n);
            } else if ((mtag >> 3) == 2 && (mtag & 7) == 2) {
              Slice v = mc.bytes();
              parse_feature(Cursor{v.p, v.p + v.n}, &fe);
            } else {
              mc.skip(mtag & 7);
            }
          }
          ep->entries.push_back(std::move(fe));
        } else {
          fc.skip(ftag & 7);
        }
      }
    } else {
      c.skip(tag & 7);
    }
  }
  if (!c.ok) ep->error = "malformed Example proto";
}

extern "C" {

ExampleParser* tfrex_parse(const uint8_t* data, uint64_t len) {
  ExampleParser* ep = new ExampleParser();
  ep->owned.assign(data, data + len);
  tfrex_parse_into(ep, ep->owned.data(), len);
  return ep;
}

// Zero-copy variant: Slices point into the CALLER's buffer, which must stay
// valid for the handle's lifetime (used with tfr_next_chunk, whose chunk
// buffer outlives each per-record parse).
ExampleParser* tfrex_parse_view(const uint8_t* data, uint64_t len) {
  ExampleParser* ep = new ExampleParser();
  tfrex_parse_into(ep, data, len);
  return ep;
}

// Packed export: serialize the whole parsed example in TWO calls instead of
// ~5 per feature. Entry order is parse order. Bytes values are exported as
// (offset, length) pairs relative to `base` — zero copies for image
// payloads when parsing a view of the chunk buffer.
void tfrex_pack_sizes(ExampleParser* ep, uint64_t* keys_len,
                      uint64_t* n_byte_items, uint64_t* floats_total,
                      uint64_t* int64s_total) {
  uint64_t kl = 0, nb = 0, nf = 0, ni = 0;
  for (const auto& e : ep->entries) {
    kl += e.key.size();
    nb += e.bytes_vals.size();
    nf += e.float_vals.size();
    ni += e.int64_vals.size();
  }
  *keys_len = kl;
  *n_byte_items = nb;
  *floats_total = nf;
  *int64s_total = ni;
}

void tfrex_pack(ExampleParser* ep, const uint8_t* base, char* keys,
                uint64_t* key_lens, int32_t* types, uint64_t* nvals,
                uint64_t* byte_offs, uint64_t* byte_lens, float* floats,
                int64_t* int64s) {
  char* kp = keys;
  uint64_t bi = 0, fi = 0, ii = 0, idx = 0;
  for (const auto& e : ep->entries) {
    std::memcpy(kp, e.key.data(), e.key.size());
    kp += e.key.size();
    key_lens[idx] = e.key.size();
    types[idx] = e.type;
    switch (e.type) {
      case 0: nvals[idx] = e.bytes_vals.size(); break;
      case 1: nvals[idx] = e.float_vals.size(); break;
      case 2: nvals[idx] = e.int64_vals.size(); break;
      default: nvals[idx] = 0; break;
    }
    for (const auto& s : e.bytes_vals) {
      byte_offs[bi] = (uint64_t)(s.p - base);
      byte_lens[bi] = s.n;
      ++bi;
    }
    if (!e.float_vals.empty()) {
      std::memcpy(floats + fi, e.float_vals.data(),
                  e.float_vals.size() * sizeof(float));
      fi += e.float_vals.size();
    }
    if (!e.int64_vals.empty()) {
      std::memcpy(int64s + ii, e.int64_vals.data(),
                  e.int64_vals.size() * sizeof(int64_t));
      ii += e.int64_vals.size();
    }
    ++idx;
  }
}

// Schema-aware gather: match a caller-provided ORDERED key list against the
// parsed entries in C++ (one hash build + K lookups instead of building a
// K-entry Python dict per example — the data-plane hot path). Two-call
// protocol like pack: _sizes stores the match plan in the handle and
// returns payload totals; _fill writes per-request type/nvals and packed
// values in REQUEST order. Missing keys get type=-1, nvals=0.
int tfrex_gather_sizes(ExampleParser* ep, const char* keys,
                       const uint64_t* key_lens, uint64_t nkeys,
                       uint64_t* n_byte_items, uint64_t* floats_total,
                       uint64_t* int64s_total) {
  std::unordered_map<std::string_view, int64_t> index;
  index.reserve(ep->entries.size() * 2);
  // assignment (LAST duplicate key wins) to match the dict path's
  // out[key] overwrite semantics — emplace would silently pick the first
  for (size_t i = 0; i < ep->entries.size(); ++i)
    index[std::string_view(ep->entries[i].key)] = (int64_t)i;
  ep->plan.clear();
  ep->plan.reserve(nkeys);
  uint64_t nb = 0, nf = 0, ni = 0;
  const char* kp = keys;
  for (uint64_t k = 0; k < nkeys; ++k) {
    std::string_view key(kp, key_lens[k]);
    kp += key_lens[k];
    auto it = index.find(key);
    if (it == index.end()) {
      ep->plan.push_back(-1);
      continue;
    }
    ep->plan.push_back(it->second);
    const FeatureEntry& e = ep->entries[it->second];
    nb += e.bytes_vals.size();
    nf += e.float_vals.size();
    ni += e.int64_vals.size();
  }
  *n_byte_items = nb;
  *floats_total = nf;
  *int64s_total = ni;
  return 0;
}

void tfrex_gather_fill(ExampleParser* ep, const uint8_t* base, int32_t* types,
                       uint64_t* nvals, uint64_t* byte_offs,
                       uint64_t* byte_lens, float* floats, int64_t* int64s) {
  uint64_t bi = 0, fi = 0, ii = 0, idx = 0;
  for (int64_t ei : ep->plan) {
    if (ei < 0) {
      types[idx] = -1;
      nvals[idx] = 0;
      ++idx;
      continue;
    }
    const FeatureEntry& e = ep->entries[ei];
    types[idx] = e.type;
    switch (e.type) {
      case 0: nvals[idx] = e.bytes_vals.size(); break;
      case 1: nvals[idx] = e.float_vals.size(); break;
      case 2: nvals[idx] = e.int64_vals.size(); break;
      default: nvals[idx] = 0; break;
    }
    for (const auto& s : e.bytes_vals) {
      byte_offs[bi] = (uint64_t)(s.p - base);
      byte_lens[bi] = s.n;
      ++bi;
    }
    if (!e.float_vals.empty()) {
      std::memcpy(floats + fi, e.float_vals.data(),
                  e.float_vals.size() * sizeof(float));
      fi += e.float_vals.size();
    }
    if (!e.int64_vals.empty()) {
      std::memcpy(int64s + ii, e.int64_vals.data(),
                  e.int64_vals.size() * sizeof(int64_t));
      ii += e.int64_vals.size();
    }
    ++idx;
  }
}

const char* tfrex_error(ExampleParser* ep) { return ep->error.c_str(); }
uint64_t tfrex_count(ExampleParser* ep) { return ep->entries.size(); }
const char* tfrex_key(ExampleParser* ep, uint64_t i) {
  return ep->entries[i].key.c_str();
}
int tfrex_type(ExampleParser* ep, uint64_t i) { return ep->entries[i].type; }

uint64_t tfrex_num_values(ExampleParser* ep, uint64_t i) {
  const FeatureEntry& e = ep->entries[i];
  switch (e.type) {
    case 0: return e.bytes_vals.size();
    case 1: return e.float_vals.size();
    case 2: return e.int64_vals.size();
  }
  return 0;
}

const uint8_t* tfrex_bytes(ExampleParser* ep, uint64_t i, uint64_t j,
                           uint64_t* len) {
  const Slice& s = ep->entries[i].bytes_vals[j];
  *len = s.n;
  return s.p;
}

void tfrex_floats(ExampleParser* ep, uint64_t i, float* dst) {
  const auto& v = ep->entries[i].float_vals;
  std::memcpy(dst, v.data(), v.size() * sizeof(float));
}

void tfrex_int64s(ExampleParser* ep, uint64_t i, int64_t* dst) {
  const auto& v = ep->entries[i].int64_vals;
  std::memcpy(dst, v.data(), v.size() * sizeof(int64_t));
}

void tfrex_free(ExampleParser* ep) { delete ep; }

}  // extern "C"

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
#include <string>
#include <vector>

// ---------------------------------------------------------------------- //
// CRC32C (Castagnoli), table-driven; masked per the TFRecord spec.
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

static uint32_t crc32c(const uint8_t* data, size_t n) {
  crc32c_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i)
    c = crc32c_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
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
  r->buf.resize(length + 4);
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

extern "C" {

ExampleParser* tfrex_parse(const uint8_t* data, uint64_t len) {
  ExampleParser* ep = new ExampleParser();
  ep->owned.assign(data, data + len);
  Cursor c{ep->owned.data(), ep->owned.data() + len};
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
  return ep;
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

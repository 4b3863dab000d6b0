// fw_native — the C++ host ingest engine: VW text parsing, feature
// translation and fixed-shape batch assembly, multi-threaded.
//
// This is the native equivalent of the reference's hot host path
// (reference: src/parser.rs:214-461 byte-level record parsing,
// src/feature_buffer.rs:137-338 combo/field translation) re-shaped for
// batched TPU consumption: instead of one packed record at a time feeding a
// per-example learner, a *block* of text lines is parsed and translated in
// parallel into structure-of-arrays feature lists, which are then scattered
// into dense padded [B, L] / [B, N] arrays the device consumes directly.
//
// Contracts kept bit-exact with the Python reference implementation
// (fwumious_wabbit_tpu/ingest/parser.py, translator.py) and hence with the
// reference engine:
//   * murmur3_32 feature hashing seeded by murmur3 of the namespace name
//   * the packed u32 record layout [len, label, importance, slots..., tail]
//   * VW FNV-prime interaction chaining, 2^bits masking, constant feature
//
// Exposed via a C ABI consumed with ctypes (no pybind11 in this image).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint32_t MASK31 = 0x7fffffffu;
constexpr uint32_t IS_NOT_SINGLE_MASK = 0x80000000u;
constexpr uint32_t NO_FEATURES = IS_NOT_SINGLE_MASK;
constexpr uint32_t NO_LABEL = 0xff;
constexpr uint32_t FLOAT32_ONE = 1065353216u;  // 1.0f bits
constexpr uint32_t VOWPAL_FNV_PRIME = 16777619u;
constexpr uint32_t CONSTANT_HASH = 11650396u;
constexpr int HEADER_LEN = 3;

inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

// MurmurHash3 x86_32 (reference: src/parser.rs:79-88 via fasthash)
uint32_t murmur3_32(const uint8_t* data, size_t len, uint32_t seed) {
  const uint32_t c1 = 0xcc9e2d51u, c2 = 0x1b873593u;
  uint32_t h = seed;
  const size_t nblocks = len / 4;
  for (size_t i = 0; i < nblocks; i++) {
    uint32_t k;
    std::memcpy(&k, data + 4 * i, 4);
    k *= c1;
    k = rotl32(k, 15);
    k *= c2;
    h ^= k;
    h = rotl32(h, 13);
    h = h * 5 + 0xe6546b64u;
  }
  const uint8_t* tail = data + nblocks * 4;
  uint32_t k = 0;
  switch (len & 3) {
    case 3: k ^= uint32_t(tail[2]) << 16; [[fallthrough]];
    case 2: k ^= uint32_t(tail[1]) << 8; [[fallthrough]];
    case 1:
      k ^= uint32_t(tail[0]);
      k *= c1;
      k = rotl32(k, 15);
      k *= c2;
      h ^= k;
  }
  h ^= uint32_t(len);
  h ^= h >> 16;
  h *= 0x85ebca6bu;
  h ^= h >> 13;
  h *= 0xc2b2ae35u;
  h ^= h >> 16;
  return h;
}

inline uint32_t f32_bits(float x) {
  uint32_t b;
  std::memcpy(&b, &x, 4);
  return b;
}
inline float bits_f32(uint32_t b) {
  float x;
  std::memcpy(&x, &b, 4);
  return x;
}

// strtof on a bounded token; "NONE" → NaN (reference: src/parser.rs parse of
// float tokens; the Python impl maps b"NONE" to nan)
bool parse_float_tok(const uint8_t* s, size_t len, float* out) {
  if (len == 4 && std::memcmp(s, "NONE", 4) == 0) {
    *out = std::nanf("");
    return true;
  }
  char buf[64];
  if (len == 0 || len >= sizeof(buf)) return false;
  std::memcpy(buf, s, len);
  buf[len] = 0;
  char* end = nullptr;
  *out = std::strtof(buf, &end);
  return end == buf + len;
}

struct NamespaceInfo {
  int index;        // namespace_index (slot)
  int format;       // 0 categorical, 1 f32
  uint32_t seed;    // murmur3 of the name
};

struct ComboDesc {
  std::vector<int> ns;  // namespace indices (slots)
  float weight;
};

struct Config {
  int num_namespaces = 0;
  std::unordered_map<std::string, NamespaceInfo> lookup;
  int skip_prefix = 0;
  std::vector<ComboDesc> combos;
  bool add_constant = true;
  uint32_t lr_mask = 0, ffm_mask = 0;
  std::vector<std::vector<int>> ffm_fields;
  int num_threads = 1;
};

// Per-example translated features, SoA within one shard.
struct Shard {
  // parsed packed records, concatenated (for cache writing)
  std::vector<uint32_t> records;
  // per example
  std::vector<float> label, importance;
  std::vector<int32_t> lr_start, ffm_start;  // offsets into feature arrays
  std::vector<uint32_t> lr_ids;
  std::vector<float> lr_vals;
  std::vector<int32_t> lr_combos;
  std::vector<uint32_t> ffm_ids;
  std::vector<float> ffm_vals;
  std::vector<int32_t> ffm_fields;
  std::string error;
  void clear() {
    records.clear();
    label.clear();
    importance.clear();
    lr_start.clear();
    ffm_start.clear();
    lr_ids.clear();
    lr_vals.clear();
    lr_combos.clear();
    ffm_ids.clear();
    ffm_vals.clear();
    ffm_fields.clear();
    error.clear();
  }
};

struct Ctx {
  Config cfg;
  std::vector<Shard> shards;
  std::string error;
  int64_t n_examples = 0;
  int lr_max = 0, ffm_max = 0;
};

// ---------------------------------------------------------------------------
// parser: one line → packed u32 record appended to rec
// (bit-exact port of the contract in ingest/parser.py / reference
// src/parser.rs:214-461)
// ---------------------------------------------------------------------------

enum class LineKind { Example, Empty, Flush, HogwildLoad, Error };

LineKind parse_line(const Config& cfg, const uint8_t* line, size_t n,
                    std::vector<uint32_t>& rec, std::string& err) {
  while (n && (line[n - 1] == '\n' || line[n - 1] == '\r')) n--;
  if (n == 0) return LineKind::Empty;

  const size_t base = rec.size();
  rec.resize(base + HEADER_LEN + cfg.num_namespaces);
  for (int i = 0; i < cfg.num_namespaces; i++)
    rec[base + HEADER_LEN + i] = NO_FEATURES;
  rec[base] = 0;

  uint8_t first = line[0];
  if (first == '1') {
    rec[base + 1] = 1;
  } else if (first == '-') {
    rec[base + 1] = 0;
  } else if (first == '|') {
    rec[base + 1] = NO_LABEL;
  } else if (n >= 5 && std::memcmp(line, "flush", 5) == 0) {
    rec.resize(base);
    return LineKind::Flush;
  } else if (n > 13 && std::memcmp(line, "hogwild_load ", 13) == 0) {
    rec.resize(base);
    return LineKind::HogwildLoad;
  } else {
    rec.resize(base);
    err = "Cannot parse an example";
    return LineKind::Error;
  }

  size_t pos = 0;
  if (rec[base + 1] == NO_LABEL) {
    rec[base + 2] = FLOAT32_ONE;
  } else {
    while (pos < n && line[pos] != ' ') pos++;
    while (pos < n && line[pos] == ' ') pos++;
    if (pos < n && line[pos] == '|') {
      rec[base + 2] = FLOAT32_ONE;
    } else {
      size_t start = pos;
      while (pos < n && line[pos] != ' ') pos++;
      float imp;
      if (!parse_float_tok(line + start, pos - start, &imp)) {
        rec.resize(base);
        err = "Failed parsing example importance";
        return LineKind::Error;
      }
      if (imp < 0.0f) {
        rec.resize(base);
        err = "Example importance cannot be negative";
        return LineKind::Error;
      }
      rec[base + 2] = f32_bits(imp);
    }
  }

  while (pos < n && line[pos] != '|') pos++;

  uint32_t cur_seed = 0;
  size_t cur_slot = base + HEADER_LEN;
  int cur_format = 0;
  float cur_ns_weight = 1.0f;
  int cur_num_features = 0;
  size_t ns_tail_start = 0;

  while (pos < n) {
    while (pos < n && line[pos] == ' ') pos++;
    size_t start = pos;
    while (pos < n && line[pos] != ' ' && line[pos] != ':') pos++;
    size_t end_first = pos;
    while (pos < n && line[pos] != ' ') pos++;
    size_t end = pos;
    if (start >= n) break;

    if (line[start] == '|') {
      std::string name(reinterpret_cast<const char*>(line + start + 1),
                       end_first - start - 1);
      if (end_first != end) {
        if (!parse_float_tok(line + end_first + 1, end - end_first - 1,
                             &cur_ns_weight)) {
          rec.resize(base);
          err = "Failed parsing namespace weight";
          return LineKind::Error;
        }
      } else {
        cur_ns_weight = 1.0f;
      }
      auto it = cfg.lookup.find(name);
      if (it == cfg.lookup.end()) {
        rec.resize(base);
        err = "Feature name was not predeclared in vw_namespace_map.csv: " + name;
        return LineKind::Error;
      }
      cur_seed = it->second.seed;
      cur_slot = base + HEADER_LEN + it->second.index;
      cur_format = it->second.format;
      cur_num_features = 0;
      ns_tail_start = rec.size() - base;
    } else {
      uint32_t h = murmur3_32(line + start, end_first - start, cur_seed) & MASK31;
      float feat_weight = 1.0f;
      if (end_first != end) {
        if (!parse_float_tok(line + end_first + 1, end - end_first - 1,
                             &feat_weight)) {
          rec.resize(base);
          err = "Failed parsing feature weight";
          return LineKind::Error;
        }
      }
      if (cur_num_features == 0 && cur_format == 0 && cur_ns_weight == 1.0f &&
          feat_weight == 1.0f) {
        rec[cur_slot] = h;
      } else {
        uint32_t slot_val = rec[cur_slot];
        if (cur_num_features == 1 && (slot_val & IS_NOT_SINGLE_MASK) == 0) {
          rec.push_back(slot_val);
          rec.push_back(FLOAT32_ONE);
        }
        rec.push_back(h);
        if (cur_format == 1) {
          size_t fstart = start + cfg.skip_prefix;
          float fval;
          if (end_first != fstart) {
            if (!parse_float_tok(line + fstart, end_first - fstart, &fval)) {
              rec.resize(base);
              err = "Failed parsing feature value to float (for float namespace)";
              return LineKind::Error;
            }
          } else {
            fval = std::nanf("");
          }
          rec.push_back(f32_bits(fval));
          if (cur_ns_weight * feat_weight != 1.0f) {
            rec.resize(base);
            err = "Namespaces that are f32 can not have weight attached";
            return LineKind::Error;
          }
        } else {
          rec.push_back(f32_bits(cur_ns_weight * feat_weight));
        }
        rec[cur_slot] =
            IS_NOT_SINGLE_MASK |
            uint32_t((ns_tail_start << 16) + (rec.size() - base));
      }
      cur_num_features++;
    }
    pos++;
  }
  rec[base] = uint32_t(rec.size() - base);
  return LineKind::Example;
}

// ---------------------------------------------------------------------------
// translator: packed record → LR/FFM feature lists
// (port of ingest/translator.py / reference src/feature_buffer.rs:137-338)
// ---------------------------------------------------------------------------

// read (hash, value) pairs of one namespace from a record
inline void read_ns(const uint32_t* rec, int slot, int format,
                    std::vector<std::pair<uint32_t, float>>& out) {
  out.clear();
  uint32_t tok = rec[HEADER_LEN + slot];
  if ((tok & IS_NOT_SINGLE_MASK) == 0) {
    out.emplace_back(tok, 1.0f);
    return;
  }
  if (tok == NO_FEATURES) return;
  uint32_t start = (tok >> 16) & 0x3fff;
  uint32_t end = tok & 0xffff;
  for (uint32_t off = start; off < end; off += 2) {
    float v = format == 1 ? 1.0f : bits_f32(rec[off + 1]);
    out.emplace_back(rec[off], v);
  }
}

void translate_record(const Config& cfg, const uint32_t* rec,
                      const std::vector<int>& formats, Shard& sh) {
  // NO_LABEL stays 255.0, mirroring the Python translator (unlabeled lines
  // only occur on predict paths where the label is unused)
  sh.label.push_back(float(rec[1]));
  sh.importance.push_back(bits_f32(rec[2]));
  sh.lr_start.push_back(int32_t(sh.lr_ids.size()));
  sh.ffm_start.push_back(int32_t(sh.ffm_ids.size()));

  thread_local std::vector<std::pair<uint32_t, float>> feats;
  thread_local std::vector<std::pair<uint32_t, float>> cur, nxt;

  int combo_index = 0;
  for (const auto& combo : cfg.combos) {
    read_ns(rec, combo.ns[0], formats[combo.ns[0]], cur);
    for (size_t d = 1; d < combo.ns.size(); d++) {
      read_ns(rec, combo.ns[d], formats[combo.ns[d]], feats);
      nxt.clear();
      for (const auto& [h_acc, v_acc] : cur) {
        uint32_t half = h_acc * VOWPAL_FNV_PRIME;
        for (const auto& [h, v] : feats)
          nxt.emplace_back(h ^ half, v_acc * v);
      }
      std::swap(cur, nxt);
    }
    for (const auto& [h, v] : cur) {
      sh.lr_ids.push_back(h & cfg.lr_mask);
      sh.lr_vals.push_back(v * combo.weight);
      sh.lr_combos.push_back(combo_index);
    }
    combo_index++;
  }
  if (cfg.add_constant) {
    sh.lr_ids.push_back(CONSTANT_HASH & cfg.lr_mask);
    sh.lr_vals.push_back(1.0f);
    sh.lr_combos.push_back(int32_t(cfg.combos.size()));
  }
  if (!cfg.ffm_fields.empty()) {
    int field_index = 0;
    for (const auto& field : cfg.ffm_fields) {
      for (int slot : field) {
        read_ns(rec, slot, formats[slot], feats);
        for (const auto& [h, v] : feats) {
          sh.ffm_ids.push_back(h & cfg.ffm_mask);
          sh.ffm_vals.push_back(v);
          sh.ffm_fields.push_back(field_index);
        }
      }
      field_index++;
    }
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* fwn_create(int num_namespaces, const char* ns_names,
                 const int* ns_name_lens, const int* ns_indices,
                 const int* ns_formats, int skip_prefix, int num_combos,
                 const int* combo_offsets, const int* combo_ns,
                 const float* combo_weights, int add_constant,
                 uint32_t lr_mask, uint32_t ffm_mask, int num_ffm_fields,
                 const int* field_offsets, const int* field_ns,
                 int num_threads) {
  auto* ctx = new Ctx();
  Config& c = ctx->cfg;
  c.num_namespaces = num_namespaces;
  c.skip_prefix = skip_prefix;
  const char* p = ns_names;
  // num_namespaces is the SLOT count; the name table (one entry per declared
  // name, both short and verbose forms) is sized by ns_name_lens[0], with
  // per-name lengths at ns_name_lens[1..].
  int num_names = ns_name_lens[0];
  for (int i = 0; i < num_names; i++) {
    int len = ns_name_lens[1 + i];
    std::string name(p, len);
    p += len;
    c.lookup[name] = NamespaceInfo{
        ns_indices[i], ns_formats[i],
        murmur3_32(reinterpret_cast<const uint8_t*>(name.data()), name.size(), 0)};
  }
  for (int i = 0; i < num_combos; i++) {
    ComboDesc d;
    for (int j = combo_offsets[i]; j < combo_offsets[i + 1]; j++)
      d.ns.push_back(combo_ns[j]);
    d.weight = combo_weights[i];
    c.combos.push_back(std::move(d));
  }
  c.add_constant = add_constant != 0;
  c.lr_mask = lr_mask;
  c.ffm_mask = ffm_mask;
  for (int i = 0; i < num_ffm_fields; i++) {
    std::vector<int> f;
    for (int j = field_offsets[i]; j < field_offsets[i + 1]; j++)
      f.push_back(field_ns[j]);
    c.ffm_fields.push_back(std::move(f));
  }
  c.num_threads = num_threads > 0 ? num_threads : 1;
  ctx->shards.resize(c.num_threads);
  return ctx;
}

void fwn_destroy(void* p) { delete static_cast<Ctx*>(p); }

const char* fwn_last_error(void* p) {
  return static_cast<Ctx*>(p)->error.c_str();
}

// formats per slot (built once per ctx) — slot -> format
static std::vector<int> slot_formats(const Config& c) {
  std::vector<int> formats(c.num_namespaces, 0);
  for (const auto& [name, info] : c.lookup) formats[info.index] = info.format;
  return formats;
}

// Parse + translate a block of newline-separated examples. Returns the
// number of examples, or -1 on error (see fwn_last_error). Lines holding
// in-band commands (flush / hogwild_load) are skipped in block mode.
int64_t fwn_translate_block(void* p, const char* buf, int64_t len) {
  auto* ctx = static_cast<Ctx*>(p);
  const Config& cfg = ctx->cfg;
  const auto* data = reinterpret_cast<const uint8_t*>(buf);

  // split into per-thread line ranges
  int T = cfg.num_threads;
  std::vector<std::pair<int64_t, int64_t>> ranges;
  int64_t chunk = len / T + 1;
  int64_t s = 0;
  for (int t = 0; t < T && s < len; t++) {
    int64_t e = s + chunk;
    if (e >= len) {
      e = len;
    } else {
      while (e < len && data[e - 1] != '\n') e++;
    }
    ranges.emplace_back(s, e);
    s = e;
  }
  T = int(ranges.size());

  auto formats = slot_formats(cfg);
  std::atomic<bool> failed{false};

  auto work = [&](int t) {
    Shard& sh = ctx->shards[t];
    sh.clear();
    auto [rs, re] = ranges[t];
    int64_t i = rs;
    std::vector<uint32_t> rec;
    while (i < re && !failed.load(std::memory_order_relaxed)) {
      int64_t j = i;
      while (j < re && data[j] != '\n') j++;
      size_t rec_base = sh.records.size();
      std::string err;
      LineKind kind = parse_line(cfg, data + i, size_t(j - i), sh.records, err);
      if (kind == LineKind::Example) {
        translate_record(cfg, sh.records.data() + rec_base, formats, sh);
      } else if (kind == LineKind::Error) {
        sh.error = err;
        failed.store(true, std::memory_order_relaxed);
        return;
      }
      i = j + 1;
    }
  };

  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < T; t++) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
  for (int t = T; t < int(ctx->shards.size()); t++) ctx->shards[t].clear();

  for (int t = 0; t < T; t++) {
    if (!ctx->shards[t].error.empty()) {
      ctx->error = ctx->shards[t].error;
      return -1;
    }
  }

  int64_t n = 0;
  int lr_max = 0, ffm_max = 0;
  for (auto& sh : ctx->shards) {
    size_t m = sh.label.size();
    sh.lr_start.push_back(int32_t(sh.lr_ids.size()));
    sh.ffm_start.push_back(int32_t(sh.ffm_ids.size()));
    for (size_t i = 0; i < m; i++) {
      lr_max = std::max(lr_max, int(sh.lr_start[i + 1] - sh.lr_start[i]));
      ffm_max = std::max(ffm_max, int(sh.ffm_start[i + 1] - sh.ffm_start[i]));
    }
    n += int64_t(m);
  }
  ctx->n_examples = n;
  ctx->lr_max = lr_max;
  ctx->ffm_max = ffm_max;
  return n;
}

// Translate pre-parsed packed u32 records (the cache read path).
int64_t fwn_translate_records(void* p, const uint32_t* recs, int64_t words) {
  auto* ctx = static_cast<Ctx*>(p);
  const Config& cfg = ctx->cfg;
  auto formats = slot_formats(cfg);
  for (auto& sh : ctx->shards) sh.clear();
  Shard& sh = ctx->shards[0];
  int64_t off = 0;
  while (off < words) {
    uint32_t reclen = recs[off];
    if (reclen < HEADER_LEN || off + int64_t(reclen) > words) {
      ctx->error = "corrupt record stream";
      return -1;
    }
    translate_record(cfg, recs + off, formats, sh);
    off += reclen;
  }
  sh.lr_start.push_back(int32_t(sh.lr_ids.size()));
  sh.ffm_start.push_back(int32_t(sh.ffm_ids.size()));
  int lr_max = 0, ffm_max = 0;
  for (size_t i = 0; i < sh.label.size(); i++) {
    lr_max = std::max(lr_max, int(sh.lr_start[i + 1] - sh.lr_start[i]));
    ffm_max = std::max(ffm_max, int(sh.ffm_start[i + 1] - sh.ffm_start[i]));
  }
  ctx->n_examples = int64_t(sh.label.size());
  ctx->lr_max = lr_max;
  ctx->ffm_max = ffm_max;
  return ctx->n_examples;
}

int fwn_lr_max(void* p) { return static_cast<Ctx*>(p)->lr_max; }
int fwn_ffm_max(void* p) { return static_cast<Ctx*>(p)->ffm_max; }

// Concatenated packed records of the last block (cache write path).
int64_t fwn_records_len(void* p) {
  auto* ctx = static_cast<Ctx*>(p);
  int64_t n = 0;
  for (auto& sh : ctx->shards) n += int64_t(sh.records.size());
  return n;
}

void fwn_records_copy(void* p, uint32_t* out) {
  auto* ctx = static_cast<Ctx*>(p);
  for (auto& sh : ctx->shards) {
    std::memcpy(out, sh.records.data(), sh.records.size() * 4);
    out += sh.records.size();
  }
}

// Scatter the translated block into dense padded arrays. B >= n_examples;
// L >= lr_max; N >= ffm_max. Arrays must be zero-initialized by the caller
// (padding stays id 0 / value 0).
void fwn_fill(void* p, int64_t B, int64_t L, int64_t N, float* label,
              float* importance, int32_t* lr_ids, float* lr_vals,
              int32_t* lr_combos, int32_t* ffm_ids, float* ffm_vals,
              int32_t* ffm_fields) {
  auto* ctx = static_cast<Ctx*>(p);
  (void)B;
  int64_t row = 0;
  for (auto& sh : ctx->shards) {
    size_t m = sh.label.size();
    for (size_t i = 0; i < m; i++, row++) {
      label[row] = sh.label[i];
      importance[row] = sh.importance[i];
      int32_t a = sh.lr_start[i], b = sh.lr_start[i + 1];
      for (int32_t j = a; j < b; j++) {
        int64_t o = row * L + (j - a);
        lr_ids[o] = int32_t(sh.lr_ids[j]);
        lr_vals[o] = sh.lr_vals[j];
        lr_combos[o] = sh.lr_combos[j];
      }
      if (N > 0) {
        a = sh.ffm_start[i];
        b = sh.ffm_start[i + 1];
        for (int32_t j = a; j < b; j++) {
          int64_t o = row * N + (j - a);
          ffm_ids[o] = int32_t(sh.ffm_ids[j]);
          ffm_vals[o] = sh.ffm_vals[j];
          ffm_fields[o] = sh.ffm_fields[j];
        }
      }
    }
  }
}

// standalone hashing (tests / tooling)
uint32_t fwn_murmur3(const char* data, int64_t len, uint32_t seed) {
  return murmur3_32(reinterpret_cast<const uint8_t*>(data), size_t(len), seed);
}

}  // extern "C"

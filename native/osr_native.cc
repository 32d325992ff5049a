// osr_tpu native runtime components.
//
// The TPU compute path is jax/XLA (see osr_tpu/ops); this library covers the
// host-side hot loops around it:
//
//   - tf_build:       corpus tokenization + per-document term-frequency
//                     counting (the index-build bottleneck; equivalent of the
//                     Python Counter loops in osr_tpu/index/builder.py)
//   - tokenize_ascii: query/document tokenization (runs of [a-z0-9_] after
//                     ASCII lowercasing — identical tokens to the reference's
//                     re.findall(r"\b\w+\b", text.lower()) on ASCII input)
//   - zlib_*:         document-store payload codec
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

inline bool is_word_byte(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9') || c == '_';
}

inline char lower_byte(unsigned char c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32)
                                : static_cast<char>(c);
}

// Stable-address string interning: views handed out never move because each
// chunk's capacity is fixed up front and never exceeded.
struct Arena {
  std::vector<std::string> chunks;
  static constexpr size_t kChunk = 1 << 20;

  std::string_view intern(const std::string& s) {
    size_t need = s.size();
    if (chunks.empty() ||
        chunks.back().size() + need > chunks.back().capacity()) {
      chunks.emplace_back();
      chunks.back().reserve(need > kChunk ? need : kChunk);
    }
    std::string& c = chunks.back();
    size_t off = c.size();
    c.append(s);
    return std::string_view(c.data() + off, need);
  }
};

struct TfResult {
  std::vector<int64_t> indptr;     // (ndocs+1) into term_ids/counts
  std::vector<int32_t> term_ids;   // temp ids, first-seen order
  std::vector<float> counts;       // per-(doc, term) tf
  std::vector<float> doc_lengths;  // total tokens per doc
  std::vector<int64_t> df;         // per temp id
  std::string term_buf;            // concatenated term bytes
  std::vector<int64_t> term_offs;  // (nterms+1) into term_buf
};

struct TfState {
  TfResult result;
  Arena arena;
  std::vector<std::string_view> terms;  // temp id -> bytes
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Corpus term-frequency builder
// ---------------------------------------------------------------------------

void* tf_build(const char* buf, int64_t nbytes, const int64_t* doc_offs,
               int64_t ndocs) {
  (void)nbytes;
  auto* st = new TfState();
  TfResult& r = st->result;
  std::unordered_map<std::string_view, int32_t> vocab;
  vocab.reserve(1 << 16);
  std::string token;
  token.reserve(64);

  r.indptr.reserve(ndocs + 1);
  r.indptr.push_back(0);
  r.doc_lengths.reserve(ndocs);

  // Per-doc dedup without clearing: term id -> (last doc, slot in its row).
  std::vector<int64_t> epoch_of;
  std::vector<int64_t> slot_of;

  for (int64_t d = 0; d < ndocs; ++d) {
    const char* p = buf + doc_offs[d];
    const char* end = buf + doc_offs[d + 1];
    int64_t n_tokens = 0;
    while (p < end) {
      while (p < end && !is_word_byte(static_cast<unsigned char>(*p))) ++p;
      if (p >= end) break;
      token.clear();
      while (p < end && is_word_byte(static_cast<unsigned char>(*p))) {
        token.push_back(lower_byte(static_cast<unsigned char>(*p)));
        ++p;
      }
      ++n_tokens;
      int32_t id;
      auto it = vocab.find(std::string_view(token));
      if (it == vocab.end()) {
        std::string_view interned = st->arena.intern(token);
        id = static_cast<int32_t>(st->terms.size());
        st->terms.push_back(interned);
        vocab.emplace(interned, id);
        epoch_of.push_back(-1);
        slot_of.push_back(0);
        r.df.push_back(0);
      } else {
        id = it->second;
      }
      if (epoch_of[id] != d) {
        epoch_of[id] = d;
        slot_of[id] = static_cast<int64_t>(r.term_ids.size());
        r.term_ids.push_back(id);
        r.counts.push_back(1.0f);
        r.df[id] += 1;
      } else {
        r.counts[slot_of[id]] += 1.0f;
      }
    }
    r.indptr.push_back(static_cast<int64_t>(r.term_ids.size()));
    r.doc_lengths.push_back(static_cast<float>(n_tokens));
  }

  // Flatten the term table for the ctypes copy-out.
  r.term_offs.reserve(st->terms.size() + 1);
  r.term_offs.push_back(0);
  size_t total = 0;
  for (const auto& t : st->terms) total += t.size();
  r.term_buf.reserve(total);
  for (const auto& t : st->terms) {
    r.term_buf.append(t.data(), t.size());
    r.term_offs.push_back(static_cast<int64_t>(r.term_buf.size()));
  }
  return st;
}

int64_t tf_num_terms(void* h) {
  return static_cast<int64_t>(static_cast<TfState*>(h)->terms.size());
}
int64_t tf_nnz(void* h) {
  return static_cast<int64_t>(
      static_cast<TfState*>(h)->result.term_ids.size());
}
int64_t tf_term_bytes(void* h) {
  return static_cast<int64_t>(
      static_cast<TfState*>(h)->result.term_buf.size());
}

void tf_copy(void* h, int64_t* indptr, int32_t* term_ids, float* counts,
             float* doc_lengths, int64_t* df, char* term_buf,
             int64_t* term_offs) {
  TfResult& r = static_cast<TfState*>(h)->result;
  std::memcpy(indptr, r.indptr.data(), r.indptr.size() * sizeof(int64_t));
  std::memcpy(term_ids, r.term_ids.data(),
              r.term_ids.size() * sizeof(int32_t));
  std::memcpy(counts, r.counts.data(), r.counts.size() * sizeof(float));
  std::memcpy(doc_lengths, r.doc_lengths.data(),
              r.doc_lengths.size() * sizeof(float));
  std::memcpy(df, r.df.data(), r.df.size() * sizeof(int64_t));
  std::memcpy(term_buf, r.term_buf.data(), r.term_buf.size());
  std::memcpy(term_offs, r.term_offs.data(),
              r.term_offs.size() * sizeof(int64_t));
}

void tf_free(void* h) { delete static_cast<TfState*>(h); }

// ---------------------------------------------------------------------------
// ASCII tokenizer (query path)
// ---------------------------------------------------------------------------

// Lowercase `text` into `out` (same length) and record token [start, end)
// byte offsets. Returns the token count (clipped at max_tokens).
int64_t tokenize_ascii(const char* text, int64_t len, char* out,
                       int64_t* starts, int64_t* ends, int64_t max_tokens) {
  for (int64_t i = 0; i < len; ++i) {
    out[i] = lower_byte(static_cast<unsigned char>(text[i]));
  }
  int64_t n = 0;
  int64_t i = 0;
  while (i < len && n < max_tokens) {
    while (i < len && !is_word_byte(static_cast<unsigned char>(text[i]))) ++i;
    if (i >= len) break;
    starts[n] = i;
    while (i < len && is_word_byte(static_cast<unsigned char>(text[i]))) ++i;
    ends[n] = i;
    ++n;
  }
  return n;
}

// ---------------------------------------------------------------------------
// zlib codec (document store)
// ---------------------------------------------------------------------------

int64_t zlib_compress_bound(int64_t raw_len) {
  return static_cast<int64_t>(compressBound(static_cast<uLong>(raw_len)));
}

// Returns compressed size, or -1 on error.
int64_t zlib_compress2(const unsigned char* raw, int64_t raw_len,
                       unsigned char* out, int64_t out_cap, int level) {
  uLongf out_len = static_cast<uLongf>(out_cap);
  int rc = compress2(out, &out_len, raw, static_cast<uLong>(raw_len), level);
  return rc == Z_OK ? static_cast<int64_t>(out_len) : -1;
}

// Returns decompressed size, or -1 on error.
int64_t zlib_decompress(const unsigned char* payload, int64_t payload_len,
                        unsigned char* out, int64_t raw_len) {
  uLongf out_len = static_cast<uLongf>(raw_len);
  int rc =
      uncompress(out, &out_len, payload, static_cast<uLong>(payload_len));
  return rc == Z_OK ? static_cast<int64_t>(out_len) : -1;
}

}  // extern "C"

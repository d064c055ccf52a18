// fastvec: native tokenize-and-encode for the input pipeline.
//
// Role in the framework (SURVEY.md SS2.12): the reference is pure
// Python-on-PyTorch with DataLoader worker processes doing per-example
// vectorization; this host runs the TPU feed on a single CPU core, so the
// hot host-side loop (token -> id lookup + padded tensor fill, done for
// batch * session * 50 candidates strings per step) is implemented here in
// C++ and exposed over a plain C ABI consumed via ctypes
// (context_attentive_ir_tpu/data/fast.py).  The Python implementation in
// data/vectorize.py remains the reference semantics; equivalence is tested
// in tests/test_fastvec.py.
//
// Normalization contract: ASCII lowercasing only.  The Python Dictionary
// additionally applies NFD unicode normalization; callers must pass
// pre-normalized vocabularies and (for exactness on non-ASCII text)
// pre-normalized input.  AOL queries/titles are ASCII in practice.

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> map;
    bool uncase;
};

inline void ascii_lower(std::string& s) {
    for (char& c : s)
        if (c >= 'A' && c <= 'Z') c += 32;
}

constexpr int32_t PAD = 0;
constexpr int32_t UNK = 1;

}  // namespace

extern "C" {

void* fv_vocab_create(const char** words, int32_t n, int32_t uncase) {
    auto* v = new Vocab();
    v->uncase = uncase != 0;
    v->map.reserve(static_cast<size_t>(n) * 2);
    for (int32_t i = 0; i < n; ++i) {
        std::string w(words[i]);
        if (v->uncase) ascii_lower(w);
        v->map.emplace(std::move(w), i);
    }
    return v;
}

void fv_vocab_free(void* h) { delete static_cast<Vocab*>(h); }

int32_t fv_vocab_size(void* h) {
    return static_cast<int32_t>(static_cast<Vocab*>(h)->map.size());
}

// Whitespace-tokenize `text`, encode into out[0..max_len) with PAD fill and
// write a 0/1 mask. Returns the number of (un-truncated) tokens written.
// ASCII whitespace set matching Python str.split(): ' ' \t \n \r \v \f
// (non-ASCII unicode whitespace is out of scope for this corpus format --
// the Python fallback handles it; data/fast.py documents the contract).
static inline bool fv_isspace(char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\v'
        || c == '\f';
}

int32_t fv_encode(void* h, const char* text, int32_t* out, uint8_t* mask,
                  int32_t max_len) {
    const Vocab* v = static_cast<Vocab*>(h);
    int32_t count = 0;
    const char* p = text;
    std::string tok;
    while (*p && count < max_len) {
        while (fv_isspace(*p)) ++p;
        if (!*p) break;
        const char* start = p;
        while (*p && !fv_isspace(*p)) ++p;
        tok.assign(start, static_cast<size_t>(p - start));
        if (v->uncase) ascii_lower(tok);
        auto it = v->map.find(tok);
        out[count] = it == v->map.end() ? UNK : it->second;
        mask[count] = 1;
        ++count;
    }
    for (int32_t i = count; i < max_len; ++i) {
        out[i] = PAD;
        mask[i] = 0;
    }
    return count;
}

// Encode n strings into out[n, max_len] / mask[n, max_len] (row-major,
// preallocated by the caller -- numpy arrays on the Python side).
void fv_encode_batch(void* h, const char** texts, int32_t n,
                     int32_t max_len, int32_t* out, uint8_t* mask) {
    for (int32_t i = 0; i < n; ++i) {
        fv_encode(h, texts[i], out + static_cast<int64_t>(i) * max_len,
                  mask + static_cast<int64_t>(i) * max_len, max_len);
    }
}

// Teacher-forcing encode: tin = BOS + ids, tout = ids + EOS, both padded to
// max_len; tmask marks tout validity. BOS/EOS passed in to stay in sync
// with the Python constants.
void fv_encode_target(void* h, const char* text, int32_t bos, int32_t eos,
                      int32_t* tin, int32_t* tout, uint8_t* tmask,
                      int32_t max_len) {
    std::vector<int32_t> ids(static_cast<size_t>(max_len));
    std::vector<uint8_t> m(static_cast<size_t>(max_len));
    int32_t count = fv_encode(h, text, ids.data(), m.data(), max_len - 1);
    tin[0] = bos;
    for (int32_t i = 0; i < count; ++i) {
        tin[i + 1] = ids[i];
        tout[i] = ids[i];
    }
    tout[count] = eos;
    for (int32_t i = 0; i <= count && i < max_len; ++i) tmask[i] = 1;
    for (int32_t i = count + 1; i < max_len; ++i) {
        tin[i] = PAD;
        tout[i] = PAD;
        tmask[i] = 0;
    }
}

}  // extern "C"

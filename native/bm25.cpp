// bm25: native BM25 scoring + top-k for candidate-slate retrieval.
//
// Role in the framework (SURVEY.md SS2.11/SS2.12): the reference's AOL
// prep retrieves BM25 top-50 title slates per query; this host has one
// CPU core, so the per-query scoring loop (postings accumulation + top-k
// over a potentially million-title corpus) runs here in C++ behind a
// plain C ABI (ctypes wrapper: context_attentive_ir_tpu/data/fast_bm25.py).
//
// Division of labor: Python owns tokenization, normalization, vocabulary
// and idf/norm precomputation (data/bm25.py -- the semantics reference);
// this library receives the packed CSR postings and term-id queries and
// does ONLY the float accumulation + selection.  Accumulation is f32 in
// query-term order with the same operation order as the numpy path
// (((idf * tf) * (k1+1)) / (tf + norm)), so scores are bit-identical and
// the top-k (score desc, doc-index asc on ties) matches exactly --
// equivalence-tested in tests/test_bm25.py.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Index {
    int64_t n_docs = 0;
    int64_t n_terms = 0;
    std::vector<int64_t> offsets;   // [n_terms + 1]
    std::vector<int32_t> post_doc;  // [nnz]
    std::vector<float> post_tf;     // [nnz]
    std::vector<float> idf;         // [n_terms]
    std::vector<float> norm;        // [n_docs]
    float k1p1 = 2.2f;
    // scratch reused across queries
    std::vector<float> scores;      // [n_docs], zeros between queries
    std::vector<int32_t> touched;
};

}  // namespace

extern "C" {

void* bm25_new(int64_t n_docs, int64_t n_terms, const int64_t* offsets,
               const int32_t* post_doc, const float* post_tf,
               const float* idf, const float* norm, float k1) {
    auto* ix = new Index();
    ix->n_docs = n_docs;
    ix->n_terms = n_terms;
    ix->offsets.assign(offsets, offsets + n_terms + 1);
    const int64_t nnz = offsets[n_terms];
    ix->post_doc.assign(post_doc, post_doc + nnz);
    ix->post_tf.assign(post_tf, post_tf + nnz);
    ix->idf.assign(idf, idf + n_terms);
    ix->norm.assign(norm, norm + n_docs);
    ix->k1p1 = k1 + 1.0f;
    ix->scores.assign(static_cast<size_t>(n_docs), 0.0f);
    return ix;
}

void bm25_free(void* h) { delete static_cast<Index*>(h); }

// Queries packed as term-id arrays: query qi spans
// q_tids[q_offsets[qi] : q_offsets[qi + 1]] (ids already vocab-mapped
// and in occurrence order).  Writes top-k doc indices and scores row per
// query; rows shorter than k (never happens: k <= n_docs enforced by the
// caller) would be padded with -1/0.
void bm25_search(void* h, const int32_t* q_tids, const int64_t* q_offsets,
                 int64_t n_queries, int32_t k, int32_t* out_idx,
                 float* out_score) {
    auto* ix = static_cast<Index*>(h);
    std::vector<std::pair<float, int32_t>> cand;
    for (int64_t qi = 0; qi < n_queries; ++qi) {
        ix->touched.clear();
        for (int64_t p = q_offsets[qi]; p < q_offsets[qi + 1]; ++p) {
            const int32_t t = q_tids[p];
            if (t < 0 || t >= ix->n_terms) continue;
            const float w = ix->idf[t];
            for (int64_t e = ix->offsets[t]; e < ix->offsets[t + 1]; ++e) {
                const int32_t d = ix->post_doc[e];
                const float tf = ix->post_tf[e];
                if (ix->scores[d] == 0.0f) ix->touched.push_back(d);
                // same op order as numpy: ((idf*tf) * (k1+1)) / (tf+norm)
                ix->scores[d] += ((w * tf) * ix->k1p1) / (tf + ix->norm[d]);
            }
        }
        cand.clear();
        cand.reserve(ix->touched.size());
        for (const int32_t d : ix->touched)
            cand.emplace_back(ix->scores[d], d);
        const auto better = [](const std::pair<float, int32_t>& a,
                               const std::pair<float, int32_t>& b) {
            if (a.first != b.first) return a.first > b.first;
            return a.second < b.second;
        };
        const size_t kk = static_cast<size_t>(k);
        if (cand.size() > kk) {
            std::nth_element(cand.begin(), cand.begin() + kk, cand.end(),
                             better);
            cand.resize(kk);
        }
        std::sort(cand.begin(), cand.end(), better);
        // zero-score fill: the numpy reference ranks untouched docs by
        // ascending index after every touched (strictly positive) doc
        if (cand.size() < kk) {
            for (int32_t d = 0;
                 d < ix->n_docs && cand.size() < kk; ++d)
                if (ix->scores[d] == 0.0f) cand.emplace_back(0.0f, d);
        }
        for (size_t i = 0; i < kk; ++i) {
            if (i < cand.size()) {
                out_idx[qi * k + static_cast<int64_t>(i)] = cand[i].second;
                out_score[qi * k + static_cast<int64_t>(i)] = cand[i].first;
            } else {
                out_idx[qi * k + static_cast<int64_t>(i)] = -1;
                out_score[qi * k + static_cast<int64_t>(i)] = 0.0f;
            }
        }
        for (const int32_t d : ix->touched) ix->scores[d] = 0.0f;
    }
}

}  // extern "C"

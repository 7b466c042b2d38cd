// Native CIDEr-D scorer for the SCST training hot loop.
//
// The reference computes CIDEr-D rewards per training iteration in Python
// (cider submodule via /root/reference/captioning/utils/rewards.py:64),
// serializing id sequences to strings and counting n-grams in dicts — the
// main host-side cost between device steps (SURVEY.md section 5.8).  This
// C++ implementation works directly on int32 token matrices with
// open-addressing hash tables; semantics match utils/cider_scorer.CiderD:
//
//   tfidf(g) = tf(g) * (log_ref_len - log(max(df(g), 1)))
//   sim_n    = sum_g min(h_g, r_g) * r_g / (|h_n| * |r_n|)
//   score    = 10/4 * sum_n mean_refs( sim_n * exp(-(len_h-len_r)^2 / (2*6^2)) )
//
// Sequences terminate at (and include) the first 0 token, mirroring
// array_to_str (rewards.py:33-39).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>

namespace {

constexpr int MAX_N = 4;
constexpr double SIGMA = 6.0;

// FNV-1a style rolling hash over (n, tokens...)
static inline uint64_t hash_ngram(const int32_t* toks, int n) {
  uint64_t h = 1469598103934665603ULL ^ (uint64_t)n;
  for (int i = 0; i < n; i++) {
    h ^= (uint64_t)(toks[i] + 1);
    h *= 1099511628211ULL;
  }
  return h;
}

struct NGramVec {
  // per-n sparse tf-idf vectors as (hash -> weight)
  std::unordered_map<uint64_t, double> vec[MAX_N];
  double norm[MAX_N] = {0, 0, 0, 0};
  int length = 0;  // bigram count (= len-1), reference counts2vec semantics
};

struct Scorer {
  std::unordered_map<uint64_t, double> df;
  double log_ref_len = 0.0;

  void build(const NGramVec&, const int32_t*, int) const;
};

static int effective_len(const int32_t* row, int stride) {
  // tokens up to and including the first 0
  for (int i = 0; i < stride; i++) {
    if (row[i] == 0) return i + 1;
  }
  return stride;
}

static void counts2vec(const Scorer& sc, const int32_t* row, int stride,
                       NGramVec& out) {
  int len = effective_len(row, stride);
  // raw counts first
  std::unordered_map<uint64_t, int> counts[MAX_N];
  for (int n = 1; n <= MAX_N; n++) {
    for (int i = 0; i + n <= len; i++) {
      counts[n - 1][hash_ngram(row + i, n)]++;
    }
  }
  for (int n = 0; n < MAX_N; n++) {
    for (auto& kv : counts[n]) {
      auto it = sc.df.find(kv.first);
      double dfv = it == sc.df.end() ? 0.0 : it->second;
      double idf = sc.log_ref_len - std::log(std::max(1.0, dfv));
      double w = (double)kv.second * idf;
      out.vec[n][kv.first] = w;
      out.norm[n] += w * w;
      if (n == 1) out.length += kv.second;
    }
  }
  for (int n = 0; n < MAX_N; n++) out.norm[n] = std::sqrt(out.norm[n]);
}

static double sim(const NGramVec& h, const NGramVec& r) {
  double delta = (double)(h.length - r.length);
  double gauss = std::exp(-(delta * delta) / (2 * SIGMA * SIGMA));
  double total = 0.0;
  for (int n = 0; n < MAX_N; n++) {
    double s = 0.0;
    for (auto& kv : h.vec[n]) {
      auto it = r.vec[n].find(kv.first);
      if (it != r.vec[n].end()) {
        s += std::min(kv.second, it->second) * it->second;
      }
    }
    if (h.norm[n] != 0 && r.norm[n] != 0) s /= (h.norm[n] * r.norm[n]);
    total += s * gauss;
  }
  return total;
}

}  // namespace

extern "C" {

// Opaque scorer handle ----------------------------------------------------
void* ciderd_new(double ref_len) {
  auto* sc = new Scorer();
  sc->log_ref_len = std::log(ref_len);
  return sc;
}

void ciderd_free(void* handle) { delete (Scorer*)handle; }

// Load document frequencies: n_entries ngrams given as flattened token ids
// (ngram_tokens, int32) with lengths (ngram_lens, int32) and dfs (double).
void ciderd_load_df(void* handle, const int32_t* ngram_tokens,
                    const int32_t* ngram_lens, const double* dfs,
                    int64_t n_entries) {
  auto* sc = (Scorer*)handle;
  sc->df.reserve((size_t)n_entries * 2);
  int64_t off = 0;
  for (int64_t i = 0; i < n_entries; i++) {
    int n = ngram_lens[i];
    sc->df[hash_ngram(ngram_tokens + off, n)] = dfs[i];
    off += n;
  }
}

// Score candidates against reference groups.
//   cands:        [n_cands, cand_stride] int32 (0-terminated rows)
//   refs:         [n_refs, ref_stride] int32
//   ref_group_offsets: [n_groups+1] int64 — refs i in [off[g], off[g+1])
//   cand_group:   [n_cands] int32 — which ref group each candidate uses
//   out_scores:   [n_cands] double
void ciderd_score(void* handle,
                  const int32_t* cands, int64_t n_cands, int cand_stride,
                  const int32_t* refs, int64_t n_refs, int ref_stride,
                  const int64_t* ref_group_offsets, int64_t n_groups,
                  const int32_t* cand_group,
                  double* out_scores) {
  auto* sc = (Scorer*)handle;
  // Precompute ref vectors once per ref
  std::vector<NGramVec> ref_vecs((size_t)n_refs);
  for (int64_t i = 0; i < n_refs; i++) {
    counts2vec(*sc, refs + i * ref_stride, ref_stride, ref_vecs[i]);
  }
  for (int64_t c = 0; c < n_cands; c++) {
    NGramVec hv;
    counts2vec(*sc, cands + c * cand_stride, cand_stride, hv);
    int g = cand_group[c];
    int64_t r0 = ref_group_offsets[g], r1 = ref_group_offsets[g + 1];
    double s = 0.0;
    for (int64_t r = r0; r < r1; r++) s += sim(hv, ref_vecs[r]);
    int64_t nref = r1 - r0;
    out_scores[c] = nref > 0 ? (s / (double)nref) * 10.0 / MAX_N : 0.0;
  }
}

}  // extern "C"

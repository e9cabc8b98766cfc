// Native assembly core: the two host hot spots of phase A.
//
//  1. l2t_kmer_pass    — the vectorized middle of cbdg/graph.py::_build_graph
//                        (canonicalize + hash + unique + MateMer-dedup counts
//                        + expected-error filter + survivor edges), bit-exact
//                        to the numpy implementation it replaces.
//  2. l2t_align_batch  — the dual-affine DP + traceback of ops/affine_dp.py
//                        (align_batch_numpy + traceback_batch), bit-exact
//                        including tie-breaking and direction-bit semantics.
//
// Reference parity anchors: src/lancet/cbdg/graph.cpp:262-341 (BuildGraph),
// src/lancet/caller/msa_builder.h:17-71 (SPOA convex dual-affine params),
// src/lancet/caller/genotyper.cpp:89-191 (read->hap scoring contract).
//
// Everything runs with the GIL released (plain C ABI, caller-allocated
// output buffers sized by the occurrence count upper bound).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <unordered_map>
#include <unordered_set>

namespace {

constexpr uint64_t FNV_OFFSET = 0xCBF29CE484222325ull;
constexpr uint64_t FNV_PRIME = 0x100000001B3ull;
constexpr uint64_t MIX1 = 0xBF58476D1CE4E5B9ull;
constexpr uint64_t MIX2 = 0x94D049BB133111EBull;

inline uint64_t mix64(uint64_t x) {
  x ^= x >> 30; x *= MIX1;
  x ^= x >> 27; x *= MIX2;
  x ^= x >> 31;
  return x;
}

// hash_kmer_matrix (base/hashing.py): pack 8 raw codes per LE u64 word,
// FNV-1a over words, avalanche, xor mix64(k).
inline uint64_t hash_kmer(const uint8_t* codes, int64_t k) {
  uint64_t h = FNV_OFFSET;
  int64_t nwords = (k + 7) / 8;
  for (int64_t w = 0; w < nwords; ++w) {
    uint64_t word = 0;
    int64_t base = w * 8;
    int64_t lim = std::min<int64_t>(8, k - base);
    for (int64_t j = 0; j < lim; ++j)
      word |= (uint64_t)codes[base + j] << (8 * j);
    h = (h ^ word) * FNV_PRIME;
  }
  return mix64(h) ^ mix64((uint64_t)k);
}

constexpr uint8_t COMPLEMENT[5] = {3, 2, 1, 0, 4};

struct TripleKey {
  uint64_t q, i;
  uint8_t t;
  bool operator==(const TripleKey& o) const { return q == o.q && i == o.i && t == o.t; }
};
struct TripleHash {
  size_t operator()(const TripleKey& k) const {
    return mix64(k.q ^ mix64(k.i) ^ (uint64_t)k.t * 0x9E3779B97F4A7C15ull);
  }
};

struct PairKey {
  uint64_t s, d;
  bool operator==(const PairKey& o) const { return s == o.s && d == o.d; }
};
struct PairHash {
  size_t operator()(const PairKey& k) const { return mix64(k.s ^ mix64(k.d)); }
};

}  // namespace

extern "C" {

// One pass over all sequences of a window.
//
// Inputs:
//   codes      concatenated uint8 base codes of all sequences
//   offsets    [n_seqs+1] int64 start offsets into codes
//   quals      concatenated uint8 quals (same layout; ref entry arbitrary)
//   labels     [n_seqs] uint8 (LABEL_REFERENCE=1? passed raw; ee filter
//              applies only where is_read[si] != 0)
//   is_read    [n_seqs] uint8 (0 for the reference sequence)
//   sample_idx [n_seqs] int32, tags [n_seqs] uint8, qhash [n_seqs] uint64
//   err_table  [256] double Phred->error-prob table
//   k, num_samples, min_node_cov, label_case (tag value of CASE)
//
// Outputs (caller-allocated; n_occ = total kmer occurrences upper-bounds
// n_uniq and n_edges):
//   occ_ids    [n_occ] uint64 (all occurrence ids, seq-major order)
//   u_first    [n_uniq] int64 global occurrence index of first occurrence
//   u_sign     [n_uniq] uint8, u_label [n_uniq] uint8 (of first occurrence)
//   u_counts   [n_uniq * num_samples] int64, u_role [n_uniq * 2] int64
//   u_survives [n_uniq] uint8
//   e_src/e_dst [n_edges] uint64 (unique consecutive pairs, sorted (s,d))
// Returns n_uniq; *out_n_edges gets the edge count. Returns -1 on error.
int64_t l2t_kmer_pass(
    const uint8_t* codes, const int64_t* offsets, const uint8_t* quals,
    const uint8_t* labels, const uint8_t* is_read, const int32_t* sample_idx,
    const uint8_t* tags, const uint64_t* qhash, const double* err_table,
    int64_t n_seqs, int64_t k, int64_t num_samples, int64_t min_node_cov,
    uint8_t label_case,
    uint64_t* occ_ids, int64_t* u_first, uint8_t* u_sign, uint8_t* u_label,
    int64_t* u_counts, int64_t* u_role, uint8_t* u_survives,
    uint64_t* e_src, uint64_t* e_dst, int64_t* out_n_edges) {
  if (k <= 0 || num_samples <= 0) return -1;

  // total occurrences
  int64_t n_occ = 0;
  for (int64_t si = 0; si < n_seqs; ++si) {
    int64_t len = offsets[si + 1] - offsets[si];
    if (len >= k) n_occ += len - k + 1;
  }

  std::unordered_map<uint64_t, int64_t> uid_of;  // id -> unique index
  uid_of.reserve((size_t)n_occ * 2);
  std::unordered_set<TripleKey, TripleHash> seen_triples;
  seen_triples.reserve((size_t)n_occ * 2);
  std::unordered_set<PairKey, PairHash> seen_pairs;
  seen_pairs.reserve((size_t)n_occ * 2);
  std::vector<PairKey> pairs;
  pairs.reserve(1024);

  std::vector<uint8_t> rc(k);
  std::vector<double> prefix;
  int64_t n_uniq = 0;
  int64_t occ = 0;

  for (int64_t si = 0; si < n_seqs; ++si) {
    int64_t lo = offsets[si], hi = offsets[si + 1];
    int64_t len = hi - lo;
    if (len < k) continue;
    int64_t m = len - k + 1;
    const uint8_t* seq = codes + lo;

    bool read = is_read[si] != 0;
    // prefix sums of error probs (sequential double adds, matching
    // np.cumsum + subtraction in graph.py:350-353 bit-for-bit)
    if (read) {
      prefix.resize(len + 1);
      prefix[0] = 0.0;
      const uint8_t* qrow = quals + lo;
      for (int64_t j = 0; j < len; ++j) prefix[j + 1] = prefix[j] + err_table[qrow[j]];
    }

    uint64_t prev_id = 0;
    for (int64_t p = 0; p < m; ++p, ++occ) {
      const uint8_t* fwd = seq + p;
      // canonicalize: first differing position decides; palindrome -> PLUS
      uint8_t sign = 0;
      const uint8_t* canon = fwd;
      for (int64_t j = 0; j < k; ++j) {
        uint8_t f = fwd[j];
        uint8_t r = COMPLEMENT[fwd[k - 1 - j] < 5 ? fwd[k - 1 - j] : 4];
        if (f != r) {
          if (f > r) {
            sign = 1;
            for (int64_t t = 0; t < k; ++t) rc[t] = COMPLEMENT[fwd[k - 1 - t] < 5 ? fwd[k - 1 - t] : 4];
            canon = rc.data();
          }
          break;
        }
      }
      uint64_t id = hash_kmer(canon, k);
      occ_ids[occ] = id;

      auto it = uid_of.find(id);
      int64_t ui;
      if (it == uid_of.end()) {
        ui = n_uniq++;
        uid_of.emplace(id, ui);
        u_first[ui] = occ;
        u_sign[ui] = sign;
        u_label[ui] = labels[si];
        for (int64_t s = 0; s < num_samples; ++s) u_counts[ui * num_samples + s] = 0;
        u_role[ui * 2] = 0;
        u_role[ui * 2 + 1] = 0;
      } else {
        ui = it->second;
      }

      if (read) {
        // expected-error filter: floor(sum of error probs in window) <= 0
        double window_err = prefix[p + k] - prefix[p];
        if (std::floor(window_err) <= 0.0) {
          TripleKey tk{qhash[si], id, tags[si]};
          if (seen_triples.insert(tk).second) {
            u_counts[ui * num_samples + sample_idx[si]] += 1;
            u_role[ui * 2 + (tags[si] == label_case ? 1 : 0)] += 1;
          }
        }
      }

      if (p > 0) {
        PairKey pk{prev_id, id};
        if (seen_pairs.insert(pk).second) pairs.push_back(pk);
      }
      prev_id = id;
    }
  }

  // survivor flags (graph.py:402-404)
  for (int64_t ui = 0; ui < n_uniq; ++ui) {
    const int64_t* c = u_counts + ui * num_samples;
    int64_t total = 0;
    bool any_pos = false, all_le1 = true;
    for (int64_t s = 0; s < num_samples; ++s) {
      total += c[s];
      if (c[s] > 0) any_pos = true;
      if (c[s] > 1) all_le1 = false;
    }
    bool all_singleton = any_pos && all_le1;
    u_survives[ui] = (!all_singleton && total >= min_node_cov) ? 1 : 0;
  }

  // edges sorted by (s, d) ascending — np.unique(structured) order
  std::sort(pairs.begin(), pairs.end(), [](const PairKey& a, const PairKey& b) {
    return a.s != b.s ? a.s < b.s : a.d < b.d;
  });
  for (size_t e = 0; e < pairs.size(); ++e) {
    e_src[e] = pairs[e].s;
    e_dst[e] = pairs[e].d;
  }
  *out_n_edges = (int64_t)pairs.size();
  return n_uniq;
}

// ---------------------------------------------------------------------------
// Dual-affine DP + traceback (ops/affine_dp.py parity)
// ---------------------------------------------------------------------------

namespace {

constexpr int64_t NEG_INF = -(1ll << 29);
constexpr uint8_t W_DIAG = 0, W_V1 = 1, W_V2 = 2, W_F1 = 3, W_F2 = 4;
constexpr int8_t OP_M = 0, OP_I = 1, OP_D = 2;

struct AlignScratch {
  std::vector<int64_t> H_prev, V1_prev, V2_prev, H_row, V1_row, V2_row, H_tmp;
  std::vector<uint8_t> dirs;  // Lq * Lt packed direction bytes
  std::vector<int8_t> ops;
};

// One pair. Returns score; fills t_start/t_end, cigar run arrays.
void align_one(const uint8_t* q, int64_t Lq, const uint8_t* t, int64_t Lt,
               int64_t match, int64_t mismatch, int64_t q1, int64_t e1,
               int64_t q2_in, int64_t e2_in, int dual, int free_ends,
               AlignScratch& S, int64_t* out_score, int64_t* out_tstart,
               int64_t* out_tend, int32_t* cigar_ops, int32_t* cigar_lens,
               int64_t max_cigar, int64_t* out_ncigar) {
  int64_t q2 = dual ? q2_in : q1, e2 = dual ? e2_in : e1;
  S.H_prev.assign(Lt + 1, 0);
  S.V1_prev.assign(Lt + 1, NEG_INF);
  S.V2_prev.assign(Lt + 1, NEG_INF);
  S.H_row.resize(Lt + 1);
  S.V1_row.resize(Lt + 1);
  S.V2_row.resize(Lt + 1);
  S.H_tmp.resize(Lt + 1);
  S.dirs.resize((size_t)Lq * Lt);

  if (!free_ends) {
    for (int64_t j = 1; j <= Lt; ++j) {
      int64_t d1 = -(q1 + e1 * j);
      int64_t d2 = dual ? -(q2 + e2 * j) : d1;
      S.H_prev[j] = std::max(d1, d2);
    }
  }

  for (int64_t i = 1; i <= Lq; ++i) {
    int64_t qi = q[i - 1];
    // column-0 H of this row (identical formula in both modes,
    // affine_dp.py:144-153)
    int64_t col0_h = -(q1 + e1 * i);
    if (dual) col0_h = std::max(col0_h, -(q2 + e2 * i));

    uint8_t* drow = S.dirs.data() + (size_t)(i - 1) * Lt;
    // first sweep: diag + vertical, H_tmp stored in H_row[1..Lt]
    for (int64_t j = 1; j <= Lt; ++j) {
      int64_t tj = t[j - 1];
      int64_t sub = (qi >= 4 || tj >= 4) ? 0 : (qi == tj ? match : -mismatch);
      int64_t diag = S.H_prev[j - 1] + sub;
      int64_t v1_open = S.H_prev[j] - (q1 + e1);
      int64_t v1_ext = S.V1_prev[j] - e1;
      int64_t v1 = std::max(v1_open, v1_ext);
      uint8_t bits = (v1_ext >= v1_open) ? (uint8_t)(1 << 3) : 0;
      int64_t v2 = NEG_INF;
      if (dual) {
        int64_t v2_open = S.H_prev[j] - (q2 + e2);
        int64_t v2_ext = S.V2_prev[j] - e2;
        v2 = std::max(v2_open, v2_ext);
        if (v2_ext >= v2_open) bits |= 1 << 4;
      }
      S.V1_row[j] = v1;
      S.V2_row[j] = v2;
      S.H_tmp[j] = std::max(diag, std::max(v1, v2));
      drow[j - 1] = bits;
    }

    // horizontal gaps: running max over C[k] = Htmp_full[k-1] + e*k
    // (Htmp_full[0] = col0_h), F[j] = run - (q+e) - e*(j-1) - e
    int64_t run1 = col0_h + e1;  // C1 at k=1
    int64_t run2 = col0_h + e2;
    int64_t prevF1 = 0, prevF2 = 0;
    for (int64_t j = 1; j <= Lt; ++j) {
      if (j > 1) {
        run1 = std::max(run1, S.H_tmp[j - 1] + e1 * j);
        if (dual) run2 = std::max(run2, S.H_tmp[j - 1] + e2 * j);
      }
      int64_t f1 = run1 - (q1 + e1) - e1 * (j - 1) - e1;
      int64_t f2 = dual ? run2 - (q2 + e2) - e2 * (j - 1) - e2 : NEG_INF;
      // extension bits use UNclamped F values (affine_dp.py:158-164)
      if (j > 1) {
        if (f1 == prevF1 - e1) drow[j - 1] |= 1 << 5;
        if (dual && f2 == prevF2 - e2) drow[j - 1] |= 1 << 6;
      }
      prevF1 = f1;
      prevF2 = f2;
      int64_t f1c = std::max(f1, NEG_INF);  // clamp (affine_dp.py:169)
      int64_t h = std::max(S.H_tmp[j], std::max(f1c, f2));
      // winner priority diag > V1 > V2 > F1 > F2 (>= comparisons vs final H)
      int64_t tj = t[j - 1];
      int64_t sub = (qi >= 4 || tj >= 4) ? 0 : (qi == tj ? match : -mismatch);
      int64_t diag = S.H_prev[j - 1] + sub;
      uint8_t winner = W_F2;
      if (f1c >= h) winner = W_F1;
      if (S.V2_row[j] >= h) winner = W_V2;
      if (S.V1_row[j] >= h) winner = W_V1;
      if (diag >= h) winner = W_DIAG;
      drow[j - 1] |= winner;
      S.H_row[j] = h;
    }

    S.H_row[0] = col0_h;
    S.V1_row[0] = NEG_INF;
    S.V2_row[0] = NEG_INF;
    std::swap(S.H_prev, S.H_row);
    std::swap(S.V1_prev, S.V1_row);
    std::swap(S.V2_prev, S.V2_row);
  }

  // score extraction
  int64_t t_end, score;
  if (free_ends) {
    t_end = 1;
    score = S.H_prev[1];
    for (int64_t j = 2; j <= Lt; ++j)
      if (S.H_prev[j] > score) { score = S.H_prev[j]; t_end = j; }
    if (Lt == 0) { t_end = 0; score = NEG_INF; }
  } else {
    t_end = Lt;
    score = S.H_prev[Lt];
  }

  // traceback (ops/affine_dp.py::traceback_batch parity)
  S.ops.clear();
  int64_t i = Lq, j = t_end;
  int8_t st = 0;
  while (i > 0) {
    uint8_t cell = S.dirs[(size_t)(i - 1) * Lt + (j > 0 ? j - 1 : 0)];
    uint8_t winner = cell & 0x7;
    int8_t eff = (st == 0) ? (int8_t)winner : st;
    bool at_j0 = (j == 0);
    int8_t emit;
    int64_t di = 0, dj = 0;
    if (at_j0 || eff == W_V1 || eff == W_V2) {
      emit = OP_I; di = 1;
    } else if (eff == W_DIAG) {
      emit = OP_M; di = 1; dj = 1;
    } else {  // F1/F2
      emit = OP_D; dj = 1;
    }
    int8_t nxt = 0;
    if (!at_j0) {
      if (eff == W_V1 && ((cell >> 3) & 1)) nxt = 1;
      else if (eff == W_V2 && ((cell >> 4) & 1)) nxt = 2;
      else if (eff == W_F1 && ((cell >> 5) & 1)) nxt = 3;
      else if (eff == W_F2 && ((cell >> 6) & 1)) nxt = 4;
    }
    S.ops.push_back(emit);
    i -= di;
    j -= dj;
    st = nxt;
  }
  // global mode: leading target prefix becomes a deletion run
  int64_t lead_del = (!free_ends && j > 0) ? j : 0;

  // run-length encode (ops are reversed: build from the back)
  int64_t nc = 0;
  int64_t t_span = 0;
  auto push = [&](int32_t op, int32_t len) {
    if (nc > 0 && cigar_ops[nc - 1] == op) {
      cigar_lens[nc - 1] += len;
    } else if (nc < max_cigar) {
      cigar_ops[nc] = op;
      cigar_lens[nc] = len;
      ++nc;
    }
    if (op == OP_M || op == OP_D) t_span += len;
  };
  if (lead_del > 0) push(OP_D, (int32_t)lead_del);
  for (auto it = S.ops.rbegin(); it != S.ops.rend(); ++it) push(*it, 1);

  *out_score = score;
  *out_tend = t_end;
  *out_tstart = free_ends ? t_end - t_span : 0;
  *out_ncigar = nc;
}

}  // namespace

// Batch API. queries [B, Lq] uint8 row-major (pad 5), q_lens [B] int64,
// targets [B, Lt], t_lens [B]. Outputs: scores/tstarts/tends [B] int64,
// cigar_ops/cigar_lens [B, max_cigar] int32, n_cigars [B] int64.
int64_t l2t_align_batch(
    const uint8_t* queries, const int64_t* q_lens, int64_t B, int64_t Lq,
    const uint8_t* targets, const int64_t* t_lens, int64_t Lt,
    int64_t match, int64_t mismatch, int64_t q1, int64_t e1, int64_t q2,
    int64_t e2, int dual, int free_ends,
    int64_t* scores, int64_t* tstarts, int64_t* tends,
    int32_t* cigar_ops, int32_t* cigar_lens, int64_t max_cigar,
    int64_t* n_cigars) {
  AlignScratch S;
  for (int64_t b = 0; b < B; ++b) {
    align_one(queries + b * Lq, q_lens[b], targets + b * Lt, t_lens[b],
              match, mismatch, q1, e1, q2, e2, dual, free_ends, S,
              scores + b, tstarts + b, tends + b,
              cigar_ops + b * max_cigar, cigar_lens + b * max_cigar,
              max_cigar, n_cigars + b);
  }
  return 0;
}

}  // extern "C"

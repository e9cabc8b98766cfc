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

// Open-addressing flat tables for the k-mer pass hot loops: the
// std::unordered_* equivalents spend most of their time in per-node heap
// allocations. Power-of-two capacity, linear probing; keys are avalanche-
// mixed 64-bit hashes already, remixed once per probe start.
struct FlatIdMap {
  std::vector<uint64_t> keys;
  std::vector<int64_t> vals;
  std::vector<uint8_t> used;
  size_t mask = 0;
  void init(size_t n) {
    size_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    keys.assign(cap, 0);
    vals.assign(cap, 0);
    used.assign(cap, 0);
    mask = cap - 1;
  }
  int64_t* find_or_insert(uint64_t id, bool* inserted) {
    size_t h = (size_t)mix64(id) & mask;
    while (used[h]) {
      if (keys[h] == id) { *inserted = false; return &vals[h]; }
      h = (h + 1) & mask;
    }
    used[h] = 1;
    keys[h] = id;
    *inserted = true;
    return &vals[h];
  }
  int64_t find(uint64_t id) const {
    size_t h = (size_t)mix64(id) & mask;
    while (used[h]) {
      if (keys[h] == id) return vals[h];
      h = (h + 1) & mask;
    }
    return -1;
  }
};

struct FlatTripleSet {
  std::vector<uint64_t> q, i;
  std::vector<uint8_t> t, used;
  size_t mask = 0;
  void init(size_t n) {
    size_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    q.assign(cap, 0);
    i.assign(cap, 0);
    t.assign(cap, 0);
    used.assign(cap, 0);
    mask = cap - 1;
  }
  bool insert(uint64_t qq, uint64_t ii, uint8_t tt) {
    size_t h = (size_t)mix64(
                   qq ^ mix64(ii) ^ (uint64_t)tt * 0x9E3779B97F4A7C15ull) &
               mask;
    while (used[h]) {
      if (q[h] == qq && i[h] == ii && t[h] == tt) return false;
      h = (h + 1) & mask;
    }
    used[h] = 1;
    q[h] = qq;
    i[h] = ii;
    t[h] = tt;
    return true;
  }
};

struct FlatPairSet {
  std::vector<uint64_t> s, d;
  std::vector<uint8_t> used;
  size_t mask = 0;
  void init(size_t n) {
    size_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    s.assign(cap, 0);
    d.assign(cap, 0);
    used.assign(cap, 0);
    mask = cap - 1;
  }
  bool insert(uint64_t ss, uint64_t dd) {
    size_t h = (size_t)mix64(ss ^ mix64(dd)) & mask;
    while (used[h]) {
      if (s[h] == ss && d[h] == dd) return false;
      h = (h + 1) & mask;
    }
    used[h] = 1;
    s[h] = ss;
    d[h] = dd;
    return true;
  }
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

  FlatIdMap uid_of;  // id -> unique index
  uid_of.init((size_t)n_occ);
  FlatTripleSet seen_triples;
  seen_triples.init((size_t)n_occ);
  FlatPairSet seen_pairs;
  seen_pairs.init((size_t)n_occ);
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

      bool inserted;
      int64_t* slot = uid_of.find_or_insert(id, &inserted);
      int64_t ui;
      if (inserted) {
        ui = n_uniq++;
        *slot = ui;
        u_first[ui] = occ;
        u_sign[ui] = sign;
        u_label[ui] = labels[si];
        for (int64_t s = 0; s < num_samples; ++s) u_counts[ui * num_samples + s] = 0;
        u_role[ui * 2] = 0;
        u_role[ui * 2 + 1] = 0;
      } else {
        ui = *slot;
      }

      if (read) {
        // expected-error filter: floor(sum of error probs in window) <= 0
        double window_err = prefix[p + k] - prefix[p];
        if (std::floor(window_err) <= 0.0) {
          if (seen_triples.insert(qhash[si], id, tags[si])) {
            u_counts[ui * num_samples + sample_idx[si]] += 1;
            u_role[ui * 2 + (tags[si] == label_case ? 1 : 0)] += 1;
          }
        }
      }

      if (p > 0) {
        if (seen_pairs.insert(prev_id, id)) pairs.push_back(PairKey{prev_id, id});
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
// band_w > 0 (global mode only) restricts each row to the parallelogram
// j - i in [min(0, Lt-Lq) - w, max(0, Lt-Lq) + w]. Any path leaving that
// band carries > w gap bases beyond the required length difference, so its
// score is <= match*min(Lq,Lt) - (w+1)*min_extend; when the banded optimum
// beats that bound the banded result (score AND traceback) is bit-identical
// to the full DP — the caller checks the certificate and falls back.
void align_one(const uint8_t* q, int64_t Lq, const uint8_t* t, int64_t Lt,
               int64_t match, int64_t mismatch, int64_t q1, int64_t e1,
               int64_t q2_in, int64_t e2_in, int dual, int free_ends,
               AlignScratch& S, int64_t* out_score, int64_t* out_tstart,
               int64_t* out_tend, int32_t* cigar_ops, int32_t* cigar_lens,
               int64_t max_cigar, int64_t* out_ncigar, int64_t band_w = 0) {
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

  const int64_t D = Lt - Lq;
  const int64_t blo_off = (D < 0 ? D : 0) - band_w;   // j - i lower bound
  const int64_t bhi_off = (D > 0 ? D : 0) + band_w;   // j - i upper bound

  for (int64_t i = 1; i <= Lq; ++i) {
    int64_t qi = q[i - 1];
    // column-0 H of this row (identical formula in both modes,
    // affine_dp.py:144-153)
    int64_t col0_h = -(q1 + e1 * i);
    if (dual) col0_h = std::max(col0_h, -(q2 + e2 * i));

    int64_t jlo = 1, jhi = Lt;
    if (band_w > 0) {
      jlo = std::max<int64_t>(1, i + blo_off);
      jhi = std::min<int64_t>(Lt, i + bhi_off);
    }

    uint8_t* drow = S.dirs.data() + (size_t)(i - 1) * Lt;
    // first sweep: diag + vertical, H_tmp stored in H_row[1..Lt]
    for (int64_t j = jlo; j <= jhi; ++j) {
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
    // banded: sources left of the band are NEG_INF (any path using them is
    // out-of-band; the caller's certificate covers it)
    int64_t run1 = (jlo == 1) ? col0_h + e1 : NEG_INF;  // C1 at k=1
    int64_t run2 = (jlo == 1) ? col0_h + e2 : NEG_INF;
    int64_t prevF1 = 0, prevF2 = 0;
    for (int64_t j = jlo; j <= jhi; ++j) {
      if (j > jlo) {
        run1 = std::max(run1, S.H_tmp[j - 1] + e1 * j);
        if (dual) run2 = std::max(run2, S.H_tmp[j - 1] + e2 * j);
      }
      int64_t f1 = run1 - (q1 + e1) - e1 * (j - 1) - e1;
      int64_t f2 = dual ? run2 - (q2 + e2) - e2 * (j - 1) - e2 : NEG_INF;
      // extension bits use UNclamped F values (affine_dp.py:158-164).
      // j > jlo (not j > 1): the first band column's left F is unknown —
      // an F-extension through it is out-of-band, certificate-covered.
      if (j > jlo) {
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
    if (band_w > 0 && jhi < Lt) {
      // next row's band extends one column right: it reads these cells
      S.H_row[jhi + 1] = NEG_INF;
      S.V1_row[jhi + 1] = NEG_INF;
      S.V2_row[jhi + 1] = NEG_INF;
    }
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

// ---------------------------------------------------------------------------
// Component prune pass (cbdg/graph.py::_prune_component parity)
// ---------------------------------------------------------------------------
//
// Exact port of the Python compress -> lowcov -> compress -> tips cascade
// (which itself mirrors reference graph.cpp:515-840). Iteration order,
// tie-breaks, edge-list mutation semantics, and the BCALM2 merge rules are
// replicated so the surviving node set is bit-identical (parity-tested in
// tests/test_native_prune.py). Used only on the fast path (no probe
// tracker, no per-stage DOT snapshots); Python remains the instrumented
// twin.

namespace {

constexpr uint8_t REVK[4] = {3, 1, 2, 0};
inline uint8_t rev_kind(uint8_t k) { return REVK[k]; }
inline uint8_t src_sign(uint8_t k) { return k >> 1; }
inline uint8_t dst_sign(uint8_t k) { return k & 1; }
inline uint8_t make_kind(uint8_t s, uint8_t d) { return (uint8_t)((s << 1) | d); }

struct PEdge {
  uint64_t dst;
  uint8_t kind;
  bool operator==(const PEdge& o) const { return dst == o.dst && kind == o.kind; }
};

struct PNode {
  uint64_t nid;
  std::vector<uint8_t> seq;
  uint8_t sign, label;
  std::vector<int64_t> counts;
  int64_t roles[2];
  std::vector<PEdge> edges;
  bool in_table = true;
};

struct PruneCtx {
  std::vector<PNode> nodes;                       // table order
  std::unordered_map<uint64_t, int32_t> idx;      // nid -> slot
  uint64_t source_id, sink_id;
  int64_t k, num_samples, min_node_cov;

  PNode* get(uint64_t nid) {
    auto it = idx.find(nid);
    if (it == idx.end()) return nullptr;
    PNode* n = &nodes[it->second];
    return n->in_table ? n : nullptr;
  }

  static bool has_self_loop(const PNode& n) {
    for (const auto& e : n.edges)
      if (e.dst == n.nid) return true;
    return false;
  }

  static uint8_t sign_for(const PNode& n, bool ordering_default) {
    return ordering_default ? n.sign : (uint8_t)(1 - n.sign);
  }

  static void edges_in_direction(const PNode& n, bool ordering_default,
                                 std::vector<PEdge>& out) {
    out.clear();
    uint8_t want = sign_for(n, ordering_default);
    for (const auto& e : n.edges)
      if (src_sign(e.kind) == want) out.push_back(e);
  }

  static void emplace_edge(PNode& n, PEdge e) {
    for (const auto& x : n.edges)
      if (x == e) return;
    n.edges.push_back(e);
  }

  static void erase_edge(PNode& n, PEdge e) {
    for (size_t i = 0; i < n.edges.size(); ++i)
      if (n.edges[i] == e) { n.edges.erase(n.edges.begin() + i); return; }
  }

  // merge_codes (cbdg/kmer.py): BCALM2 MergeCords
  static void merge_seq(std::vector<uint8_t>& a, const std::vector<uint8_t>& b,
                        uint8_t kind, int64_t k) {
    auto rc = [](const std::vector<uint8_t>& v) {
      std::vector<uint8_t> r(v.size());
      for (size_t i = 0; i < v.size(); ++i)
        r[i] = COMPLEMENT[v[v.size() - 1 - i] <= 4 ? v[v.size() - 1 - i] : 4];
      return r;
    };
    if (kind == 0) {  // PP: a + b[k-1:]
      a.insert(a.end(), b.begin() + (k - 1), b.end());
    } else if (kind == 1) {  // PM: a + revcomp(b)[k-1:]
      auto r = rc(b);
      a.insert(a.end(), r.begin() + (k - 1), r.end());
    } else if (kind == 2) {  // MP: revcomp(b)[:len(b)-k+1] + a
      auto r = rc(b);
      std::vector<uint8_t> out(r.begin(), r.begin() + ((int64_t)b.size() - k + 1));
      out.insert(out.end(), a.begin(), a.end());
      a = std::move(out);
    } else {  // MM: b[:len(b)-k+1] + a
      std::vector<uint8_t> out(b.begin(), b.begin() + ((int64_t)b.size() - k + 1));
      out.insert(out.end(), a.begin(), a.end());
      a = std::move(out);
    }
  }

  void merge_node(PNode& n, const PNode& o, uint8_t kind) {
    int64_t la = (int64_t)n.seq.size(), lb = (int64_t)o.seq.size();
    merge_seq(n.seq, o.seq, kind, k);
    n.label |= o.label;
    int64_t total = la + lb;
    for (int64_t s = 0; s < num_samples; ++s)
      n.counts[s] = (n.counts[s] * la + o.counts[s] * lb) / total;
    for (int i = 0; i < 2; ++i)
      n.roles[i] = (n.roles[i] * la + o.roles[i] * lb) / total;
  }

  bool is_potential_buddy_edge(const PNode& src, const PEdge& conn) {
    PNode* nbour = get(conn.dst);
    if (nbour == nullptr) return false;
    if (src.edges.size() == 1 && nbour->edges.size() == 1) {
      if (src.edges[0].dst == nbour->nid && nbour->edges[0].dst == src.nid)
        return false;
    }
    if (nbour->edges.size() > 2 || nbour->edges.empty() || has_self_loop(*nbour))
      return false;

    // expected = conn.mirror() as stored in nbour (src == nbour implied)
    PEdge expected{src.nid, rev_kind(conn.kind)};
    bool dir_default = src_sign(expected.kind) == nbour->sign;
    std::vector<PEdge> nb_edges;
    edges_in_direction(*nbour, dir_default, nb_edges);
    if (nb_edges.size() != 1 || !(nb_edges[0] == expected)) return false;

    std::vector<PEdge> opp;
    edges_in_direction(*nbour, !dir_default, opp);
    if (opp.size() != 1 || opp[0].dst == src.nid) return false;
    PNode* nnb = get(opp[0].dst);
    return nnb != nullptr && nnb->edges.size() <= 2;
  }

  // returns true + fills `out` when a compressible edge exists
  bool find_compressible_edge(const PNode& node, bool ordering_default, PEdge& out) {
    if (node.edges.size() > 2 || node.edges.empty() || has_self_loop(node))
      return false;
    if (node.nid == source_id || node.nid == sink_id) return false;
    std::vector<PEdge> mergeable;
    edges_in_direction(node, ordering_default, mergeable);
    if (mergeable.size() != 1) return false;
    PEdge cand = mergeable[0];
    if (cand.dst == source_id || cand.dst == sink_id) return false;
    if (get(cand.dst) == nullptr) return false;
    if (!is_potential_buddy_edge(node, cand)) return false;
    std::vector<PEdge> opp;
    edges_in_direction(node, !ordering_default, opp);
    if (opp.empty()) { out = cand; return true; }
    if (opp.size() > 1) return false;
    if (get(opp[0].dst) == nullptr || !is_potential_buddy_edge(node, opp[0]))
      return false;
    out = cand;
    return true;
  }

  void compress_node(int32_t ni, bool ordering_default,
                     std::unordered_set<uint64_t>& removed) {
    PNode& node = nodes[ni];
    PEdge edge;
    while (find_compressible_edge(node, ordering_default, edge)) {
      PNode& buddy = nodes[idx[edge.dst]];
      merge_node(node, buddy, edge.kind);
      erase_edge(node, edge);

      uint8_t rev_src = (uint8_t)(1 - src_sign(edge.kind));
      PEdge edge_mirror_in_buddy{node.nid, rev_kind(edge.kind)};
      for (const auto& b2n : buddy.edges) {
        if (b2n == edge_mirror_in_buddy) continue;
        PNode* nb = &nodes[idx[b2n.dst]];
        uint8_t ne_src =
            (dst_sign(edge.kind) != src_sign(b2n.kind)) ? rev_src
                                                        : src_sign(edge.kind);
        PEdge new_edge{b2n.dst, make_kind(ne_src, dst_sign(b2n.kind))};
        emplace_edge(node, new_edge);
        // mirror of (node -> b2n.dst) stored in nb
        emplace_edge(*nb, PEdge{node.nid, rev_kind(new_edge.kind)});
        erase_edge(*nb, PEdge{buddy.nid, rev_kind(b2n.kind)});
      }
      removed.insert(edge.dst);
      buddy.edges.clear();
    }
  }

  void remove_node(uint64_t nid) {
    auto it = idx.find(nid);
    if (it == idx.end() || !nodes[it->second].in_table) return;
    PNode& node = nodes[it->second];
    for (const auto& e : node.edges) {
      if (e.dst == nid) continue;  // self-loop
      PNode* nb = get(e.dst);
      if (nb != nullptr) erase_edge(*nb, PEdge{nid, rev_kind(e.kind)});
    }
    node.in_table = false;
    node.edges.clear();
  }

  void compress_graph() {
    std::unordered_set<uint64_t> removed;
    for (size_t i = 0; i < nodes.size(); ++i) {  // snapshot of table keys
      PNode& node = nodes[i];
      if (!node.in_table || removed.count(node.nid)) continue;
      compress_node((int32_t)i, true, removed);
      compress_node((int32_t)i, false, removed);
    }
    for (uint64_t nid : removed) {
      // batch delete: edges already cleared; mirrors already rewired
      nodes[idx[nid]].in_table = false;
    }
  }

  void remove_low_cov() {
    std::vector<uint64_t> to_remove;
    for (const auto& node : nodes) {
      if (!node.in_table || node.nid == source_id || node.nid == sink_id)
        continue;
      int64_t total = 0;
      bool any_pos = false, all_le1 = true;
      for (int64_t s = 0; s < num_samples; ++s) {
        total += node.counts[s];
        if (node.counts[s] > 0) any_pos = true;
        if (node.counts[s] > 1) all_le1 = false;
      }
      bool all_singleton = any_pos && all_le1;
      if (all_singleton || total < min_node_cov) to_remove.push_back(node.nid);
    }
    for (uint64_t nid : to_remove) remove_node(nid);
  }

  void remove_tips() {
    size_t current = 1;
    while (current > 0) {
      std::vector<uint64_t> to_remove;
      for (const auto& node : nodes) {
        if (!node.in_table || node.nid == source_id || node.nid == sink_id ||
            node.edges.size() > 1)
          continue;
        int64_t uniq_len = (int64_t)node.seq.size() - k + 1;
        if (uniq_len >= k) continue;
        to_remove.push_back(node.nid);
      }
      for (uint64_t nid : to_remove) remove_node(nid);
      if (!to_remove.empty()) compress_graph();
      current = to_remove.size();
    }
  }
};

// ---------------------------------------------------------------------------
// Haplotype enumeration (cbdg/{traversal,max_flow,complexity}.py parity)
// ---------------------------------------------------------------------------
// Exact ports of the Python post-prune stages so the fast path never
// materializes Python node objects: CSR traversal index, 3-color cycle DFS,
// complexity guard metrics (Welford op-order replicated), and the
// confidence-ordered BFS walk enumeration (reference: cbdg/max_flow.cpp).
// Outputs are raw per-hap arrays; Path stats/sort/dedup stay in Python on
// the returned arrays, so downstream float semantics are unchanged.

struct OnlineStatsC {
  // Welford, same op order as base/stats.py::OnlineStats.add
  int64_t n = 0;
  double m1 = 0.0, m2 = 0.0;
  void add(double v) {
    int64_t old_n = n;
    n += 1;
    double delta = v - m1;
    double norm = delta / (double)n;
    m1 += norm;
    m2 += delta * norm * (double)old_n;
  }
  bool empty() const { return n == 0; }
  double stddev() const {
    return n < 2 ? 0.0 : std::sqrt(m2 / (double)(n - 1));
  }
};

inline int64_t node_support(const PNode& n) {
  int64_t t = 0;
  for (int64_t c : n.counts) t += c;
  return t;
}

// cbdg/graph.py::Node.confidence parity (incl. int() truncation)
inline int64_t node_confidence(const PNode& n, int64_t num_samples,
                               uint8_t label_ref) {
  int64_t total = 0, confirming = 0;
  bool any_pos = false, all_le1 = true;
  for (int64_t c : n.counts) {
    total += c;
    if (c > 0) { any_pos = true; ++confirming; }
    if (c > 1) all_le1 = false;
  }
  if (any_pos && all_le1) return 1;
  if (total == 0) return 0;
  double conc = (double)confirming /
                (double)std::max<int64_t>(num_samples, 1);
  int64_t base = (int64_t)((double)total * conc);
  return base + ((n.label & label_ref) ? 1 : 0);
}

// base/stats.py::median_u32 parity (values are nonnegative)
inline int64_t median_i64(std::vector<int64_t> v) {
  if (v.empty()) return 0;
  if (v.size() == 1) return v[0];
  std::sort(v.begin(), v.end());
  size_t half = v.size() / 2;
  if (v.size() % 2 == 1) return v[half];
  return (v[half] + v[half - 1]) / 2;
}

struct TravC {
  std::vector<int32_t> slot_of_flat;  // flat node -> PruneCtx slot
  std::vector<int64_t> adj_start, adj_cnt;
  std::vector<int64_t> adj_dst_state, adj_ordinal;
  struct OEdge { int32_t src_flat, dst_flat; uint8_t kind; };
  std::vector<OEdge> orig;
  int64_t src_state = 0;
  int64_t snk_flat = 0;
};

// cbdg/traversal.py::build_traversal_index parity: flat order = alive
// members in table order; adjacency fill order = per-node edge-list order;
// ordinals sequential in encounter order (each directed edge is unique).
bool build_trav(PruneCtx& ctx, const std::vector<int32_t>& mem_alive,
                uint64_t source_id, uint64_t sink_id, TravC& tv) {
  std::unordered_map<uint64_t, int32_t> flat_of;
  flat_of.reserve(mem_alive.size() * 2);
  tv.slot_of_flat = mem_alive;
  for (size_t f = 0; f < mem_alive.size(); ++f)
    flat_of.emplace(ctx.nodes[mem_alive[f]].nid, (int32_t)f);
  int64_t ns = 2 * (int64_t)mem_alive.size();
  std::vector<int64_t> counts(ns, 0);
  for (size_t f = 0; f < mem_alive.size(); ++f) {
    const PNode& node = ctx.nodes[mem_alive[f]];
    for (const auto& e : node.edges) {
      if (!flat_of.count(e.dst)) continue;
      counts[2 * f + src_sign(e.kind)] += 1;
    }
  }
  tv.adj_start.assign(ns, 0);
  tv.adj_cnt.assign(ns, 0);
  int64_t total = 0;
  for (int64_t s = 0; s < ns; ++s) { tv.adj_start[s] = total; total += counts[s]; }
  tv.adj_dst_state.assign(total, 0);
  tv.adj_ordinal.assign(total, 0);
  tv.orig.clear();
  for (size_t f = 0; f < mem_alive.size(); ++f) {
    const PNode& node = ctx.nodes[mem_alive[f]];
    for (const auto& e : node.edges) {
      auto it = flat_of.find(e.dst);
      if (it == flat_of.end()) continue;
      int64_t ss = 2 * (int64_t)f + src_sign(e.kind);
      int64_t ds = 2 * (int64_t)it->second + dst_sign(e.kind);
      int64_t ordinal = (int64_t)tv.orig.size();
      tv.orig.push_back(TravC::OEdge{(int32_t)f, it->second, e.kind});
      tv.adj_dst_state[tv.adj_start[ss] + tv.adj_cnt[ss]] = ds;
      tv.adj_ordinal[tv.adj_start[ss] + tv.adj_cnt[ss]] = ordinal;
      tv.adj_cnt[ss] += 1;
    }
  }
  auto si = flat_of.find(source_id);
  auto ki = flat_of.find(sink_id);
  if (si == flat_of.end() || ki == flat_of.end()) return false;
  tv.src_state = 2 * (int64_t)si->second +
                 ctx.nodes[mem_alive[si->second]].sign;
  tv.snk_flat = ki->second;
  return true;
}

// cbdg/traversal.py::has_cycle parity (iterative 3-color DFS)
bool trav_has_cycle(const TravC& tv) {
  int64_t ns = (int64_t)tv.adj_start.size();
  if (ns == 0) return false;
  std::vector<uint8_t> color(ns, 0);  // 0 white, 1 gray, 2 black
  std::vector<std::pair<int64_t, int64_t>> stack;
  color[tv.src_state] = 1;
  stack.push_back({tv.src_state, 0});
  while (!stack.empty()) {
    auto& fr = stack.back();
    int64_t state = fr.first;
    if (fr.second >= tv.adj_cnt[state]) {
      color[state] = 2;
      stack.pop_back();
      continue;
    }
    int64_t dst = tv.adj_dst_state[tv.adj_start[state] + fr.second];
    fr.second += 1;
    if (color[dst] == 1) return true;
    if (color[dst] != 0) continue;
    color[dst] = 1;
    stack.push_back({dst, 0});
  }
  return false;
}

struct GCplxC {
  int64_t cc = 0, bp = 0, maxdeg = 0;
  double unitig_ratio = 0.0, cov_cv = 0.0, tip_ratio = 0.0;
  bool is_complex() const { return cc >= 50 && bp >= 50; }
};

// cbdg/complexity.py::compute_component_complexity parity (node order =
// alive members in table order, matching the Python dict iteration)
GCplxC compute_complexity(PruneCtx& ctx, const std::vector<int32_t>& mem) {
  GCplxC out;
  int64_t num_nodes = 0, num_edges = 0, unitig_nodes = 0;
  OnlineStatsC cov_stats, tip_stats, unitig_stats;
  for (int32_t slot : mem) {
    const PNode& node = ctx.nodes[slot];
    ++num_nodes;
    uint8_t dflt_sign = node.sign;
    int64_t dflt = 0;
    for (const auto& e : node.edges)
      if (src_sign(e.kind) == dflt_sign) ++dflt;
    int64_t oppo = (int64_t)node.edges.size() - dflt;
    num_edges += dflt + oppo;
    out.maxdeg = std::max(out.maxdeg, std::max(dflt, oppo));
    if (dflt >= 2 || oppo >= 2) out.bp += 1;
    if (dflt == 1 && oppo == 1) ++unitig_nodes;
    double cov = (double)node_support(node);
    cov_stats.add(cov);
    if (dflt == 0 || oppo == 0) tip_stats.add(cov);
    else if (dflt == 1 && oppo == 1) unitig_stats.add(cov);
  }
  num_edges /= 2;
  out.cc = num_edges >= num_nodes ? num_edges - num_nodes + 1 : 0;
  out.unitig_ratio = num_nodes ? (double)unitig_nodes / (double)num_nodes : 0.0;
  if (!cov_stats.empty() && cov_stats.m1 > 0.0)
    out.cov_cv = cov_stats.stddev() / cov_stats.m1;
  if (!tip_stats.empty() && !unitig_stats.empty() && unitig_stats.m1 > 0.0)
    out.tip_ratio = tip_stats.m1 / unitig_stats.m1;
  return out;
}

// cbdg/max_flow.py::MaxFlow parity: arena BFS, stable confidence-descending
// branch expansion (untraversed first), 2^20 visit cap.
struct WalkEnumC {
  const TravC& tv;
  PruneCtx& ctx;
  std::vector<uint8_t> traversed;
  std::vector<int64_t> conf;
  bool hit_limit = false;
  struct A { int64_t ordinal, dst_state, parent, score; };
  std::vector<A> arena;
  std::vector<int64_t> frontier;
  std::vector<std::pair<int64_t, int64_t>> outs;

  WalkEnumC(const TravC& t, PruneCtx& c, int64_t num_samples,
            uint8_t label_ref)
      : tv(t), ctx(c) {
    traversed.assign(tv.orig.size(), 0);
    conf.resize(tv.slot_of_flat.size());
    for (size_t f = 0; f < tv.slot_of_flat.size(); ++f)
      conf[f] =
          node_confidence(ctx.nodes[tv.slot_of_flat[f]], num_samples, label_ref);
  }

  void enqueue(int64_t state, int64_t parent_ai, int64_t parent_score) {
    int64_t cnt = tv.adj_cnt[state];
    if (cnt == 0) return;
    outs.clear();
    int64_t st = tv.adj_start[state];
    for (int64_t i = 0; i < cnt; ++i)
      outs.push_back({tv.adj_dst_state[st + i], tv.adj_ordinal[st + i]});
    std::stable_sort(outs.begin(), outs.end(),
                     [&](const std::pair<int64_t, int64_t>& a,
                         const std::pair<int64_t, int64_t>& b) {
                       return conf[a.first / 2] > conf[b.first / 2];
                     });
    for (const auto& o : outs) {
      if (traversed[o.second]) continue;
      arena.push_back(A{o.second, o.first, parent_ai, parent_score + 1});
      frontier.push_back((int64_t)arena.size() - 1);
    }
    for (const auto& o : outs) {
      if (!traversed[o.second]) continue;
      arena.push_back(A{o.second, o.first, parent_ai, parent_score});
      frontier.push_back((int64_t)arena.size() - 1);
    }
  }

  bool next_path(std::vector<int64_t>& walk) {
    arena.clear();
    frontier.clear();
    size_t fhead = 0;
    enqueue(tv.src_state, -1, 0);
    int64_t nvisits = 0, best = -1;
    while (fhead < frontier.size()) {
      ++nvisits;
      if (nvisits > (1ll << 20)) { hit_limit = true; break; }
      int64_t ai = frontier[fhead++];
      A a = arena[ai];
      if (a.dst_state / 2 == tv.snk_flat) {
        if (a.score == 0) continue;
        best = ai;
        break;
      }
      enqueue(a.dst_state, ai, a.score);
    }
    if (best < 0) return false;
    walk.clear();
    for (int64_t ai = best; ai != -1; ai = arena[ai].parent) {
      walk.push_back(arena[ai].ordinal);
      traversed[arena[ai].ordinal] = 1;
    }
    std::reverse(walk.begin(), walk.end());
    return true;
  }
};

// cbdg/max_flow.py::MaxFlow._build_sequence parity; appends one hap's
// sequence / node coverages / run-length weights to the flat outputs.
// Returns false on output-capacity overflow.
bool emit_hap(PruneCtx& ctx, const TravC& tv, const std::vector<int64_t>& walk,
              int64_t k, const std::vector<int64_t>& conf, int64_t comp_ord,
              int32_t* h_comp, uint8_t* h_seq, int64_t* h_seq_off,
              int64_t* h_cov, int64_t* h_wt_w, int64_t* h_wt_n,
              int64_t* h_cov_off, int64_t* n_haps, int64_t* seq_pos,
              int64_t* cov_pos, int64_t cap_haps, int64_t cap_hseq,
              int64_t cap_hcov) {
  if (walk.empty()) return true;
  if (*n_haps >= cap_haps) return false;
  const auto& first = tv.orig[walk[0]];
  const PNode& src = ctx.nodes[tv.slot_of_flat[first.src_flat]];
  int64_t slen = (int64_t)src.seq.size();
  int64_t sp = *seq_pos, cp = *cov_pos;
  if (sp + slen > cap_hseq || cp + 1 + (int64_t)walk.size() > cap_hcov)
    return false;
  if (src_sign(first.kind) == 0) {
    std::memcpy(h_seq + sp, src.seq.data(), (size_t)slen);
  } else {
    for (int64_t i = 0; i < slen; ++i) {
      uint8_t b = src.seq[slen - 1 - i];
      h_seq[sp + i] = COMPLEMENT[b <= 4 ? b : 4];
    }
  }
  sp += slen;
  h_cov[cp] = node_support(src);
  h_wt_w[cp] = conf[first.src_flat];
  h_wt_n[cp] = slen;
  ++cp;
  for (size_t wi = 0; wi < walk.size(); ++wi) {
    const auto& conn = tv.orig[walk[wi]];
    const PNode& dstn = ctx.nodes[tv.slot_of_flat[conn.dst_flat]];
    int64_t dl = (int64_t)dstn.seq.size();
    int64_t ul = dl - (k - 1);
    if (sp + ul > cap_hseq) return false;
    if (dst_sign(conn.kind) == 0) {
      std::memcpy(h_seq + sp, dstn.seq.data() + (k - 1), (size_t)ul);
    } else {
      // revcomp(dseq)[k-1:] — element i complements dseq[dl-1-(k-1+i)]
      for (int64_t i = 0; i < ul; ++i) {
        uint8_t b = dstn.seq[dl - 1 - (k - 1 + i)];
        h_seq[sp + i] = COMPLEMENT[b <= 4 ? b : 4];
      }
    }
    sp += ul;
    h_cov[cp] = node_support(dstn);
    h_wt_w[cp] = conf[conn.dst_flat];
    h_wt_n[cp] = ul;
    ++cp;
  }
  h_comp[*n_haps] = (int32_t)comp_ord;
  *n_haps += 1;
  h_seq_off[*n_haps] = sp;
  h_cov_off[*n_haps] = cp;
  *seq_pos = sp;
  *cov_pos = cp;
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// Fused assemble pass: build + lowcov + components + anchors + prune
// ---------------------------------------------------------------------------
//
// One call per (window, k) attempt on the fast path (no probe tracker, no
// graph snapshots): the k-mer pass feeds survivor nodes straight into
// component marking, ref-anchor selection, and the per-component prune
// cascade — Python materializes ONLY the final pruned nodes (hundreds, not
// the pre-prune tens of thousands). Mirrors cbdg/graph.py
// build_component_results phases 1-4 (reference: graph.cpp:106-235).
//
// Outputs are flat survivor arrays grouped by PASSING component in
// size-descending component order (the reference's processing order), with
// per-component source/sink ids and ref anchor offsets. Within a
// component, nodes keep first-occurrence order (the Python table order
// downstream traversal indexing depends on).

static int64_t assemble_impl(
    // sequences (same layout as l2t_kmer_pass)
    const uint8_t* codes, const int64_t* offsets, const uint8_t* quals,
    const uint8_t* labels, const uint8_t* is_read, const int32_t* sample_idx,
    const uint8_t* tags, const uint64_t* qhash, const double* err_table,
    int64_t n_seqs, int64_t k, int64_t num_samples, int64_t min_node_cov,
    uint8_t label_case, uint8_t label_ref,
    int64_t min_anchor_cov, int64_t min_anchor_len,
    // outputs: per surviving node (compacted, comp-grouped)
    uint64_t* out_nid, uint8_t* out_seq, int64_t* out_seq_off,
    uint8_t* out_sign, uint8_t* out_label, int64_t* out_counts,
    int64_t* out_roles, int32_t* out_comp,
    uint64_t* out_e_dst, uint8_t* out_e_kind, int64_t* out_e_off,
    // outputs: per passing component
    uint64_t* out_c_source, uint64_t* out_c_sink,
    int64_t* out_c_src_off, int64_t* out_c_anchor_len, int32_t* out_c_id,
    int64_t* out_n_comps,
    // capacities
    int64_t cap_nodes, int64_t cap_seq, int64_t cap_edges, int64_t cap_comps,
    // optional haplotype-enumeration outputs (all null => prune-only pass).
    // c_metrics f64[cap_comps*6] = cc, bp, maxdeg, unitig_ratio, cov_cv,
    // tip_ratio; out_retry 1 => a cycle/complexity guard fired (caller
    // retries at the next k, every other output is void).
    double* c_metrics, int64_t* c_ref_weight, uint8_t* c_limit,
    int32_t* h_comp, uint8_t* h_seq, int64_t* h_seq_off,
    int64_t* h_cov, int64_t* h_wt_w, int64_t* h_wt_n, int64_t* h_cov_off,
    int64_t* out_n_haps, int64_t* out_retry,
    int64_t cap_haps, int64_t cap_hseq, int64_t cap_hcov) {
  const bool enumerate = h_comp != nullptr;
  if (enumerate) {
    *out_n_haps = 0;
    *out_retry = 0;
    h_seq_off[0] = 0;
    h_cov_off[0] = 0;
  }
  // ---- phase 1: k-mer pass (occurrence scan, counts, survivor flags) ----
  int64_t n_occ = 0;
  for (int64_t si = 0; si < n_seqs; ++si) {
    int64_t len = offsets[si + 1] - offsets[si];
    if (len >= k) n_occ += len - k + 1;
  }
  if (n_occ == 0) { *out_n_comps = 0; return 0; }

  struct UNode {
    uint64_t nid;
    int32_t first_si;
    int32_t first_pos;
    uint8_t sign, label;
    int64_t roles[2] = {0, 0};
  };
  std::vector<UNode> uniq;
  uniq.reserve(1 << 14);
  std::vector<int64_t> counts_flat;  // [n_uniq * num_samples]
  counts_flat.reserve((size_t)(1 << 14) * num_samples);
  FlatIdMap uid_of;
  uid_of.init((size_t)n_occ);
  FlatTripleSet seen_triples;
  seen_triples.init((size_t)n_occ);
  FlatPairSet seen_pairs;
  seen_pairs.init((size_t)n_occ);
  std::vector<PairKey> pairs;
  pairs.reserve(4096);
  std::vector<uint64_t> ref_node_ids;  // ref path in kmer order

  std::vector<uint8_t> rc(k);
  std::vector<double> prefix;
  std::vector<uint64_t> ids_buf;
  std::vector<uint8_t> signs_buf;

  for (int64_t si = 0; si < n_seqs; ++si) {
    int64_t lo = offsets[si], hi = offsets[si + 1];
    int64_t len = hi - lo;
    if (len < k) continue;
    int64_t m = len - k + 1;
    const uint8_t* seq = codes + lo;
    bool read = is_read[si] != 0;
    bool is_ref_seq = labels[si] == label_ref;
    if (read) {
      prefix.resize(len + 1);
      prefix[0] = 0.0;
      const uint8_t* qrow = quals + lo;
      for (int64_t j = 0; j < len; ++j)
        prefix[j + 1] = prefix[j] + err_table[qrow[j]];
    }
    // Pass A: canonical ids/signs for the whole sequence (pure compute, no
    // table traffic). Pass B then walks the three hash tables with the
    // NEXT positions' slots software-prefetched — the occurrence loop is
    // memory-latency-bound on ~6 dependent random loads per position
    // (measured 88% of the whole native assemble cost), and the id stream
    // is the only input the probe addresses need.
    ids_buf.resize(m);
    signs_buf.resize(m);
    for (int64_t p = 0; p < m; ++p) {
      const uint8_t* fwd = seq + p;
      uint8_t sign = 0;
      const uint8_t* canon = fwd;
      for (int64_t j = 0; j < k; ++j) {
        uint8_t f = fwd[j];
        uint8_t r = COMPLEMENT[fwd[k - 1 - j] < 5 ? fwd[k - 1 - j] : 4];
        if (f != r) {
          if (f > r) {
            sign = 1;
            for (int64_t t = 0; t < k; ++t)
              rc[t] = COMPLEMENT[fwd[k - 1 - t] < 5 ? fwd[k - 1 - t] : 4];
            canon = rc.data();
          }
          break;
        }
      }
      ids_buf[p] = hash_kmer(canon, k);
      signs_buf[p] = sign;
    }
    const uint64_t tag_mix =
        (uint64_t)tags[si] * 0x9E3779B97F4A7C15ull;
    const uint64_t qh_si = qhash[si];
    constexpr int64_t PF = 8;
    uint64_t prev_id = 0;
    for (int64_t p = 0; p < m; ++p) {
      if (p + PF < m) {
        uint64_t nid = ids_buf[p + PF];
        size_t h1 = (size_t)mix64(nid) & uid_of.mask;
        __builtin_prefetch(&uid_of.used[h1]);
        __builtin_prefetch(&uid_of.keys[h1]);
        size_t h3 =
            (size_t)mix64(ids_buf[p + PF - 1] ^ mix64(nid)) & seen_pairs.mask;
        __builtin_prefetch(&seen_pairs.used[h3]);
        __builtin_prefetch(&seen_pairs.s[h3]);
        if (read) {
          size_t h2 = (size_t)mix64(qh_si ^ mix64(nid) ^ tag_mix) &
                      seen_triples.mask;
          __builtin_prefetch(&seen_triples.used[h2]);
          __builtin_prefetch(&seen_triples.q[h2]);
        }
      }
      uint64_t id = ids_buf[p];
      uint8_t sign = signs_buf[p];
      if (is_ref_seq) ref_node_ids.push_back(id);

      bool inserted;
      int64_t* slot = uid_of.find_or_insert(id, &inserted);
      int64_t ui;
      if (inserted) {
        ui = (int64_t)uniq.size();
        *slot = ui;
        uniq.push_back(UNode());
        UNode& u = uniq.back();
        u.nid = id;
        u.first_si = (int32_t)si;
        u.first_pos = (int32_t)p;
        u.sign = sign;
        u.label = labels[si];
        counts_flat.resize(counts_flat.size() + num_samples, 0);
      } else {
        ui = *slot;
      }

      if (read) {
        double window_err = prefix[p + k] - prefix[p];
        if (std::floor(window_err) <= 0.0) {
          if (seen_triples.insert(qhash[si], id, tags[si])) {
            counts_flat[ui * num_samples + sample_idx[si]] += 1;
            uniq[ui].roles[tags[si] == label_case ? 1 : 0] += 1;
          }
        }
      }
      if (p > 0) {
        if (seen_pairs.insert(prev_id, id)) pairs.push_back(PairKey{prev_id, id});
      }
      prev_id = id;
    }
  }

  // ---- survivors (RemoveLowCovNodes(0) folded in) -----------------------
  // Python materializes in first-occurrence order via a stable argsort of
  // first_idx; our insertion order IS first-occurrence order already.
  std::vector<int64_t> surv_slot(uniq.size(), -1);
  PruneCtx ctx;
  ctx.k = k;
  ctx.num_samples = num_samples;
  ctx.min_node_cov = min_node_cov;
  ctx.nodes.reserve(uniq.size() / 4);
  for (size_t ui = 0; ui < uniq.size(); ++ui) {
    const UNode& u = uniq[ui];
    const int64_t* uc = counts_flat.data() + ui * num_samples;
    int64_t total = 0;
    bool any_pos = false, all_le1 = true;
    for (int64_t s = 0; s < num_samples; ++s) {
      total += uc[s];
      if (uc[s] > 0) any_pos = true;
      if (uc[s] > 1) all_le1 = false;
    }
    bool all_singleton = any_pos && all_le1;
    if (all_singleton || total < min_node_cov) continue;
    surv_slot[ui] = (int64_t)ctx.nodes.size();
    ctx.nodes.push_back(PNode());
    PNode& n = ctx.nodes.back();
    n.nid = u.nid;
    const uint8_t* fwd = codes + offsets[u.first_si] + u.first_pos;
    n.seq.resize(k);
    if (u.sign == 0) {
      std::memcpy(n.seq.data(), fwd, (size_t)k);
    } else {
      for (int64_t t = 0; t < k; ++t)
        n.seq[t] = COMPLEMENT[fwd[k - 1 - t] < 5 ? fwd[k - 1 - t] : 4];
    }
    n.sign = u.sign;
    n.label = u.label;
    n.counts.assign(uc, uc + num_samples);
    n.roles[0] = u.roles[0];
    n.roles[1] = u.roles[1];
    ctx.idx.emplace(n.nid, (int32_t)surv_slot[ui]);
  }

  // ---- edges among survivors (sorted (s, d), Python np.unique order) ----
  std::sort(pairs.begin(), pairs.end(), [](const PairKey& a, const PairKey& b) {
    return a.s != b.s ? a.s < b.s : a.d < b.d;
  });
  for (const auto& pk : pairs) {
    auto si_ = ctx.idx.find(pk.s);
    auto di_ = ctx.idx.find(pk.d);
    if (si_ == ctx.idx.end() || di_ == ctx.idx.end()) continue;
    PNode& sn = ctx.nodes[si_->second];
    PNode& dn = ctx.nodes[di_->second];
    uint8_t kind = make_kind(sn.sign, dn.sign);
    PruneCtx::emplace_edge(sn, PEdge{pk.d, kind});
    PruneCtx::emplace_edge(dn, PEdge{pk.s, rev_kind(kind)});
  }

  // ---- connected components (table-order BFS, then size-desc) -----------
  std::vector<int32_t> comp_of(ctx.nodes.size(), 0);
  std::vector<std::pair<int32_t, int64_t>> comp_sizes;  // (comp_id, n_nodes)
  int32_t current = 0;
  std::vector<int32_t> stack;
  for (size_t i = 0; i < ctx.nodes.size(); ++i) {
    if (comp_of[i] != 0) continue;
    ++current;
    int64_t count = 0;
    stack.push_back((int32_t)i);
    while (!stack.empty()) {
      int32_t cur = stack.back();
      stack.pop_back();
      if (comp_of[cur] != 0) continue;
      comp_of[cur] = current;
      ++count;
      for (const auto& e : ctx.nodes[cur].edges) {
        auto it = ctx.idx.find(e.dst);
        if (it != ctx.idx.end() && comp_of[it->second] == 0)
          stack.push_back(it->second);
      }
    }
    comp_sizes.emplace_back(current, count);
  }
  std::stable_sort(comp_sizes.begin(), comp_sizes.end(),
                   [](auto const& a, auto const& b) { return a.second > b.second; });

  // ---- per component: anchors + prune -----------------------------------
  int64_t n_out_nodes = 0, seq_pos = 0, edge_pos = 0, n_comps = 0;
  out_seq_off[0] = 0;
  out_e_off[0] = 0;
  for (auto const& [comp_id, comp_n] : comp_sizes) {
    // find_source / find_sink over the ref path
    int64_t src_off = -1, sink_off = -1;
    uint64_t src_id = 0, sink_id = 0;
    for (size_t ri = 0; ri < ref_node_ids.size(); ++ri) {
      auto it = ctx.idx.find(ref_node_ids[ri]);
      if (it == ctx.idx.end() || !ctx.nodes[it->second].in_table) continue;
      const PNode& n = ctx.nodes[it->second];
      if (comp_of[it->second] != comp_id) continue;
      int64_t total = 0;
      for (int64_t s = 0; s < num_samples; ++s) total += n.counts[s];
      if (total < min_anchor_cov) continue;
      if (src_off < 0) { src_off = (int64_t)ri; src_id = n.nid; }
      sink_off = (int64_t)ri;
      sink_id = n.nid;
    }
    if (src_off < 0 || sink_off < 0 || src_id == sink_id) continue;
    int64_t anchor_len = sink_off - src_off + k;
    if (anchor_len < min_anchor_len) continue;

    ctx.source_id = src_id;
    ctx.sink_id = sink_id;
    // prune THIS component only: temporarily hide other comps
    // (PruneCtx operates on in_table; comp filtering via a scoped vector)
    std::vector<int32_t> members;
    for (size_t i = 0; i < ctx.nodes.size(); ++i)
      if (ctx.nodes[i].in_table && comp_of[i] == comp_id)
        members.push_back((int32_t)i);
    // run the cascade restricted to members: reuse PruneCtx but guard by
    // comp: compress/lowcov/tips iterate all table nodes, so mask others
    std::vector<uint8_t> saved_in(ctx.nodes.size());
    for (size_t i = 0; i < ctx.nodes.size(); ++i) {
      saved_in[i] = ctx.nodes[i].in_table;
      if (comp_of[i] != comp_id) ctx.nodes[i].in_table = false;
    }
    ctx.compress_graph();
    ctx.remove_low_cov();
    ctx.compress_graph();
    ctx.remove_tips();
    for (size_t i = 0; i < ctx.nodes.size(); ++i)
      if (comp_of[i] != comp_id && saved_in[i]) ctx.nodes[i].in_table = true;

    if (n_comps >= cap_comps) return -1;

    if (enumerate) {
      // post-prune stages in the exact Python order: traversal index ->
      // cycle check -> complexity guard -> walk enumeration
      std::vector<int32_t> mem_alive;
      for (int32_t i : members)
        if (ctx.nodes[i].in_table) mem_alive.push_back(i);
      TravC tv;
      if (!build_trav(ctx, mem_alive, src_id, sink_id, tv)) return -1;
      if (trav_has_cycle(tv)) { *out_retry = 1; *out_n_comps = 0; return 0; }
      GCplxC g = compute_complexity(ctx, mem_alive);
      if (g.is_complex()) { *out_retry = 1; *out_n_comps = 0; return 0; }
      c_metrics[n_comps * 6 + 0] = (double)g.cc;
      c_metrics[n_comps * 6 + 1] = (double)g.bp;
      c_metrics[n_comps * 6 + 2] = (double)g.maxdeg;
      c_metrics[n_comps * 6 + 3] = g.unitig_ratio;
      c_metrics[n_comps * 6 + 4] = g.cov_cv;
      c_metrics[n_comps * 6 + 5] = g.tip_ratio;
      std::vector<int64_t> ref_confs;
      for (int32_t slot : mem_alive) {
        const PNode& n = ctx.nodes[slot];
        if (n.label & label_ref)
          ref_confs.push_back(node_confidence(n, num_samples, label_ref));
      }
      c_ref_weight[n_comps] = ref_confs.empty() ? 1 : median_i64(ref_confs);
      WalkEnumC we(tv, ctx, num_samples, label_ref);
      std::vector<int64_t> walk;
      int64_t hap_seq_pos = *out_n_haps > 0 ? h_seq_off[*out_n_haps] : 0;
      int64_t hap_cov_pos = *out_n_haps > 0 ? h_cov_off[*out_n_haps] : 0;
      while (we.next_path(walk)) {
        if (!emit_hap(ctx, tv, walk, k, we.conf, n_comps, h_comp, h_seq,
                      h_seq_off, h_cov, h_wt_w, h_wt_n, h_cov_off,
                      out_n_haps, &hap_seq_pos, &hap_cov_pos, cap_haps,
                      cap_hseq, cap_hcov))
          return -1;
      }
      c_limit[n_comps] = we.hit_limit ? 1 : 0;
    }

    out_c_source[n_comps] = src_id;
    out_c_sink[n_comps] = sink_id;
    out_c_src_off[n_comps] = src_off;
    out_c_anchor_len[n_comps] = anchor_len;
    out_c_id[n_comps] = comp_id;
    ++n_comps;

    for (int32_t i : members) {
      const PNode& n = ctx.nodes[i];
      if (!n.in_table) continue;
      int64_t slen = (int64_t)n.seq.size();
      int64_t elen = (int64_t)n.edges.size();
      if (n_out_nodes >= cap_nodes || seq_pos + slen > cap_seq ||
          edge_pos + elen > cap_edges)
        return -1;
      out_nid[n_out_nodes] = n.nid;
      std::memcpy(out_seq + seq_pos, n.seq.data(), (size_t)slen);
      seq_pos += slen;
      out_sign[n_out_nodes] = n.sign;
      out_label[n_out_nodes] = n.label;
      for (int64_t s = 0; s < num_samples; ++s)
        out_counts[n_out_nodes * num_samples + s] = n.counts[s];
      out_roles[n_out_nodes * 2] = n.roles[0];
      out_roles[n_out_nodes * 2 + 1] = n.roles[1];
      out_comp[n_out_nodes] = comp_id;
      for (const auto& e : n.edges) {
        out_e_dst[edge_pos] = e.dst;
        out_e_kind[edge_pos] = e.kind;
        ++edge_pos;
      }
      ++n_out_nodes;
      out_seq_off[n_out_nodes] = seq_pos;
      out_e_off[n_out_nodes] = edge_pos;
    }
  }
  *out_n_comps = n_comps;
  return n_out_nodes;
}

extern "C" int64_t l2t_assemble_pass(
    const uint8_t* codes, const int64_t* offsets, const uint8_t* quals,
    const uint8_t* labels, const uint8_t* is_read, const int32_t* sample_idx,
    const uint8_t* tags, const uint64_t* qhash, const double* err_table,
    int64_t n_seqs, int64_t k, int64_t num_samples, int64_t min_node_cov,
    uint8_t label_case, uint8_t label_ref,
    int64_t min_anchor_cov, int64_t min_anchor_len,
    uint64_t* out_nid, uint8_t* out_seq, int64_t* out_seq_off,
    uint8_t* out_sign, uint8_t* out_label, int64_t* out_counts,
    int64_t* out_roles, int32_t* out_comp,
    uint64_t* out_e_dst, uint8_t* out_e_kind, int64_t* out_e_off,
    uint64_t* out_c_source, uint64_t* out_c_sink,
    int64_t* out_c_src_off, int64_t* out_c_anchor_len, int32_t* out_c_id,
    int64_t* out_n_comps,
    int64_t cap_nodes, int64_t cap_seq, int64_t cap_edges, int64_t cap_comps) {
  return assemble_impl(
      codes, offsets, quals, labels, is_read, sample_idx, tags, qhash,
      err_table, n_seqs, k, num_samples, min_node_cov, label_case, label_ref,
      min_anchor_cov, min_anchor_len, out_nid, out_seq, out_seq_off, out_sign,
      out_label, out_counts, out_roles, out_comp, out_e_dst, out_e_kind,
      out_e_off, out_c_source, out_c_sink, out_c_src_off, out_c_anchor_len,
      out_c_id, out_n_comps, cap_nodes, cap_seq, cap_edges, cap_comps,
      nullptr, nullptr, nullptr, nullptr, nullptr, nullptr, nullptr, nullptr,
      nullptr, nullptr, nullptr, nullptr, 0, 0, 0);
}

// Fused assemble + haplotype enumeration: everything l2t_assemble_pass does
// PLUS per-component traversal/cycle/complexity and the confidence-ordered
// walk enumeration, emitting raw per-hap arrays (sequence codes, node
// coverages, run-length weights). The Python caller rebuilds Path objects
// from these arrays (float stats stay in Python) and never materializes
// node objects on the fast path. out_retry=1 => retry at the next k.
extern "C" int64_t l2t_assemble_full(
    const uint8_t* codes, const int64_t* offsets, const uint8_t* quals,
    const uint8_t* labels, const uint8_t* is_read, const int32_t* sample_idx,
    const uint8_t* tags, const uint64_t* qhash, const double* err_table,
    int64_t n_seqs, int64_t k, int64_t num_samples, int64_t min_node_cov,
    uint8_t label_case, uint8_t label_ref,
    int64_t min_anchor_cov, int64_t min_anchor_len,
    uint64_t* out_nid, uint8_t* out_seq, int64_t* out_seq_off,
    uint8_t* out_sign, uint8_t* out_label, int64_t* out_counts,
    int64_t* out_roles, int32_t* out_comp,
    uint64_t* out_e_dst, uint8_t* out_e_kind, int64_t* out_e_off,
    uint64_t* out_c_source, uint64_t* out_c_sink,
    int64_t* out_c_src_off, int64_t* out_c_anchor_len, int32_t* out_c_id,
    int64_t* out_n_comps,
    int64_t cap_nodes, int64_t cap_seq, int64_t cap_edges, int64_t cap_comps,
    double* c_metrics, int64_t* c_ref_weight, uint8_t* c_limit,
    int32_t* h_comp, uint8_t* h_seq, int64_t* h_seq_off,
    int64_t* h_cov, int64_t* h_wt_w, int64_t* h_wt_n, int64_t* h_cov_off,
    int64_t* out_n_haps, int64_t* out_retry,
    int64_t cap_haps, int64_t cap_hseq, int64_t cap_hcov) {
  return assemble_impl(
      codes, offsets, quals, labels, is_read, sample_idx, tags, qhash,
      err_table, n_seqs, k, num_samples, min_node_cov, label_case, label_ref,
      min_anchor_cov, min_anchor_len, out_nid, out_seq, out_seq_off, out_sign,
      out_label, out_counts, out_roles, out_comp, out_e_dst, out_e_kind,
      out_e_off, out_c_source, out_c_sink, out_c_src_off, out_c_anchor_len,
      out_c_id, out_n_comps, cap_nodes, cap_seq, cap_edges, cap_comps,
      c_metrics, c_ref_weight, c_limit, h_comp, h_seq, h_seq_off, h_cov,
      h_wt_w, h_wt_n, h_cov_off, out_n_haps, out_retry, cap_haps, cap_hseq,
      cap_hcov);
}

// Prune one component: compress -> lowcov -> compress -> tips.
//
// Inputs: the component's nodes in Python-table order (flat arrays), edges
// as CSR of (dst, kind) with src implied. Outputs are compacted survivor
// arrays in the same relative order. Returns the survivor count, or -1 when
// an output capacity would overflow (callers size cap_seq >= total input
// seq length and cap_edges >= n_edges, which merging never exceeds).
int64_t l2t_prune_component(
    int64_t n_nodes, const uint64_t* nids, const uint8_t* seq_codes,
    const int64_t* seq_off, const uint8_t* signs, const uint8_t* labels,
    const int64_t* counts, const int64_t* roles, const uint64_t* e_dst,
    const uint8_t* e_kind, const int64_t* e_off, int64_t k,
    int64_t num_samples, int64_t min_node_cov, uint64_t source_id,
    uint64_t sink_id,
    uint8_t* out_alive, uint8_t* out_seq, int64_t* out_seq_off,
    uint8_t* out_sign, uint8_t* out_label, int64_t* out_counts,
    int64_t* out_roles, uint64_t* out_e_dst, uint8_t* out_e_kind,
    int64_t* out_e_off, int64_t cap_seq, int64_t cap_edges) {
  PruneCtx ctx;
  ctx.source_id = source_id;
  ctx.sink_id = sink_id;
  ctx.k = k;
  ctx.num_samples = num_samples;
  ctx.min_node_cov = min_node_cov;
  ctx.nodes.resize(n_nodes);
  ctx.idx.reserve((size_t)n_nodes * 2);
  for (int64_t i = 0; i < n_nodes; ++i) {
    PNode& n = ctx.nodes[i];
    n.nid = nids[i];
    n.seq.assign(seq_codes + seq_off[i], seq_codes + seq_off[i + 1]);
    n.sign = signs[i];
    n.label = labels[i];
    n.counts.assign(counts + i * num_samples, counts + (i + 1) * num_samples);
    n.roles[0] = roles[i * 2];
    n.roles[1] = roles[i * 2 + 1];
    n.edges.reserve(e_off[i + 1] - e_off[i]);
    for (int64_t e = e_off[i]; e < e_off[i + 1]; ++e)
      n.edges.push_back(PEdge{e_dst[e], e_kind[e]});
    ctx.idx.emplace(n.nid, (int32_t)i);
  }

  ctx.compress_graph();
  ctx.remove_low_cov();
  ctx.compress_graph();
  ctx.remove_tips();

  int64_t n_out = 0, seq_pos = 0, edge_pos = 0;
  out_seq_off[0] = 0;
  out_e_off[0] = 0;
  for (int64_t i = 0; i < n_nodes; ++i) {
    const PNode& n = ctx.nodes[i];
    out_alive[i] = n.in_table ? 1 : 0;
    if (!n.in_table) continue;
    int64_t slen = (int64_t)n.seq.size();
    int64_t elen = (int64_t)n.edges.size();
    if (seq_pos + slen > cap_seq || edge_pos + elen > cap_edges) return -1;
    std::memcpy(out_seq + seq_pos, n.seq.data(), (size_t)slen);
    seq_pos += slen;
    out_sign[n_out] = n.sign;
    out_label[n_out] = n.label;
    for (int64_t s = 0; s < num_samples; ++s)
      out_counts[n_out * num_samples + s] = n.counts[s];
    out_roles[n_out * 2] = n.roles[0];
    out_roles[n_out * 2 + 1] = n.roles[1];
    for (const auto& e : n.edges) {
      out_e_dst[edge_pos] = e.dst;
      out_e_kind[edge_pos] = e.kind;
      ++edge_pos;
    }
    ++n_out;
    out_seq_off[n_out] = seq_pos;
    out_e_off[n_out] = edge_pos;
  }
  return n_out;
}

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
  const int64_t BAND_W = 96;
  for (int64_t b = 0; b < B; ++b) {
    const uint8_t* qb = queries + b * Lq;
    const uint8_t* tb = targets + b * Lt;
    int64_t lq = q_lens[b], lt = t_lens[b];
    // global mode: banded first with an exactness certificate. Any path
    // leaving the band uses > BAND_W gap bases beyond the length
    // difference, scoring <= match*min(lq,lt) - (BAND_W+1)*min_extend;
    // a banded optimum above that bound is bit-identical to full DP
    // (score AND traceback — see align_one). Below it, rerun full.
    int64_t D = lt - lq;
    int64_t span = (D > 0 ? D : -D) + 2 * BAND_W + 1;
    bool try_band = !free_ends && span < lt && lq > 0 && lt > 0;
    if (try_band) {
      align_one(qb, lq, tb, lt, match, mismatch, q1, e1, q2, e2, dual,
                free_ends, S, scores + b, tstarts + b, tends + b,
                cigar_ops + b * max_cigar, cigar_lens + b * max_cigar,
                max_cigar, n_cigars + b, BAND_W);
      int64_t min_e = dual ? std::min(e1, e2) : e1;
      int64_t bound =
          match * std::min(lq, lt) - (BAND_W + 1) * min_e;
      if (scores[b] > bound) continue;  // certified exact
    }
    align_one(qb, lq, tb, lt, match, mismatch, q1, e1, q2, e2, dual,
              free_ends, S, scores + b, tstarts + b, tends + b,
              cigar_ops + b * max_cigar, cigar_lens + b * max_cigar,
              max_cigar, n_cigars + b);
  }
  return 0;
}

// Tandem-repeat scan: exact (kind 0) then approx (kind 1) hits over an
// ASCII sequence, matching base/sequence_complexity.py::find_exact_repeats /
// find_approx_repeats exactly (reference: base/tandem_repeat.*). Returns the
// hit count (<= cap; the Python twins emit far fewer than cap=64 on the
// ~100 bp flank windows the scorer passes).
static bool primitive_motif(const uint8_t* m, int n) {
  for (int period = 1; period < n; ++period) {
    if (n % period) continue;
    bool rep = true;
    for (int i = period; i < n; ++i) {
      if (m[i] != m[i % period]) { rep = false; break; }
    }
    if (rep) return false;
  }
  return true;
}

int64_t l2t_tandem_repeats(const uint8_t* seq, int64_t n, int32_t max_period,
                           int64_t cap, int32_t* out_period, int32_t* out_start,
                           int32_t* out_span, int32_t* out_errors,
                           uint8_t* out_exact) {
  int64_t cnt = 0;
  auto emit = [&](int32_t period, int32_t start, int32_t span, int32_t errors,
                  uint8_t exact) {
    if (cnt < cap) {
      out_period[cnt] = period;
      out_start[cnt] = start;
      out_span[cnt] = span;
      out_errors[cnt] = errors;
      out_exact[cnt] = exact;
    }
    ++cnt;
  };
  // ---- exact pass (min_copies 2.5) -----------------------------------
  const int maxp = static_cast<int>(max_period < n ? max_period : n);
  for (int period = 1; period <= maxp; ++period) {
    int64_t start = 0;
    while (start <= n - period) {
      const uint8_t* motif = seq + start;
      if (period > 1 && !primitive_motif(motif, period)) { ++start; continue; }
      int64_t match_len = period;
      while (start + match_len + period <= n &&
             std::memcmp(seq + start + match_len, motif, period) == 0)
        match_len += period;
      int64_t partial = 0;
      while (start + match_len + partial < n && partial < period &&
             seq[start + match_len + partial] == motif[partial])
        ++partial;
      // copies >= 2.5  <=>  2*(match_len+partial) >= 5*period
      if (2 * (match_len + partial) >= 5 * period) {
        emit(period, static_cast<int32_t>(start),
             static_cast<int32_t>(match_len + partial), 0, 1);
        start += match_len - 1;
      }
      ++start;
    }
  }
  // ---- approx pass (min_copies 3.0, <=1 edit/unit, purity >= 0.75) ----
  for (int period = 1; period <= maxp; ++period) {
    int64_t start = 0;
    while (start <= n - period) {
      const uint8_t* motif = seq + start;
      if (period > 1 && !primitive_motif(motif, period)) { ++start; continue; }
      int64_t total_span = period;
      int64_t total_errors = 0;
      while (start + total_span + period <= n) {
        const uint8_t* unit = seq + start + total_span;
        int errs = 0;
        for (int i = 0; i < period; ++i) errs += unit[i] != motif[i];
        if (errs > 1) break;
        total_errors += errs;
        total_span += period;
      }
      // copies >= 3 and purity = 1 - errors/span >= 0.75
      if (total_span >= 3 * period && 4 * total_errors <= total_span) {
        emit(period, static_cast<int32_t>(start),
             static_cast<int32_t>(total_span),
             static_cast<int32_t>(total_errors), 0);
        start += total_span - 1;
      }
      ++start;
    }
  }
  return cnt;
}

// Longdust raw accumulators for one strand: rolling 2-bit k-mers (N resets
// the window) counted into a dense 4^k table. Emits the counts of
// multi-occurring (>=2) k-mers in ascending k-mer-code order — the order
// np.unique yields in base/sequence_complexity.py::_score_one_strand (the
// lgamma sum stays in Python: CPython's math.lgamma is not libm's). rc != 0
// scans the reverse complement without materializing it. Returns ell (k-mer
// count); *out_n_multi gets the emitted count (<= cap; excess counted, not
// written).
int64_t l2t_longdust_counts(const uint8_t* seq_ascii, int64_t n, int32_t k,
                            int32_t rc, int32_t* out_multi, int64_t cap,
                            int64_t* out_n_multi) {
  int64_t num_kmers = (int64_t)1 << (2 * k);
  int64_t mask = num_kmers - 1;
  std::vector<int32_t> counts((size_t)num_kmers, 0);
  int64_t ell = 0;
  uint64_t kmer = 0;
  int64_t run = 0;
  for (int64_t idx = 0; idx < n; ++idx) {
    uint8_t ch = rc ? seq_ascii[n - 1 - idx] : seq_ascii[idx];
    int code;
    switch (ch) {
      case 'A': case 'a': code = 0; break;
      case 'C': case 'c': code = 1; break;
      case 'G': case 'g': code = 2; break;
      case 'T': case 't': code = 3; break;
      default: code = 4;
    }
    if (rc && code < 4) code = 3 - code;
    if (code < 4) {
      kmer = ((kmer << 2) | (uint64_t)code) & (uint64_t)mask;
      ++run;
      if (run >= k) {
        ++counts[kmer];
        ++ell;
      }
    } else {
      run = 0;
    }
  }
  int64_t nm = 0;
  for (int64_t c = 0; c < num_kmers; ++c) {
    if (counts[c] >= 2) {
      if (nm < cap) out_multi[nm] = counts[c];
      ++nm;
    }
  }
  *out_n_multi = nm;
  return ell;
}

// Approximate-repeat gate: true when any distinct-position pair of k-mers
// differs by <= max_mismatch bases. 2-bit packs (N clamped to 0, exactly as
// base/repeat.py::pack_2bit) + XOR popcount with early exit — the
// reference's SIMD Hamming scan (src/lancet/base/repeat.cpp, 9.4% CPU).
int32_t l2t_has_approx_repeat(const uint8_t* codes, int64_t n, int32_t k,
                              int32_t max_mismatch) {
  const int64_t num = n - k + 1;
  if (num < 2) return 0;
  const int words = static_cast<int>((k + 31) / 32);
  std::vector<uint64_t> packed(static_cast<size_t>(num) * words, 0);
  for (int64_t i = 0; i < num; ++i) {
    uint64_t* row = packed.data() + i * words;
    for (int j = 0; j < k; ++j) {
      uint64_t c = codes[i + j];
      if (c > 3) c = 0;
      row[j >> 5] |= c << ((j & 31) * 2);
    }
  }
  constexpr uint64_t kPairMask = 0x5555555555555555ull;
  for (int64_t i = 0; i < num; ++i) {
    const uint64_t* a = packed.data() + i * words;
    for (int64_t j = i + 1; j < num; ++j) {
      const uint64_t* b = packed.data() + j * words;
      int dist = 0;
      for (int w = 0; w < words; ++w) {
        const uint64_t x = a[w] ^ b[w];
        dist += __builtin_popcountll((x | (x >> 1)) & kPairMask);
        if (dist > max_mismatch) break;
      }
      if (dist <= max_mismatch) return 1;
    }
  }
  return 0;
}

}  // extern "C"

// Native scorers + tokenizer for openviic_tpu.
//
// Replaces the reference's Java components (SURVEY.md §2.1: Stanford
// PTBTokenizer jar, METEOR 1.5 jar) and accelerates the SCST reward hot
// path (host-side CIDEr every training iteration,
// trainers/vi_trainer.py:144).
//
// C ABI (see openviic_tpu/native/__init__.py for the ctypes binding):
//   strings exchange as UTF-8; batches are '\x1e'-separated records whose
//   reference groups use '\x1f' separators; score arrays are malloc'd
//   doubles released with ov_free.
//
// Build: native/build.sh  (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <map>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------- utils
std::vector<std::string> split(const std::string& s, char sep) {
  std::vector<std::string> out;
  size_t start = 0;
  while (true) {
    size_t pos = s.find(sep, start);
    if (pos == std::string::npos) {
      out.push_back(s.substr(start));
      break;
    }
    out.push_back(s.substr(start, pos - start));
    start = pos + 1;
  }
  return out;
}

std::vector<std::string> tokens_of(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && s[i] == ' ') ++i;
    size_t j = i;
    while (j < s.size() && s[j] != ' ') ++j;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

// ------------------------------------------------------- n-gram hashing
// An n-gram is identified by a 64-bit FNV-1a hash over its words.  Hash
// collisions are astronomically unlikely at caption-corpus sizes.
struct NGramCounts {
  // per order (0..3): hash -> count
  std::unordered_map<uint64_t, int> counts[4];
  int length = 0;  // unigram count (reference uses bigram count, see below)
};

uint64_t fnv1a(const uint64_t* data, size_t n) {
  uint64_t h = 1469598103934665603ull;
  const uint8_t* p = reinterpret_cast<const uint8_t*>(data);
  for (size_t i = 0; i < n * sizeof(uint64_t); ++i) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h;
}

uint64_t hash_word(const std::string& w) {
  uint64_t h = 1469598103934665603ull;
  for (unsigned char c : w) {
    h ^= c;
    h *= 1099511628211ull;
  }
  return h;
}

NGramCounts ngram_counts(const std::string& sentence, int max_n = 4) {
  NGramCounts out;
  std::vector<std::string> words = tokens_of(sentence);
  std::vector<uint64_t> wh(words.size());
  for (size_t i = 0; i < words.size(); ++i) wh[i] = hash_word(words[i]);
  for (int n = 1; n <= max_n; ++n) {
    for (size_t i = 0; i + n <= wh.size(); ++i) {
      uint64_t h = fnv1a(&wh[i], n);
      out.counts[n - 1][h] += 1;
    }
  }
  out.length = static_cast<int>(words.size());
  return out;
}

// ------------------------------------------------------------- CIDEr
// Matches evaluation/cider/cider_scorer.py: tf-idf vectors per order with
// count clipping, cosine similarity, Gaussian length penalty (sigma=6),
// mean over orders, /len(refs), *10.  NOTE: "length" used in the penalty
// is the count of *bigrams* (n==1 index) exactly as the reference's
// counts2vec does (cider_scorer.py:108-110).
struct CiderState {
  std::unordered_map<uint64_t, double> doc_frequency[4];
  double ref_len = 0.0;
  double sigma = 6.0;
};

struct Vec {
  std::unordered_map<uint64_t, double> v[4];
  double norm[4] = {0, 0, 0, 0};
  int length = 0;  // bigram count
};

Vec counts2vec(const NGramCounts& cnts, const CiderState& st) {
  Vec out;
  for (int n = 0; n < 4; ++n) {
    for (const auto& kv : cnts.counts[n]) {
      auto it = st.doc_frequency[n].find(kv.first);
      double df = it == st.doc_frequency[n].end() ? 0.0 : it->second;
      double idf_df = std::log(std::max(1.0, df));
      double val = double(kv.second) * (st.ref_len - idf_df);
      out.v[n][kv.first] = val;
      out.norm[n] += val * val;
      if (n == 1) out.length += kv.second;
    }
    out.norm[n] = std::sqrt(out.norm[n]);
  }
  return out;
}

void sim_accum(const Vec& hyp, const Vec& ref, double sigma, double* score) {
  double delta = double(hyp.length - ref.length);
  double gauss = std::exp(-(delta * delta) / (2 * sigma * sigma));
  for (int n = 0; n < 4; ++n) {
    double val = 0.0;
    for (const auto& kv : hyp.v[n]) {
      auto it = ref.v[n].find(kv.first);
      if (it == ref.v[n].end()) continue;
      val += std::min(kv.second, it->second) * it->second;
    }
    if (hyp.norm[n] != 0 && ref.norm[n] != 0) val /= hyp.norm[n] * ref.norm[n];
    score[n] += val * gauss;
  }
}

}  // namespace

extern "C" {

void ov_free(void* p) { free(p); }

// refs_corpus: records separated by '\x1e'; refs within a record by '\x1f'.
void* ov_cider_new(const char* refs_corpus) {
  auto* st = new CiderState();
  std::vector<std::string> records = split(refs_corpus, '\x1e');
  for (const auto& rec : records) {
    // set of ngrams across this record's refs
    std::unordered_map<uint64_t, bool> seen[4];
    for (const auto& ref : split(rec, '\x1f')) {
      NGramCounts c = ngram_counts(ref);
      for (int n = 0; n < 4; ++n)
        for (const auto& kv : c.counts[n]) seen[n][kv.first] = true;
    }
    for (int n = 0; n < 4; ++n)
      for (const auto& kv : seen[n]) st->doc_frequency[n][kv.first] += 1.0;
  }
  st->ref_len = std::log(double(records.size()));
  return st;
}

void ov_cider_delete(void* handle) { delete static_cast<CiderState*>(handle); }

// gens: one hypothesis per record; refs: matching reference groups.
// When handle == nullptr, df/ref_len are computed from refs (eval mode).
// Returns malloc'd double[n_records + 1]: [corpus_mean, per_record...].
double* ov_cider_score(void* handle, const char* gens, const char* refs) {
  std::vector<std::string> gen_recs = split(gens, '\x1e');
  std::vector<std::string> ref_recs = split(refs, '\x1e');
  size_t n = gen_recs.size();
  if (ref_recs.size() != n) return nullptr;

  CiderState local;
  CiderState* st = static_cast<CiderState*>(handle);
  if (st == nullptr) {
    for (const auto& rec : ref_recs) {
      std::unordered_map<uint64_t, bool> seen[4];
      for (const auto& ref : split(rec, '\x1f')) {
        NGramCounts c = ngram_counts(ref);
        for (int k = 0; k < 4; ++k)
          for (const auto& kv : c.counts[k]) seen[k][kv.first] = true;
      }
      for (int k = 0; k < 4; ++k)
        for (const auto& kv : seen[k]) local.doc_frequency[k][kv.first] += 1.0;
    }
    local.ref_len = std::log(double(n));
    st = &local;
  }

  double* out = static_cast<double*>(malloc(sizeof(double) * (n + 1)));
  double total = 0.0;
  for (size_t i = 0; i < n; ++i) {
    Vec hyp = counts2vec(ngram_counts(gen_recs[i]), *st);
    std::vector<std::string> refs_i = split(ref_recs[i], '\x1f');
    double score[4] = {0, 0, 0, 0};
    for (const auto& r : refs_i)
      sim_accum(hyp, counts2vec(ngram_counts(r), *st), st->sigma, score);
    double avg = (score[0] + score[1] + score[2] + score[3]) / 4.0;
    avg = avg / double(refs_i.size()) * 10.0;
    out[i + 1] = avg;
    total += avg;
  }
  out[0] = n ? total / double(n) : 0.0;
  return out;
}

// ------------------------------------------------------------- METEOR
// exact + Porter-stem greedy alignment; classic parameters
// (alpha=0.9, beta=3, gamma=0.5) — mirrors evaluation/meteor.py.

static bool is_vowel(const std::string& w, int i) {
  char c = w[i];
  if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') return true;
  if (c == 'y') return i == 0 ? false : !is_vowel(w, i - 1);
  return false;
}

static int measure(const std::string& stem) {
  std::string collapsed;
  for (size_t i = 0; i < stem.size(); ++i) {
    char f = is_vowel(stem, (int)i) ? 'v' : 'c';
    if (collapsed.empty() || collapsed.back() != f) collapsed += f;
  }
  int m = 0;
  for (size_t i = 0; i + 1 < collapsed.size(); ++i)
    if (collapsed[i] == 'v' && collapsed[i + 1] == 'c') ++m;
  return m;
}

static bool has_vowel(const std::string& s) {
  for (size_t i = 0; i < s.size(); ++i)
    if (is_vowel(s, (int)i)) return true;
  return false;
}

static bool ends_with(const std::string& s, const char* suf) {
  size_t l = strlen(suf);
  return s.size() >= l && s.compare(s.size() - l, l, suf) == 0;
}

static bool double_cons(const std::string& w) {
  size_t n = w.size();
  return n >= 2 && w[n - 1] == w[n - 2] && !is_vowel(w, (int)n - 1);
}

static bool cvc(const std::string& w) {
  size_t n = w.size();
  if (n < 3) return false;
  if (!is_vowel(w, (int)n - 3) && is_vowel(w, (int)n - 2) &&
      !is_vowel(w, (int)n - 1)) {
    char c = w[n - 1];
    return c != 'w' && c != 'x' && c != 'y';
  }
  return false;
}

static std::string porter(std::string w) {
  if (w.size() <= 2) return w;
  // 1a
  if (ends_with(w, "sses")) w.resize(w.size() - 2);
  else if (ends_with(w, "ies")) w.resize(w.size() - 2);
  else if (ends_with(w, "ss")) {}
  else if (ends_with(w, "s")) w.resize(w.size() - 1);
  // 1b
  bool flag = false;
  if (ends_with(w, "eed")) {
    if (measure(w.substr(0, w.size() - 3)) > 0) w.resize(w.size() - 1);
  } else if (ends_with(w, "ed")) {
    if (has_vowel(w.substr(0, w.size() - 2))) { w.resize(w.size() - 2); flag = true; }
  } else if (ends_with(w, "ing")) {
    if (has_vowel(w.substr(0, w.size() - 3))) { w.resize(w.size() - 3); flag = true; }
  }
  if (flag) {
    if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) w += "e";
    else if (double_cons(w) && !ends_with(w, "l") && !ends_with(w, "s") &&
             !ends_with(w, "z")) w.resize(w.size() - 1);
    else if (measure(w) == 1 && cvc(w)) w += "e";
  }
  // 1c
  if (ends_with(w, "y") && has_vowel(w.substr(0, w.size() - 1)))
    w[w.size() - 1] = 'i';
  // 2
  static const char* s2[][2] = {
      {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"}, {"anci", "ance"},
      {"izer", "ize"}, {"abli", "able"}, {"alli", "al"}, {"entli", "ent"},
      {"eli", "e"}, {"ousli", "ous"}, {"ization", "ize"}, {"ation", "ate"},
      {"ator", "ate"}, {"alism", "al"}, {"iveness", "ive"}, {"fulness", "ful"},
      {"ousness", "ous"}, {"aliti", "al"}, {"iviti", "ive"}, {"biliti", "ble"}};
  for (auto& r : s2) {
    if (ends_with(w, r[0])) {
      std::string stem = w.substr(0, w.size() - strlen(r[0]));
      if (measure(stem) > 0) w = stem + r[1];
      break;
    }
  }
  // 3
  static const char* s3[][2] = {{"icate", "ic"}, {"ative", ""}, {"alize", "al"},
                                {"iciti", "ic"}, {"ical", "ic"}, {"ful", ""},
                                {"ness", ""}};
  for (auto& r : s3) {
    if (ends_with(w, r[0])) {
      std::string stem = w.substr(0, w.size() - strlen(r[0]));
      if (measure(stem) > 0) w = stem + r[1];
      break;
    }
  }
  // 4
  static const char* s4[] = {"al", "ance", "ence", "er", "ic", "able", "ible",
                             "ant", "ement", "ment", "ent", "ou", "ism", "ate",
                             "iti", "ous", "ive", "ize"};
  bool matched = false;
  for (auto* suf : s4) {
    if (ends_with(w, suf)) {
      matched = true;
      std::string stem = w.substr(0, w.size() - strlen(suf));
      if (measure(stem) > 1) w = stem;
      break;
    }
  }
  if (!matched && ends_with(w, "ion")) {
    std::string stem = w.substr(0, w.size() - 3);
    if (measure(stem) > 1 && !stem.empty() &&
        (stem.back() == 's' || stem.back() == 't')) w = stem;
  }
  // 5a
  if (ends_with(w, "e")) {
    std::string stem = w.substr(0, w.size() - 1);
    int m = measure(stem);
    if (m > 1 || (m == 1 && !cvc(stem))) w = stem;
  }
  // 5b
  if (measure(w) > 1 && double_cons(w) && ends_with(w, "l")) w.resize(w.size() - 1);
  return w;
}

struct MeteorStats { int m, hl, rl, ch; };

static MeteorStats align(const std::vector<std::string>& hyp,
                         const std::vector<std::string>& ref) {
  size_t H = hyp.size(), R = ref.size();
  std::vector<int> hyp_to_ref(H, -1);
  std::vector<bool> ref_used(R, false);
  // exact
  for (size_t i = 0; i < H; ++i)
    for (size_t j = 0; j < R; ++j)
      if (!ref_used[j] && hyp_to_ref[i] < 0 && hyp[i] == ref[j]) {
        hyp_to_ref[i] = (int)j; ref_used[j] = true; break;
      }
  // stem
  std::vector<std::string> hs(H), rs(R);
  for (size_t i = 0; i < H; ++i) hs[i] = porter(hyp[i]);
  for (size_t j = 0; j < R; ++j) rs[j] = porter(ref[j]);
  for (size_t i = 0; i < H; ++i) {
    if (hyp_to_ref[i] >= 0) continue;
    for (size_t j = 0; j < R; ++j)
      if (!ref_used[j] && hs[i] == rs[j]) {
        hyp_to_ref[i] = (int)j; ref_used[j] = true; break;
      }
  }
  // chunk count over pairs sorted by hyp index
  int m = 0, ch = 0;
  int prev_h = -10, prev_r = -10;
  for (size_t i = 0; i < H; ++i) {
    if (hyp_to_ref[i] < 0) continue;
    ++m;
    if ((int)i != prev_h + 1 || hyp_to_ref[i] != prev_r + 1) ++ch;
    prev_h = (int)i; prev_r = hyp_to_ref[i];
  }
  return {m, (int)H, (int)R, ch};
}

static double meteor_from(const MeteorStats& s) {
  if (s.m == 0 || s.hl == 0 || s.rl == 0) return 0.0;
  double p = double(s.m) / s.hl, r = double(s.m) / s.rl;
  double f = p * r / (0.9 * p + 0.1 * r);
  double frag = double(s.ch) / s.m;
  return f * (1.0 - 0.5 * frag * frag * frag);
}

// Returns malloc'd double[n + 1]: [corpus, per_segment...]
double* ov_meteor_score(const char* gens, const char* refs) {
  std::vector<std::string> gen_recs = split(gens, '\x1e');
  std::vector<std::string> ref_recs = split(refs, '\x1e');
  size_t n = gen_recs.size();
  if (ref_recs.size() != n) return nullptr;
  double* out = static_cast<double*>(malloc(sizeof(double) * (n + 1)));
  MeteorStats agg{0, 0, 0, 0};
  for (size_t i = 0; i < n; ++i) {
    std::vector<std::string> hyp = tokens_of(gen_recs[i]);
    double best = -1.0;
    MeteorStats best_stats{0, 0, 0, 0};
    for (const auto& r : split(ref_recs[i], '\x1f')) {
      MeteorStats s = align(hyp, tokens_of(r));
      double sc = meteor_from(s);
      if (sc > best) { best = sc; best_stats = s; }
    }
    out[i + 1] = best < 0 ? 0.0 : best;
    agg.m += best_stats.m; agg.hl += best_stats.hl;
    agg.rl += best_stats.rl; agg.ch += best_stats.ch;
  }
  out[0] = meteor_from(agg);
  return out;
}

// ------------------------------------------- METEOR 1.5 (en-norm)
// Mirrors openviic_tpu/evaluation/meteor15.py exactly (all four stages:
// exact + stem + synonym + paraphrase — data files passed in from the
// Python side): beam-search aligner (most matched words, fewest chunks,
// smallest total distance; beam 40), content/function-word weighting
// (delta=0.75), module weights exact=1.0 stem=0.6 synonym=0.8
// paraphrase=0.6, alpha=0.85 beta=0.2 gamma=0.6; corpus score from
// aggregated statistics.  Matches are (start, len) SPANS on both sides
// (len 1 for the word stages, up to 4 for paraphrase phrases) — the
// Python scorer's Match tuple.

struct M15Match { int h, hl, r, rl, mod; };

struct M15State {
  uint64_t hmask0, hmask1;
  uint64_t rmask0, rmask1;
  std::vector<M15Match> ms;
  int dist;
};

static int m15_chunks(const std::vector<M15Match>& ms) {
  if (ms.empty()) return 0;  // appended in hyp order already
  int ch = 1;
  for (size_t i = 1; i < ms.size(); ++i)
    if (ms[i].h != ms[i - 1].h + ms[i - 1].hl ||
        ms[i].r != ms[i - 1].r + ms[i - 1].rl)
      ++ch;
  return ch;
}

// span bitmask over [start, start+len) split across two 64-bit words
static inline void m15_span_bits(int start, int len, uint64_t& b0,
                                 uint64_t& b1) {
  b0 = b1 = 0;
  for (int k = start; k < start + len && k < 128; ++k) {
    if (k < 64) b0 |= 1ULL << k;
    else b1 |= 1ULL << (k - 64);
  }
}

// word -> synset ids (small sorted vectors; intersection test is linear)
typedef std::unordered_map<std::string, std::vector<int>> M15SynTable;

static bool m15_syn_share(const M15SynTable& syn, const std::string& a,
                          const std::string& b) {
  if (syn.empty()) return false;
  auto ia = syn.find(a);
  if (ia == syn.end()) return false;
  auto ib = syn.find(b);
  if (ib == syn.end()) return false;
  for (int x : ia->second)
    for (int y : ib->second)
      if (x == y) return true;
  return false;
}

// phrase -> alternatives (both directions, as meteor15._paraphrase_table)
typedef std::unordered_map<std::string, std::vector<std::string>> M15ParTable;

static std::string m15_join(const std::vector<std::string>& w, size_t start,
                            size_t len) {
  std::string s;
  for (size_t k = start; k < start + len; ++k) {
    if (k > start) s += ' ';
    s += w[k];
  }
  return s;
}

static std::vector<M15Match> m15_align(const std::vector<std::string>& hyp,
                                       const std::vector<std::string>& ref,
                                       const M15SynTable& syn,
                                       const M15ParTable& par) {
  const size_t H = hyp.size() < 128 ? hyp.size() : 128;
  const size_t R = ref.size() < 128 ? ref.size() : 128;
  std::vector<std::string> hs(H), rs(R);
  for (size_t i = 0; i < H; ++i) hs[i] = porter(hyp[i]);
  for (size_t j = 0; j < R; ++j) rs[j] = porter(ref[j]);
  // candidates per hyp index: one per (i, j) pair, best module wins
  // (exact elif stem elif synonym — matching meteor15.py _collect_matches)
  std::vector<std::vector<M15Match>> by_start(H);
  for (size_t i = 0; i < H; ++i)
    for (size_t j = 0; j < R; ++j) {
      if (hyp[i] == ref[j])
        by_start[i].push_back({(int)i, 1, (int)j, 1, 0});
      else if (hs[i] == rs[j])
        by_start[i].push_back({(int)i, 1, (int)j, 1, 1});
      else if (m15_syn_share(syn, hyp[i], ref[j]))
        by_start[i].push_back({(int)i, 1, (int)j, 1, 2});
    }
  if (!par.empty()) {
    // paraphrase spans, mirroring _collect_matches: hyp span index by
    // string, then ref spans (j-major, length ascending) looked up
    const size_t MAXL = 4;
    std::unordered_map<std::string, std::vector<std::pair<int, int>>> hspans;
    for (size_t i = 0; i < H; ++i)
      for (size_t l = 1; l <= MAXL && i + l <= H; ++l)
        hspans[m15_join(hyp, i, l)].push_back({(int)i, (int)l});
    for (size_t j = 0; j < R; ++j)
      for (size_t l = 1; l <= MAXL && j + l <= R; ++l) {
        auto it = par.find(m15_join(ref, j, l));
        if (it == par.end()) continue;
        for (const auto& alt : it->second) {
          auto hit = hspans.find(alt);
          if (hit == hspans.end()) continue;
          for (const auto& ih : hit->second)
            by_start[ih.first].push_back(
                {ih.first, ih.second, (int)j, (int)l, 3});
        }
      }
  }

  std::vector<M15State> states{{0, 0, 0, 0, {}, 0}};
  std::vector<M15State> next;
  for (size_t i = 0; i < H; ++i) {
    next.clear();
    uint64_t ibit0 = i < 64 ? (1ULL << i) : 0;
    uint64_t ibit1 = i >= 64 ? (1ULL << (i - 64)) : 0;
    for (const auto& st : states) {
      next.push_back(st);  // skip position i
      if ((st.hmask0 & ibit0) || (st.hmask1 & ibit1))
        continue;  // position consumed by an earlier span
      for (const auto& c : by_start[i]) {
        uint64_t hb0, hb1, rb0, rb1;
        m15_span_bits(c.h, c.hl, hb0, hb1);
        m15_span_bits(c.r, c.rl, rb0, rb1);
        if ((st.hmask0 & hb0) || (st.hmask1 & hb1) || (st.rmask0 & rb0) ||
            (st.rmask1 & rb1))
          continue;
        M15State ns = st;
        ns.hmask0 |= hb0;
        ns.hmask1 |= hb1;
        ns.rmask0 |= rb0;
        ns.rmask1 |= rb1;
        ns.ms.push_back(c);
        ns.dist += c.h > c.r ? c.h - c.r : c.r - c.h;
        next.push_back(std::move(ns));
      }
    }
    std::stable_sort(next.begin(), next.end(),
                     [](const M15State& a, const M15State& b) {
                       // most covered words (both sides), fewest chunks,
                       // smallest distance — meteor15._align rank
                       int ca_cov = 0, cb_cov = 0;
                       ca_cov = __builtin_popcountll(a.hmask0) +
                                __builtin_popcountll(a.hmask1) +
                                __builtin_popcountll(a.rmask0) +
                                __builtin_popcountll(a.rmask1);
                       cb_cov = __builtin_popcountll(b.hmask0) +
                                __builtin_popcountll(b.hmask1) +
                                __builtin_popcountll(b.rmask0) +
                                __builtin_popcountll(b.rmask1);
                       if (ca_cov != cb_cov) return ca_cov > cb_cov;
                       int ca = m15_chunks(a.ms), cb = m15_chunks(b.ms);
                       if (ca != cb) return ca < cb;
                       return a.dist < b.dist;
                     });
    if (next.size() > 40) next.resize(40);
    states = next;
  }
  return states.empty() ? std::vector<M15Match>{} : states[0].ms;
}

struct M15Stats { double pn, pd, rn, rd, m, ch; };

static double m15_score(const M15Stats& s) {
  if (s.pd <= 0 || s.rd <= 0 || s.m <= 0) return 0.0;
  double p = s.pn / s.pd, r = s.rn / s.rd;
  if (p <= 0 || r <= 0) return 0.0;
  double f = p * r / (0.85 * p + 0.15 * r);
  double pen = 0.6 * std::pow(s.ch / s.m, 0.2);
  return f * (1.0 - pen);
}

// Returns malloc'd double[n + 1]: [corpus, per_segment...].
// function_words: space-separated list; synonyms: one synset per line
// ('\n'-separated), space-separated member words — both passed from the
// Python side so the two implementations always share one data source
// (evaluation/data/ bundles or the OPENVIIC_METEOR_* overrides).
// paraphrases: '\n'-separated "phrase ||| paraphrase" lines (the
// convert_meteor_paraphrase.py output format); both directions are
// added here, matching meteor15._paraphrase_table.
double* ov_meteor15_score_par(const char* gens, const char* refs,
                              const char* function_words,
                              const char* synonyms,
                              const char* paraphrases) {
  std::vector<std::string> gen_recs = split(gens, '\x1e');
  std::vector<std::string> ref_recs = split(refs, '\x1e');
  size_t n = gen_recs.size();
  if (ref_recs.size() != n) return nullptr;
  std::unordered_map<std::string, bool> func;
  for (const auto& w : tokens_of(function_words)) func[w] = true;
  M15SynTable syn;
  if (synonyms && *synonyms) {
    std::vector<std::string> lines = split(synonyms, '\n');
    for (size_t li = 0; li < lines.size(); ++li)
      for (const auto& w : tokens_of(lines[li]))
        syn[w].push_back((int)li);
  }
  M15ParTable par;
  if (paraphrases && *paraphrases) {
    for (const auto& line : split(paraphrases, '\n')) {
      size_t sep = line.find("|||");
      if (sep == std::string::npos) continue;
      std::string a = line.substr(0, sep), b = line.substr(sep + 3);
      // trim — include '\r' so CRLF table files match the Python
      // scorer (meteor15._load_lines rstrips only '\n', so a stray
      // '\r' would otherwise produce phrases that never match)
      auto trim = [](std::string& s) {
        size_t x = s.find_first_not_of(" \t\r");
        size_t y = s.find_last_not_of(" \t\r");
        s = x == std::string::npos ? "" : s.substr(x, y - x + 1);
      };
      trim(a);
      trim(b);
      if (a.empty() || b.empty() || a == b) continue;
      // dedupe pairs (meteor15._paraphrase_table stores sets —
      // duplicate lines must not shift alignment tie-breaks)
      auto add_once = [&](const std::string& k, const std::string& v) {
        auto& vec = par[k];
        for (const auto& e : vec)
          if (e == v) return;
        vec.push_back(v);
      };
      add_once(a, b);
      add_once(b, a);
    }
  }
  const double DELTA = 0.75;
  const double WMOD[4] = {1.0, 0.6, 0.8, 0.6};
  auto wt = [&](const std::string& w) {
    return func.count(w) ? 1.0 - DELTA : DELTA;
  };

  double* out = static_cast<double*>(malloc(sizeof(double) * (n + 1)));
  M15Stats agg{0, 0, 0, 0, 0, 0};
  for (size_t i = 0; i < n; ++i) {
    std::vector<std::string> hyp = tokens_of(gen_recs[i]);
    double best = -1.0;
    M15Stats best_stats{0, 0, 0, 0, 0, 0};
    for (const auto& r : split(ref_recs[i], '\x1f')) {
      std::vector<std::string> ref = tokens_of(r);
      std::vector<M15Match> ms = m15_align(hyp, ref, syn, par);
      M15Stats s{0, 0, 0, 0, 0, 0};
      long mh = 0, mr = 0;
      for (const auto& m : ms) {
        double pw = 0, rw = 0;
        for (int k = m.h; k < m.h + m.hl; ++k) pw += wt(hyp[k]);
        for (int k = m.r; k < m.r + m.rl; ++k) rw += wt(ref[k]);
        s.pn += WMOD[m.mod] * pw;
        s.rn += WMOD[m.mod] * rw;
        mh += m.hl;
        mr += m.rl;
      }
      for (const auto& w : hyp) s.pd += wt(w);
      for (const auto& w : ref) s.rd += wt(w);
      s.m = 0.5 * (double)(mh + mr);  // matched words avg over sides
      s.ch = (double)m15_chunks(ms);
      double sc = m15_score(s);
      if (sc > best) { best = sc; best_stats = s; }
    }
    out[i + 1] = best < 0 ? 0.0 : best;
    agg.pn += best_stats.pn; agg.pd += best_stats.pd;
    agg.rn += best_stats.rn; agg.rd += best_stats.rd;
    agg.m += best_stats.m; agg.ch += best_stats.ch;
  }
  out[0] = m15_score(agg);
  return out;
}

double* ov_meteor15_score_syn(const char* gens, const char* refs,
                              const char* function_words,
                              const char* synonyms) {
  return ov_meteor15_score_par(gens, refs, function_words, synonyms, "");
}

// Back-compat 3-arg entry point (pre-round-3 binding): no synonym stage.
double* ov_meteor15_score(const char* gens, const char* refs,
                          const char* function_words) {
  return ov_meteor15_score_par(gens, refs, function_words, "", "");
}

// -------------------------------------------------- PTB tokenizer
// Port of openviic_tpu/evaluation/ptb_tokenizer.py (which itself mirrors
// the reference's CoreNLP invocation + punctuation removal).
static bool is_punct_token(const std::string& t) {
  static const char* drop[] = {"''", "'", "``", "`", "-LRB-", "-RRB-",
                               "-LCB-", "-RCB-", ".", "?", "!", ",", ":",
                               "-", "--", "...", ";"};
  for (auto* d : drop)
    if (t == d) return true;
  return false;
}

char* ov_ptb_tokenize(const char* input) {
  // records separated by '\x1e'; output likewise
  std::vector<std::string> recs = split(input, '\x1e');
  std::string result;
  for (size_t ri = 0; ri < recs.size(); ++ri) {
    std::string s = " " + recs[ri] + " ";
    // contractions: n't / 's / 're / 've / 'll / 'd / 'm
    static const char* contr[] = {"n't", "'s", "'re", "'ve", "'ll", "'d", "'m"};
    std::string t;
    for (size_t i = 0; i < s.size();) {
      bool matched = false;
      if (s[i] == '\'' || (s[i] == 'n' && i + 2 < s.size() && s[i + 1] == '\'')) {
        for (auto* c : contr) {
          size_t l = strlen(c);
          if (s.compare(i, l, c) == 0 &&
              (i + l >= s.size() || !isalnum((unsigned char)s[i + l])) &&
              i > 0 && isalnum((unsigned char)s[i - 1])) {
            t += ' ';
            t += c;
            i += l;
            matched = true;
            break;
          }
        }
      }
      if (!matched) { t += s[i]; ++i; }
    }
    s.swap(t);
    // ellipsis placeholder
    std::string u;
    for (size_t i = 0; i < s.size();) {
      if (s.compare(i, 3, "...") == 0) { u += " \x01 "; i += 3; }
      else { u += s[i]; ++i; }
    }
    s.swap(u);
    std::string v;
    for (size_t i = 0; i < s.size(); ++i) {
      char c = s[i];
      switch (c) {
        case ';': case '@': case '#': case '$': case '%': case '&':
        case '!': case '?': case ',': case ':':
          v += ' '; v += c; v += ' '; break;
        case '.':
          if (i + 1 >= s.size() || s[i + 1] == ' ') { v += " . "; }
          else v += c;
          break;
        case '(': v += " -LRB- "; break;
        case ')': v += " -RRB- "; break;
        case '{': v += " -LCB- "; break;
        case '}': v += " -RCB- "; break;
        case '[': v += " -LSB- "; break;
        case ']': v += " -RSB- "; break;
        case '"': v += " '' "; break;
        default: v += c;
      }
    }
    s.swap(v);
    // "--"
    std::string w2;
    for (size_t i = 0; i < s.size();) {
      if (s.compare(i, 2, "--") == 0) { w2 += " -- "; i += 2; }
      else { w2 += s[i]; ++i; }
    }
    s.swap(w2);
    // split to tokens, drop punctuation, lowercase ASCII
    std::string line;
    for (auto& tok : tokens_of(s)) {
      std::string tk = tok == "\x01" ? "..." : tok;
      if (is_punct_token(tk)) continue;
      for (auto& ch : tk) ch = (char)tolower((unsigned char)ch);
      if (!line.empty()) line += ' ';
      line += tk;
    }
    if (ri) result += '\x1e';
    result += line;
  }
  char* out = static_cast<char*>(malloc(result.size() + 1));
  memcpy(out, result.c_str(), result.size() + 1);
  return out;
}

}  // extern "C"

// Vietnamese word segmentation: longest-matching over a word lexicon with
// Ripple-Down-Rules (RDR) corrections.
//
// Native replacement for the reference's VnCoreNLP Java segmenter invoked
// over HTTP (data_utils/utils.py:34-47; jar + RDR model stripped from the
// mount, SURVEY.md §2.1).  The engine:
//   1. initial segmentation: greedy longest match of syllable sequences
//      against a lexicon of multi-syllable words (up to 4 syllables, the
//      vast majority of Vietnamese compounds);
//   2. RDR correction pass: rules of the form
//         JOIN <prev> <w1> <w2>    -> join w1 w2 when preceded by prev
//         SPLIT <prev> <word>     -> split an underscore word after prev
//      ('*' wildcards allowed), loaded from a plain-text rules file —
//      exception rules that ripple over the base segmentation, the same
//      shape as VnCoreNLP's learned tree flattened to its fired leaves.
//
// Output convention matches VnCoreNLP: compound words joined with '_'.
//
// Build: native/build.sh (linked into libopenviic_native.so's sibling
// librdr_segmenter.so).

#include <cstring>
#include <cstdlib>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_set>
#include <vector>

// Additionally supports VnCoreNLP's *original* model serialization: the
// SCRDR (Single-Classification Ripple-Down-Rules) tree text format of
// RDRsegmenter (Nguyen et al. 2018), the engine inside VnCoreNLP's
// wordsegmenter.rdr.  Lines are depth-first with tab indentation:
//
//   True : object.conclusion = "B"
//   \t object.tag == "I" and object.word == "xyz" : object.conclusion = "B"
//   \t\t object.prevWord1 == "abc" : object.conclusion = "I"
//
// A line one level deeper than its predecessor is that node's *except*
// child; a line at the same depth is the *else* sibling of the previous
// node at that depth.  Evaluation walks except-on-match / else-on-miss and
// the deepest satisfied node's conclusion (a B/I tag) wins.  Syllables are
// first tagged B/I by lexicon longest-matching, then corrected per
// position by the tree over a context of
// {word, prevWord1/2, nextWord1/2, tag, prevTag1/2, nextTag1/2}.

#include <map>

namespace {

struct Rule {
  int kind;  // 0 = JOIN, 1 = SPLIT
  std::string prev, a, b;  // SPLIT uses only `a`
};

struct ScrdrNode {
  std::vector<std::pair<std::string, std::string>> cond;  // attr == value, all
  std::string conclusion;                                 // "B" or "I"
  int except_child = -1;
  int else_child = -1;
};

struct Segmenter {
  std::unordered_set<std::string> lexicon;  // "syl1 syl2[ syl3[ syl4]]"
  std::vector<Rule> rules;
  std::vector<ScrdrNode> tree;  // tree[0] is the root when non-empty
  int max_word_syllables = 4;
};

std::vector<std::string> split_ws(const std::string& s) {
  std::vector<std::string> out;
  std::istringstream iss(s);
  std::string tok;
  while (iss >> tok) out.push_back(tok);
  return out;
}

std::string join(const std::vector<std::string>& parts, size_t i, size_t n,
                 char sep) {
  std::string out;
  for (size_t k = 0; k < n; ++k) {
    if (k) out += sep;
    out += parts[i + k];
  }
  return out;
}

bool match(const std::string& pattern, const std::string& value) {
  return pattern == "*" || pattern == value;
}

std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

// parse `object.attr == "value"` conjunctions; returns false on `True`
bool parse_condition(const std::string& text, ScrdrNode* node) {
  std::string t = trim(text);
  if (t == "True") return true;
  size_t pos = 0;
  while (pos < t.size()) {
    size_t dot = t.find("object.", pos);
    if (dot == std::string::npos) break;
    size_t eq = t.find("==", dot);
    if (eq == std::string::npos) return false;
    std::string attr = trim(t.substr(dot + 7, eq - dot - 7));
    size_t q1 = t.find('"', eq);
    if (q1 == std::string::npos) return false;
    size_t q2 = t.find('"', q1 + 1);
    if (q2 == std::string::npos) return false;
    node->cond.emplace_back(attr, t.substr(q1 + 1, q2 - q1 - 1));
    pos = q2 + 1;
  }
  return !node->cond.empty();
}

// SCRDR walk: except-on-match / else-on-miss; deepest satisfied wins
const ScrdrNode* find_fired(const Segmenter& seg,
                            const std::map<std::string, std::string>& ctx) {
  if (seg.tree.empty()) return nullptr;
  const ScrdrNode* fired = &seg.tree[0];
  int cur = seg.tree[0].except_child;
  while (cur >= 0) {
    const ScrdrNode& node = seg.tree[cur];
    bool ok = true;
    for (const auto& c : node.cond) {
      auto it = ctx.find(c.first);
      if (it == ctx.end() || it->second != c.second) { ok = false; break; }
    }
    if (ok) {
      fired = &node;
      cur = node.except_child;
    } else {
      cur = node.else_child;
    }
  }
  return fired;
}

// longest-match B/I tagging + SCRDR corrections -> '_'-joined words
std::vector<std::string> scrdr_segment(const Segmenter& seg,
                                       const std::vector<std::string>& syls) {
  // 1. initial tags from lexicon longest matching (B = word begin)
  std::vector<char> tags(syls.size(), 'B');
  size_t i = 0;
  while (i < syls.size()) {
    size_t best = 1;
    size_t maxn = std::min((size_t)seg.max_word_syllables, syls.size() - i);
    for (size_t n = maxn; n >= 2; --n) {
      if (seg.lexicon.count(join(syls, i, n, ' '))) { best = n; break; }
    }
    for (size_t k = 1; k < best; ++k) tags[i + k] = 'I';
    i += best;
  }

  // 2. per-position SCRDR corrections over the *initial* tags
  std::vector<char> fixed(tags);
  auto word_at = [&](long k) -> std::string {
    return (k < 0 || k >= (long)syls.size()) ? "" : syls[k];
  };
  auto tag_at = [&](long k) -> std::string {
    return (k < 0 || k >= (long)tags.size()) ? "" : std::string(1, tags[k]);
  };
  for (long k = 0; k < (long)syls.size(); ++k) {
    std::map<std::string, std::string> ctx = {
        {"word", word_at(k)},
        {"prevWord1", word_at(k - 1)}, {"prevWord2", word_at(k - 2)},
        {"nextWord1", word_at(k + 1)}, {"nextWord2", word_at(k + 2)},
        {"tag", tag_at(k)},
        {"prevTag1", tag_at(k - 1)}, {"prevTag2", tag_at(k - 2)},
        {"nextTag1", tag_at(k + 1)}, {"nextTag2", tag_at(k + 2)},
    };
    const ScrdrNode* fired = find_fired(seg, ctx);
    if (fired && (fired->conclusion == "B" || fired->conclusion == "I"))
      fixed[k] = fired->conclusion[0];
  }
  fixed[0] = 'B';  // a sentence cannot start inside a word

  // 3. rebuild words: I-tagged syllables join their predecessor
  std::vector<std::string> words;
  for (size_t k = 0; k < syls.size(); ++k) {
    if (fixed[k] == 'I' && !words.empty())
      words.back() += "_" + syls[k];
    else
      words.push_back(syls[k]);
  }
  return words;
}

}  // namespace

extern "C" {

void* rdr_new() { return new Segmenter(); }
void rdr_delete(void* h) { delete static_cast<Segmenter*>(h); }

// lexicon file: one word per line, syllables space-separated
int rdr_load_lexicon(void* h, const char* path) {
  auto* seg = static_cast<Segmenter*>(h);
  std::ifstream in(path);
  if (!in) return -1;
  std::string line;
  int n = 0;
  while (std::getline(in, line)) {
    std::vector<std::string> syls = split_ws(line);
    if (syls.size() < 2) continue;  // single syllables need no joining
    if ((int)syls.size() > seg->max_word_syllables) continue;
    seg->lexicon.insert(join(syls, 0, syls.size(), ' '));
    ++n;
  }
  return n;
}

int rdr_add_word(void* h, const char* word) {
  auto* seg = static_cast<Segmenter*>(h);
  std::vector<std::string> syls = split_ws(word);
  if (syls.size() < 2 || (int)syls.size() > seg->max_word_syllables) return 0;
  seg->lexicon.insert(join(syls, 0, syls.size(), ' '));
  return 1;
}

// rules file: lines "JOIN <prev> <w1> <w2>" or "SPLIT <prev> <word_with_underscores>"
int rdr_load_rules(void* h, const char* path) {
  auto* seg = static_cast<Segmenter*>(h);
  std::ifstream in(path);
  if (!in) return -1;
  std::string line;
  int n = 0;
  while (std::getline(in, line)) {
    std::vector<std::string> parts = split_ws(line);
    if (parts.empty() || parts[0][0] == '#') continue;
    if (parts[0] == "JOIN" && parts.size() == 4) {
      seg->rules.push_back({0, parts[1], parts[2], parts[3]});
      ++n;
    } else if (parts[0] == "SPLIT" && parts.size() == 3) {
      seg->rules.push_back({1, parts[1], parts[2], ""});
      ++n;
    }
  }
  return n;
}

// VnCoreNLP / RDRsegmenter SCRDR tree file; returns node count or -1
int rdr_load_scrdr(void* h, const char* path) {
  auto* seg = static_cast<Segmenter*>(h);
  std::ifstream in(path);
  if (!in) return -1;
  seg->tree.clear();
  std::string line;
  std::vector<int> last_at_depth;  // node index of the last line per depth
  while (std::getline(in, line)) {
    size_t depth = 0;
    while (depth < line.size() && line[depth] == '\t') ++depth;
    std::string body = trim(line);
    if (body.empty()) continue;
    size_t sep = body.find(" : ");
    if (sep == std::string::npos) continue;
    ScrdrNode node;
    // a condition that fails to parse must not become an empty (always-
    // firing) node silently corrupting every tag — reject the model
    if (!parse_condition(body.substr(0, sep), &node)) {
      seg->tree.clear();
      return -1;
    }
    std::string concl = body.substr(sep + 3);
    size_t q1 = concl.find('"');
    size_t q2 = (q1 == std::string::npos) ? q1 : concl.find('"', q1 + 1);
    if (q2 != std::string::npos)
      node.conclusion = concl.substr(q1 + 1, q2 - q1 - 1);
    int idx = (int)seg->tree.size();
    if (idx == 0) {
      if (depth != 0) { seg->tree.clear(); return -1; }  // root must lead
    } else if (depth >= last_at_depth.size()) {
      if (depth != last_at_depth.size()) { seg->tree.clear(); return -1; }
      seg->tree[last_at_depth.back()].except_child = idx;  // first child
    } else {
      seg->tree[last_at_depth[depth]].else_child = idx;  // next sibling
    }
    last_at_depth.resize(depth);
    last_at_depth.push_back(idx);
    seg->tree.push_back(std::move(node));
  }
  return (int)seg->tree.size();
}

// segment one sentence; caller frees with free()
char* rdr_segment(void* h, const char* sentence) {
  auto* seg = static_cast<Segmenter*>(h);
  std::vector<std::string> syls = split_ws(sentence);
  std::vector<std::string> words;

  if (!seg->tree.empty() && !syls.empty()) {
    // original-model path: B/I tagging + SCRDR tree corrections
    words = scrdr_segment(*seg, syls);
  } else {
  // 1. longest matching
  size_t i = 0;
  while (i < syls.size()) {
    size_t best = 1;
    size_t maxn = std::min((size_t)seg->max_word_syllables, syls.size() - i);
    for (size_t n = maxn; n >= 2; --n) {
      if (seg->lexicon.count(join(syls, i, n, ' '))) { best = n; break; }
    }
    words.push_back(join(syls, i, best, '_'));
    i += best;
  }
  }

  // 2. RDR corrections (single ripple pass, first matching rule fires)
  for (const auto& rule : seg->rules) {
    if (rule.kind == 0) {  // JOIN w1 w2 -> w1_w2
      std::vector<std::string> out;
      for (size_t k = 0; k < words.size(); ++k) {
        const std::string prev = out.empty() ? std::string("<s>") : out.back();
        if (k + 1 < words.size() && match(rule.prev, prev) &&
            words[k] == rule.a && words[k + 1] == rule.b) {
          out.push_back(words[k] + "_" + words[k + 1]);
          ++k;
        } else {
          out.push_back(words[k]);
        }
      }
      words.swap(out);
    } else {  // SPLIT word -> syllables
      std::vector<std::string> out;
      for (size_t k = 0; k < words.size(); ++k) {
        const std::string prev = out.empty() ? std::string("<s>") : out.back();
        if (match(rule.prev, prev) && words[k] == rule.a) {
          std::string w = words[k];
          for (auto& c : w)
            if (c == '_') c = ' ';
          for (auto& piece : split_ws(w)) out.push_back(piece);
        } else {
          out.push_back(words[k]);
        }
      }
      words.swap(out);
    }
  }

  std::string result;
  for (size_t k = 0; k < words.size(); ++k) {
    if (k) result += ' ';
    result += words[k];
  }
  char* out = static_cast<char*>(malloc(result.size() + 1));
  memcpy(out, result.c_str(), result.size() + 1);
  return out;
}

}  // extern "C"

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

namespace {

struct Rule {
  int kind;  // 0 = JOIN, 1 = SPLIT
  std::string prev, a, b;  // SPLIT uses only `a`
};

struct Segmenter {
  std::unordered_set<std::string> lexicon;  // "syl1 syl2[ syl3[ syl4]]"
  std::vector<Rule> rules;
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

// segment one sentence; caller frees with free()
char* rdr_segment(void* h, const char* sentence) {
  auto* seg = static_cast<Segmenter*>(h);
  std::vector<std::string> syls = split_ws(sentence);
  std::vector<std::string> words;

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

// Native host-side data-pipeline kernels (C++17, no dependencies).
//
// The TPU compute path is JAX/XLA/Pallas; the HOST hot loops of the
// data pipeline — BPE application (processors/bpe.py) and
// vocabulary id-encoding (vocabulary.py sentences_to_tensor) — run
// per token in Python and become the input bottleneck on large
// corpora (the reference leaned on subword_nmt + TF's C++ feed
// runtime for the same roles). This library implements byte-exact
// equivalents behind a ctypes boundary; Python remains the reference
// implementation and the fallback (NM_NATIVE=0, or no compiler).
//
// Batch-oriented C ABI: sentences travel as one UTF-8 blob
// ('\n' between sentences, ' ' between tokens) so one FFI call
// amortizes over a whole batch. All returned buffers are malloc'd
// and released with nm_free.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------- //
// small utilities
// ---------------------------------------------------------------- //

// split a UTF-8 string into codepoint-sized chunks (Python iterates
// *characters*, so merge symbols must too)
std::vector<std::string> utf8_chars(const std::string &word) {
    std::vector<std::string> out;
    size_t i = 0;
    while (i < word.size()) {
        unsigned char c = word[i];
        size_t n = 1;
        if ((c & 0x80u) == 0x00u) n = 1;
        else if ((c & 0xE0u) == 0xC0u) n = 2;
        else if ((c & 0xF0u) == 0xE0u) n = 3;
        else if ((c & 0xF8u) == 0xF0u) n = 4;
        if (i + n > word.size()) n = 1;  // malformed byte: keep as-is
        out.emplace_back(word, i, n);
        i += n;
    }
    return out;
}

struct PairHash {
    size_t operator()(const std::pair<std::string, std::string> &p)
        const noexcept {
        std::hash<std::string> h;
        size_t a = h(p.first), b = h(p.second);
        return a ^ (b + 0x9e3779b97f4a7c15ULL + (a << 6) + (a >> 2));
    }
};

char *dup_string(const std::string &s) {
    char *out = static_cast<char *>(std::malloc(s.size() + 1));
    if (out != nullptr) std::memcpy(out, s.c_str(), s.size() + 1);
    return out;
}

// ---------------------------------------------------------------- //
// BPE codec (mirrors processors/bpe.py BPECodec exactly)
// ---------------------------------------------------------------- //

struct BpeCodec {
    std::unordered_map<std::pair<std::string, std::string>, int,
                       PairHash> codes;
    std::unordered_map<std::string, std::string> cache;  // word -> joined
    // ctypes releases the GIL around calls, so the training loop's
    // prefetch thread can encode concurrently with validation on the
    // main thread; the word cache mutates and needs the lock
    // (references into the node-based map stay valid after insert)
    std::mutex cache_mutex;
    std::string separator;
    int version_major = 0;
    int version_minor = 1;

    // encode one word into separator-joined subwords ("ab@@ c")
    const std::string &encode_word(const std::string &word) {
        std::lock_guard<std::mutex> guard(cache_mutex);
        auto hit = cache.find(word);
        if (hit != cache.end()) return hit->second;

        std::vector<std::string> symbols = utf8_chars(word);
        if (symbols.empty()) return cache.emplace(word, "").first->second;
        if (version_major > 0 || version_minor >= 2) {
            symbols.back() += "</w>";
        } else {
            symbols.emplace_back("</w>");
        }

        while (symbols.size() > 1) {
            // lowest rank wins; ties break to the LEFTMOST position
            // (Python: min over (rank, index) tuples)
            int best_rank = INT32_MAX;
            size_t best_i = 0;
            for (size_t i = 0; i + 1 < symbols.size(); ++i) {
                auto it = codes.find({symbols[i], symbols[i + 1]});
                if (it != codes.end() && it->second < best_rank) {
                    best_rank = it->second;
                    best_i = i;
                }
            }
            if (best_rank == INT32_MAX) break;
            const std::string first = symbols[best_i];
            const std::string second = symbols[best_i + 1];
            const std::string merged = first + second;
            // replace every (first, second) occurrence left-to-right
            std::vector<std::string> out;
            out.reserve(symbols.size());
            for (size_t i = 0; i < symbols.size();) {
                if (i + 1 < symbols.size() && symbols[i] == first &&
                    symbols[i + 1] == second) {
                    out.push_back(merged);
                    i += 2;
                } else {
                    out.push_back(symbols[i]);
                    i += 1;
                }
            }
            symbols.swap(out);
        }

        // strip the end-of-word marker
        if (symbols.back() == "</w>") {
            symbols.pop_back();
        } else if (symbols.back().size() >= 4 &&
                   symbols.back().compare(symbols.back().size() - 4, 4,
                                          "</w>") == 0) {
            symbols.back().resize(symbols.back().size() - 4);
        }
        std::string joined;
        for (size_t i = 0; i < symbols.size(); ++i) {
            if (i != 0) joined += ' ';
            joined += symbols[i];
            if (i + 1 < symbols.size()) joined += separator_marker();
        }
        return cache.emplace(word, std::move(joined)).first->second;
    }

    // the separator is appended to every subword but the last; it is
    // glued to the token itself (before the space)
    const std::string &separator_marker() const { return separator; }
};

// ---------------------------------------------------------------- //
// vocabulary (mirrors vocabulary.py sentences_to_tensor)
// ---------------------------------------------------------------- //

struct Vocab {
    std::unordered_map<std::string, int32_t> word_to_index;
};

constexpr int32_t PAD_INDEX = 0;
constexpr int32_t START_INDEX = 1;
constexpr int32_t END_INDEX = 2;
constexpr int32_t UNK_INDEX = 3;

}  // namespace

extern "C" {

void nm_free(void *p) { std::free(p); }

// merges_blob: '\n'-separated "first second" lines in rank order
// (duplicates keep their first rank, as in Python's dict.setdefault)
void *nm_bpe_new(const char *merges_blob, const char *separator,
                 int version_major, int version_minor) {
    auto *codec = new BpeCodec();
    codec->separator = separator;
    codec->version_major = version_major;
    codec->version_minor = version_minor;
    const char *p = merges_blob;
    int rank = 0;
    while (*p != '\0') {
        const char *nl = std::strchr(p, '\n');
        size_t len = (nl != nullptr) ? static_cast<size_t>(nl - p)
                                     : std::strlen(p);
        std::string line(p, len);
        size_t sp = line.find(' ');
        if (sp != std::string::npos) {
            std::pair<std::string, std::string> pair{
                line.substr(0, sp), line.substr(sp + 1)};
            codec->codes.emplace(pair, rank);
            ++rank;
        }
        if (nl == nullptr) break;
        p = nl + 1;
    }
    return codec;
}

void nm_bpe_free(void *handle) {
    delete static_cast<BpeCodec *>(handle);
}

// text: sentences separated by '\n', tokens by ' '. Returns the
// encoded text in the same layout (malloc'd; free with nm_free).
char *nm_bpe_encode_lines(void *handle, const char *text) {
    auto *codec = static_cast<BpeCodec *>(handle);
    std::string out;
    out.reserve(std::strlen(text) * 2);
    const char *p = text;
    bool first_tok = true;
    std::string word;
    auto flush_word = [&]() {
        if (word.empty()) return;
        const std::string &enc = codec->encode_word(word);
        if (!enc.empty()) {
            if (!first_tok) out += ' ';
            out += enc;
            first_tok = false;
        }
        word.clear();
    };
    for (;; ++p) {
        char c = *p;
        if (c == ' ' || c == '\n' || c == '\0') {
            flush_word();
            if (c == '\n') {
                out += '\n';
                first_tok = true;
            }
            if (c == '\0') break;
        } else {
            word += c;
        }
    }
    return dup_string(out);
}

// words_blob: '\n'-separated tokens in index order (specials included)
void *nm_vocab_new(const char *words_blob) {
    auto *vocab = new Vocab();
    const char *p = words_blob;
    int32_t index = 0;
    while (*p != '\0') {
        const char *nl = std::strchr(p, '\n');
        size_t len = (nl != nullptr) ? static_cast<size_t>(nl - p)
                                     : std::strlen(p);
        vocab->word_to_index.emplace(std::string(p, len), index);
        ++index;
        if (nl == nullptr) break;
        p = nl + 1;
    }
    return vocab;
}

void nm_vocab_free(void *handle) {
    delete static_cast<Vocab *>(handle);
}

// Pass 1: number of sentences and the longest TRUNCATED token count
// (max_len < 0 means no cap). Mirrors sentences_to_tensor's
// tgt_len = max(len(s)) computation before specials.
void nm_vocab_measure(const char *text, int32_t max_len,
                      int32_t *n_sentences, int32_t *max_tokens) {
    int32_t sents = 0, mx = 0, cur = 0;
    bool in_tok = false, any = (*text != '\0');
    for (const char *p = text;; ++p) {
        char c = *p;
        if (c == ' ' || c == '\n' || c == '\0') {
            if (in_tok) { ++cur; in_tok = false; }
            if (c == '\n' || c == '\0') {
                if (max_len >= 0 && cur > max_len) cur = max_len;
                if (cur > mx) mx = cur;
                if (c == '\n') { ++sents; cur = 0; }
                if (c == '\0') break;
            }
        } else {
            in_tok = true;
        }
    }
    *n_sentences = any ? sents + 1 : 0;
    *max_tokens = mx;
}

// Pass 2: fill preallocated (batch, tgt_len) int32 ids (PAD-filled by
// the caller) and float32 mask (zero-filled). Semantics match
// vocabulary.sentences_to_tensor (truncate to max_len BEFORE
// specials; clip to tgt_len after). rows_out/tokens_out report what
// the blob actually contained — the caller compares them against
// len(sentences) / sum(len(s)) to detect tokens that carried the
// blob delimiters (or empty-string tokens, which Python encodes as
// <unk> but the blob cannot represent) and falls back to Python.
void nm_vocab_encode(void *handle, const char *text, int32_t batch,
                     int32_t tgt_len, int32_t max_len,
                     int32_t add_start, int32_t add_end,
                     int32_t *ids, float *mask,
                     int32_t *rows_out, int64_t *tokens_out) {
    auto *vocab = static_cast<Vocab *>(handle);
    int32_t row = 0, col = 0, n_toks = 0;
    int64_t total_toks = 0;
    std::string word;
    auto emit = [&](int32_t id) {
        if (row < batch && col < tgt_len) {
            ids[row * tgt_len + col] = id;
            mask[row * tgt_len + col] = 1.0f;
            ++col;
        }
    };
    auto flush_word = [&]() {
        if (word.empty()) return;
        if (max_len < 0 || n_toks < max_len) {
            auto it = vocab->word_to_index.find(word);
            emit(it != vocab->word_to_index.end() ? it->second
                                                  : UNK_INDEX);
        }
        ++n_toks;
        ++total_toks;
        word.clear();
    };
    if (add_start) emit(START_INDEX);
    for (const char *p = text;; ++p) {
        char c = *p;
        if (c == ' ' || c == '\n' || c == '\0') {
            flush_word();
            if (c == '\n' || c == '\0') {
                if (add_end) emit(END_INDEX);
                if (c == '\0') break;
                ++row;
                col = 0;
                n_toks = 0;
                if (add_start) emit(START_INDEX);
            }
        } else {
            word += c;
        }
    }
    *rows_out = row + 1;
    *tokens_out = total_toks;
}

}  // extern "C"

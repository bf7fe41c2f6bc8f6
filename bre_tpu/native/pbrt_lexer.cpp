// Native .pbrt tokenizer — the C++ runtime piece of the scene loader.
//
// Replaces the reference's flex lexer (/root/reference/src/core/pbrtlex.ll,
// generated pbrtlex.cpp, ~2,381 LoC): same token classes (quoted strings
// keeping their quotes, '[' / ']', bare words/numbers; '#' comments dropped).
// Exposed to Python via ctypes (bre_tpu/native/__init__.py); scene loading is
// host-side runtime work, which is exactly where the reference is C++ — the
// TPU compute path stays JAX/Pallas.
//
// API: tokenize into (start, length) pairs over the input buffer; returns the
// token count, or -(needed) when max_tokens is too small so the caller can
// retry with a larger buffer.

#include <cstdint>

extern "C" {

int64_t pbrt_tokenize(const char* text, int64_t n,
                      int64_t* starts, int64_t* lens, int64_t max_tokens) {
    int64_t count = 0;
    int64_t i = 0;
    while (i < n) {
        char c = text[i];
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
            ++i;
            continue;
        }
        if (c == '#') {  // comment to end of line (pbrtlex.ll comment rule)
            while (i < n && text[i] != '\n') ++i;
            continue;
        }
        int64_t start = i;
        if (c == '"') {  // quoted string, quotes kept
            ++i;
            while (i < n && text[i] != '"') ++i;
            if (i < n) ++i;  // closing quote
        } else if (c == '[' || c == ']') {
            ++i;
        } else {  // bare word / number
            while (i < n) {
                char d = text[i];
                if (d == ' ' || d == '\t' || d == '\n' || d == '\r' ||
                    d == '"' || d == '[' || d == ']' || d == '#')
                    break;
                ++i;
            }
        }
        if (count < max_tokens) {
            starts[count] = start;
            lens[count] = i - start;
        }
        ++count;
    }
    return (count <= max_tokens) ? count : -count;
}

}  // extern "C"

// Native build-pipeline kernels for kaamer-tpu.
//
// The reference's build hot path is Go goroutines feeding an LSM tree
// (makedb/inputFASTA.go:245-248 + Badger compaction).  Here the database
// build is a sort pipeline over flat arrays, and these C++ kernels keep the
// host side of that pipeline at memory-bandwidth speed:
//
//   kt_extract_pairs : encode all sliding-window 7-mers of a batch of
//                      sequences into (kmer<<32 | row) uint64 pairs,
//                      multithreaded over sequences.  Exact same codec as
//                      kaamer_tpu/codec.py (pair codes 22 + a*21 + b, 0 for
//                      invalid; final residue 5 bits).
//   kt_sort_u64      : parallel LSD radix sort (8x8-bit passes, per-thread
//                      histograms).
//   kt_parse_fasta   : FASTA scanner over an in-memory buffer -> concatenated
//                      uppercased sequences + headers with offsets.
//
// Built with plain g++ (no Python headers); bound via ctypes.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

static int8_t CHAR_CODE[256];
static bool CODE_INIT = false;

static void init_codes() {
    if (CODE_INIT) return;
    const char* alpha = "ACDEFGHIKLMNPQRSTUVWY";
    for (int i = 0; i < 256; i++) CHAR_CODE[i] = -1;
    for (int i = 0; alpha[i]; i++) CHAR_CODE[(uint8_t)alpha[i]] = (int8_t)i;
    CODE_INIT = true;
}

static inline uint32_t pair_code(int a, int b) {
    return (a >= 0 && b >= 0) ? (uint32_t)(22 + a * 21 + b) : 0u;
}

// Encode all 7-mers of sequences given as one concatenated byte buffer with
// n+1 offsets.  out must have room for sum(len_i - 6 when len_i >= 7).
// rows written are row_base + i.  Returns the number of pairs written.
int64_t kt_extract_pairs(const uint8_t* seqs, const int64_t* offsets,
                         int64_t n_seqs, int64_t row_base, uint64_t* out,
                         int n_threads) {
    init_codes();
    if (n_threads < 1) n_threads = 1;

    // per-sequence output offsets (prefix sum of kmer counts)
    std::vector<int64_t> out_off(n_seqs + 1, 0);
    for (int64_t i = 0; i < n_seqs; i++) {
        int64_t len = offsets[i + 1] - offsets[i];
        out_off[i + 1] = out_off[i] + (len >= 7 ? len - 6 : 0);
    }

    auto worker = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const uint8_t* s = seqs + offsets[i];
            int64_t len = offsets[i + 1] - offsets[i];
            if (len < 7) continue;
            uint64_t* dst = out + out_off[i];
            uint64_t row = (uint64_t)(row_base + i);
            int c[7];
            for (int64_t k = 0; k + 7 <= len; k++) {
                for (int t = 0; t < 7; t++) c[t] = CHAR_CODE[s[k + t]];
                uint32_t v = (pair_code(c[0], c[1]) << 23) |
                             (pair_code(c[2], c[3]) << 14) |
                             (pair_code(c[4], c[5]) << 5) |
                             (uint32_t)(c[6] >= 0 ? c[6] : 0);
                dst[k] = ((uint64_t)v << 32) | row;
            }
        }
    };

    if (n_threads == 1 || n_seqs < 64) {
        worker(0, n_seqs);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (n_seqs + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; t++) {
            int64_t lo = t * chunk, hi = std::min(n_seqs, lo + chunk);
            if (lo < hi) ts.emplace_back(worker, lo, hi);
        }
        for (auto& t : ts) t.join();
    }
    return out_off[n_seqs];
}

// Parallel LSD radix sort of uint64 (8 passes of 8 bits).
void kt_sort_u64(uint64_t* data, int64_t n, int n_threads) {
    if (n <= 1) return;
    if (n_threads < 1) n_threads = 1;
    std::vector<uint64_t> tmp(n);
    uint64_t* src = data;
    uint64_t* dst = tmp.data();

    int64_t chunk = (n + n_threads - 1) / n_threads;

    for (int pass = 0; pass < 8; pass++) {
        int shift = pass * 8;
        // per-thread histograms
        std::vector<std::vector<int64_t>> hist(n_threads,
                                               std::vector<int64_t>(256, 0));
        {
            std::vector<std::thread> ts;
            for (int t = 0; t < n_threads; t++) {
                int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
                if (lo >= hi) continue;
                ts.emplace_back([&, t, lo, hi]() {
                    auto& h = hist[t];
                    for (int64_t i = lo; i < hi; i++)
                        h[(src[i] >> shift) & 0xFF]++;
                });
            }
            for (auto& t : ts) t.join();
        }
        // global exclusive prefix over (bucket, thread)
        int64_t total = 0;
        std::vector<std::vector<int64_t>> start(n_threads,
                                                std::vector<int64_t>(256, 0));
        for (int b = 0; b < 256; b++) {
            for (int t = 0; t < n_threads; t++) {
                start[t][b] = total;
                total += hist[t][b];
            }
        }
        // scatter
        {
            std::vector<std::thread> ts;
            for (int t = 0; t < n_threads; t++) {
                int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
                if (lo >= hi) continue;
                ts.emplace_back([&, t, lo, hi]() {
                    auto pos = start[t];
                    for (int64_t i = lo; i < hi; i++)
                        dst[pos[(src[i] >> shift) & 0xFF]++] = src[i];
                });
            }
            for (auto& t : ts) t.join();
        }
        std::swap(src, dst);
    }
    // 8 passes (even) -> result back in data
    if (src != data) std::memcpy(data, src, (size_t)n * 8);
}

// FASTA scanner.  input: raw (already gunzipped) file bytes.
// Outputs (caller-allocated, each sized >= input_len or n_max):
//   seq_buf / seq_off[n+1]      : concatenated uppercased sequences
//   hdr_buf / hdr_off[n+1]      : header lines (without '>')
// Returns the number of entries scanned (capped at n_max).
int64_t kt_parse_fasta(const uint8_t* input, int64_t input_len,
                       uint8_t* seq_buf, int64_t* seq_off,
                       uint8_t* hdr_buf, int64_t* hdr_off, int64_t n_max) {
    int64_t n = 0;
    int64_t sp = 0, hp = 0;
    seq_off[0] = 0;
    hdr_off[0] = 0;
    int64_t i = 0;
    bool in_entry = false;
    while (i < input_len) {
        // line [i, eol)
        int64_t eol = i;
        while (eol < input_len && input[eol] != '\n') eol++;
        int64_t end = eol;
        if (end > i && input[end - 1] == '\r') end--;
        if (end > i) {
            if (input[i] == '>') {
                if (in_entry) {
                    seq_off[n + 1] = sp;
                    hdr_off[n + 1] = hp;
                    n++;
                    if (n >= n_max) return n;
                }
                in_entry = true;
                std::memcpy(hdr_buf + hp, input + i + 1, (size_t)(end - i - 1));
                hp += end - i - 1;
            } else if (in_entry) {
                // strip spaces/tabs, uppercase
                for (int64_t k = i; k < end; k++) {
                    uint8_t c = input[k];
                    if (c == ' ' || c == '\t') continue;
                    if (c >= 'a' && c <= 'z') c -= 32;
                    seq_buf[sp++] = c;
                }
            }
        }
        i = eol + 1;
    }
    if (in_entry) {
        seq_off[n + 1] = sp;
        hdr_off[n + 1] = hp;
        n++;
    }
    return n;
}

}  // extern "C"

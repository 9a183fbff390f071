// Native host runtime for the TPU codec: the three inherently-serial hot
// loops that sit outside the JAX/Pallas compute path.
//
//   * walk_offsets       — decode-side offset recovery over variable-length
//                          block records (the serial chain of SURVEY §3.2;
//                          reference keeps this serial too,
//                          ImageDecoder.cpp:88-113).
//   * huffman_fsm_decode — whole-stream Huffman bit-walk
//                          (reference Huffman.cpp:355-402).
//   * pack_fields        — MSB-first field packer (reference
//                          BitStream.cpp:61-77), used as the host fast path
//                          when the vectorized numpy packer is not preferred.
//
// Build: g++ -O3 -std=c++17 -fopenmp -shared -fPIC runtime.cpp -o libier_runtime.so
//
// Parallelism mirrors the reference's OpenMP strategy (SURVEY §2 #22):
// data-parallel loops over blocks where record boundaries are precomputed;
// the offset walk and Huffman FSM stay serial (they ARE the wire format's
// dependency chain).

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <functional>
#include <mutex>
#if defined(__SSE2__) || defined(__AVX512F__)
#include <immintrin.h>
#endif
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <malloc.h>
#include <memory>
#include <thread>
#include <type_traits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// gcc's libgomp barriers are invisible to ThreadSanitizer, so data
// legitimately handed across OpenMP regions (per-chunk stats read after
// the implicit barrier, outputs read by the caller) would be reported as
// races.  Under -fsanitize=thread we thread one release sequence through
// a global atomic: workers RELEASE at the end of each iteration/chunk
// body, consumers ACQUIRE before reading.  Races between temporally
// OVERLAPPING iterations — the interleavings the scheduler actually
// produces — remain fully visible; only logically-unordered but
// temporally-separated accesses gain a (correct-in-this-execution) edge.
// Production builds compile these away.
#if defined(__SANITIZE_THREAD__)
std::atomic<uint64_t> g_omp_hb{0};
#define TSAN_HB_RELEASE() g_omp_hb.fetch_add(1, std::memory_order_acq_rel)
#define TSAN_HB_ACQUIRE() ((void)g_omp_hb.load(std::memory_order_acquire))
#else
#define TSAN_HB_RELEASE() ((void)0)
#define TSAN_HB_ACQUIRE() ((void)0)
#endif

// MSB-first bit reader over a byte buffer; reads past the end return 0
// (reference BitStream.cpp:14-28).
struct BitReader {
    const uint8_t* data;
    int64_t nbits;
    int64_t pos;

    inline uint32_t get(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; i++) {
            uint32_t bit = 0;
            if (pos >= 0 && pos < nbits) {  // out-of-range reads return 0
                bit = (data[pos >> 3] >> (7 - (pos & 7))) & 1u;
            }
            v = (v << 1) | bit;
            pos++;
        }
        return v;
    }
};

// MSB-first bit emitter into a shared buffer.  The first flushed byte and
// the partial tail byte may be shared with a neighboring writer (chunk or
// previous stream segment) and are merged with relaxed atomic ORs — those
// merge targets must hold 0 (or the neighbor's bits) beforehand, which
// zero_merge_bytes below guarantees without a full-buffer memset;
// interior bytes are exclusively owned plain stores.  This is the one
// emit discipline every parallel packer in this file uses.
struct BitEmitter {
    uint8_t* out;
    int64_t byte_pos;
    uint64_t acc;
    int na;
    bool first;
    bool excl;

    // `exclusive` = this writer owns every byte it touches (e.g. a
    // chunk-local scratch buffer starting at bit 0): plain stores
    // throughout, no atomic merges, and the destination need not be
    // zero-initialized.
    BitEmitter(uint8_t* o, int64_t bit_pos, bool exclusive = false)
        : out(o), byte_pos(bit_pos >> 3), acc(0), na((int)(bit_pos & 7)),
          first(!exclusive), excl(exclusive) {}

    // Flush whole 32-bit groups (4x fewer iterations than per-byte).
    // Every flushed byte is this writer's exclusive content except
    // possibly the very first, which may share with the previous
    // writer's partial tail and is merged with an atomic OR.
    inline void flush32() {
        while (na >= 32) {
            const uint32_t w32 = (uint32_t)(acc >> (na - 32));
            if (first) {
                __atomic_fetch_or(&out[byte_pos], (uint8_t)(w32 >> 24),
                                  __ATOMIC_RELAXED);
                out[byte_pos + 1] = (uint8_t)(w32 >> 16);
                out[byte_pos + 2] = (uint8_t)(w32 >> 8);
                out[byte_pos + 3] = (uint8_t)w32;
                first = false;
            } else {
                const uint32_t be = __builtin_bswap32(w32);
                std::memcpy(&out[byte_pos], &be, 4);
            }
            byte_pos += 4;
            na -= 32;
        }
    }

    inline void put(int b, uint64_t val) {  // b <= 32
        acc = (acc << b) | (val & ((1ull << b) - 1));
        na += b;
        flush32();
    }

    // Two appends per flush check (b0 + b1 <= 30 keeps the accumulator
    // within 64 bits from any na < 32): halves the while-loop overhead on
    // streams of short fields (Huffman codes average ~6 bits).
    inline void put2(int b0, uint64_t v0, int b1, uint64_t v1) {
        acc = ((acc << b0) | (v0 & ((1ull << b0) - 1)));
        acc = ((acc << b1) | (v1 & ((1ull << b1) - 1)));
        na += b0 + b1;
        flush32();
    }

    inline void flush() {  // partial tail byte is shared with the next writer
        while (na >= 8) {
            const uint8_t by = (uint8_t)(acc >> (na - 8));
            if (first) {
                __atomic_fetch_or(&out[byte_pos], by, __ATOMIC_RELAXED);
                first = false;
            } else {
                out[byte_pos] = by;
            }
            byte_pos++;
            na -= 8;
        }
        if (na > 0) {
            const uint8_t by = (uint8_t)((acc << (8 - na)) & 0xFF);
            if (excl) out[byte_pos] = by;
            else __atomic_fetch_or(&out[byte_pos], by, __ATOMIC_RELAXED);
        }
    }
};

// Copy `nbits` MSB-first bits from src (bit 0 onward; bits past nbits in
// src's last byte are zero) into dst at absolute bit dst_bit.  dst is the
// shared stream: the first and last touched bytes may be shared with
// neighboring writers and are merged with relaxed atomic ORs (targets
// pre-zeroed by zero_merge_bytes); interior bytes are exclusively owned
// plain stores (same ownership rule as BitEmitter).  This is the splice
// step of the single-pass encoder.
static void bit_splice(uint8_t* dst, int64_t dst_bit, const uint8_t* src,
                       int64_t nbits) {
    if (nbits <= 0) return;
    const int s = (int)(dst_bit & 7);
    const int64_t B = dst_bit >> 3;
    const int64_t L = (dst_bit + nbits - 1) >> 3;
    const int64_t nsb = (nbits + 7) / 8;
    const bool tail_shared = ((dst_bit + nbits) & 7) != 0;
    if (B == L) {
        __atomic_fetch_or(&dst[B], (uint8_t)(src[0] >> s), __ATOMIC_RELAXED);
        return;
    }
    if (s == 0) {  // dst starts its own byte: every full byte is exclusive
        const int64_t full = nbits / 8;
        std::memcpy(dst + B, src, (size_t)full);
        if (tail_shared)
            __atomic_fetch_or(&dst[B + full], src[full], __ATOMIC_RELAXED);
        return;
    }
    __atomic_fetch_or(&dst[B], (uint8_t)(src[0] >> s), __ATOMIC_RELAXED);
    // Interior bytes B+1..L-1: out[B+k] = (src[k-1] << (8-s)) | (src[k] >> s)
    const int64_t n_int = L - B - 1;
    int64_t k = 1;
    for (; k + 7 <= n_int && k + 8 <= nsb; k += 8) {  // 8 bytes per step
        uint64_t a, b;
        std::memcpy(&a, src + k - 1, 8);
        std::memcpy(&b, src + k, 8);
        a = __builtin_bswap64(a);
        b = __builtin_bswap64(b);
        const uint64_t o = __builtin_bswap64((a << (8 - s)) | (b >> s));
        std::memcpy(dst + B + k, &o, 8);
    }
    for (; k <= n_int; k++)
        dst[B + k] = (uint8_t)((src[k - 1] << (8 - s))
                               | (k < nsb ? src[k] >> s : 0));
    const int64_t kl = L - B;
    const uint8_t last = (uint8_t)((src[kl - 1] << (8 - s))
                                   | (kl < nsb ? src[kl] >> s : 0));
    if (tail_shared)
        __atomic_fetch_or(&dst[L], last, __ATOMIC_RELAXED);
    else
        dst[L] = last;
}

// The packers above write every byte of their output span exactly once
// with a plain store, EXCEPT segment-boundary bytes (a chunk's first /
// partial-tail byte, BitEmitter's first byte) which are merged with
// relaxed atomic ORs.  Zeroing exactly those merge targets up front lets
// callers pass an UNINITIALIZED stream buffer instead of memset-ing the
// whole worst-case capacity (~8.5 MB per ex4 frame).  `bounds` = every
// segment edge in ascending bit order: bounds[0] is the call's start bit,
// bounds[nb-1] its end bit, the rest the internal chunk boundaries.  The
// byte holding the call's start is left alone when the call starts
// mid-byte (it already holds the caller's earlier stream content, which
// the first writer ORs into); the byte at a byte-aligned end is never
// written by any segment (and may sit past the buffer), so it is skipped.
static void zero_merge_bytes(uint8_t* out, const int64_t* bounds, int nb) {
    if (nb <= 0) return;
    const int64_t start = bounds[0], end = bounds[nb - 1];
    const bool keep_start_byte = (start & 7) != 0;
    int64_t prev = INT64_MIN;
    for (int i = 0; i < nb; i++) {
        const int64_t p = bounds[i];
        const int64_t B = p >> 3;
        if (B == prev) continue;
        prev = B;
        if (keep_start_byte && B == (start >> 3)) continue;
        if (p == end && (end & 7) == 0) continue;
        out[B] = 0;
    }
}

// Per-block RLE stats (Block.cpp:186-232 incl. the trailing-strip quirk and
// the ffs(0)->1 clamp).  Returns the block's record size in bits.
static inline int64_t block_stats_one(const int32_t* c, int k, int use_rle,
                                      uint8_t* db_o, int16_t* cnt_o,
                                      int16_t* npay_o) {
    int last = -1, maxb = 0;
    for (int j = 0; j < k; j++) {
        const int32_t v = c[j];
        if (v != 0) {
            last = j;
            // minimal signed width (utils.hpp:226-243 semantics)
            const uint32_t m = v >= 0 ? (uint32_t)v : ~(uint32_t)v;
            const int w = (m ? 32 - __builtin_clz(m) : 0) + 1;
            if (w > maxb) maxb = w;
        }
    }
    const int length_full = last + 1;
    const int ffs_l = length_full > 0
        ? 32 - __builtin_clz((uint32_t)length_full) : 0;
    int data_bits = maxb > ffs_l ? maxb : ffs_l;
    if (data_bits < 1) data_bits = 1;
    int count, n_payload;
    if (use_rle) {
        if (length_full == k) {
            int last_h = -1;
            for (int j = k - 2; j >= 0; j--)
                if (c[j] != 0) { last_h = j; break; }
            const int length_head = last_h + 1;
            const int gap = (k - 1) - length_head;
            count = gap > 0 ? length_head : k;
        } else {
            count = length_full;
        }
        n_payload = count;
    } else {
        count = length_full;
        n_payload = k;
    }
    *db_o = (uint8_t)data_bits;
    *cnt_o = (int16_t)count;
    *npay_o = (int16_t)n_payload;
    return 4 + (use_rle ? data_bits : 0) + (int64_t)n_payload * data_bits;
}

// Emit the wire records of blocks [lo, hi) starting at bit `start`
// ([4-bit width][width-bit count if rle][payload], Block.cpp:372-413).
static void emit_block_range(const int32_t* coeffs, int64_t lo, int64_t hi,
                             int k, int use_rle, const uint8_t* db,
                             const int16_t* cntv, const int16_t* npay,
                             int64_t start, uint8_t* out) {
    BitEmitter em(out, start);
    for (int64_t nb = lo; nb < hi; nb++) {
        const int32_t* c = coeffs + nb * k;
        const int data_bits = db[(size_t)nb];
        em.put(4, (uint64_t)data_bits);
        if (use_rle) em.put(data_bits, (uint64_t)(int64_t)cntv[(size_t)nb]);
        const int np_ = npay[(size_t)nb];
        for (int j = 0; j < np_; j++)
            em.put(data_bits, (uint64_t)(int64_t)c[j]);
    }
    em.flush();
}

#if defined(__AVX512F__)
// Vector form of block_stats_one for k == 16 (one 512-bit lane-set): the
// nonzero positions come from one test mask, the max signed width from an
// OR-reduction of (v >= 0 ? v : ~v) — the highest set bit of the OR is the
// max over lanes — replacing the 16-iteration branchy scalar loop.
static inline int64_t block_stats_one16(const int32_t* c, int use_rle,
                                        uint8_t* db_o, int16_t* cnt_o,
                                        int16_t* npay_o) {
    const __m512i v = _mm512_loadu_si512((const void*)c);
    const unsigned nz = _mm512_test_epi32_mask(v, v);
    const __m512i m =
        _mm512_xor_si512(v, _mm512_srai_epi32(v, 31));
    const uint32_t mall = (uint32_t)_mm512_reduce_or_epi32(m);
    const int last = nz ? 31 - __builtin_clz(nz) : -1;
    const int maxb = nz ? (mall ? 32 - __builtin_clz(mall) : 0) + 1 : 0;
    const int length_full = last + 1;
    const int ffs_l = length_full > 0
        ? 32 - __builtin_clz((uint32_t)length_full) : 0;
    int data_bits = maxb > ffs_l ? maxb : ffs_l;
    if (data_bits < 1) data_bits = 1;
    int count, n_payload;
    if (use_rle) {
        if (length_full == 16) {
            const unsigned nzh = nz & 0x7FFFu;  // drop the last lane
            const int last_h = nzh ? 31 - __builtin_clz(nzh) : -1;
            const int length_head = last_h + 1;
            const int gap = 15 - length_head;
            count = gap > 0 ? length_head : 16;
        } else {
            count = length_full;
        }
        n_payload = count;
    } else {
        count = length_full;
        n_payload = 16;
    }
    *db_o = (uint8_t)data_bits;
    *cnt_o = (int16_t)count;
    *npay_o = (int16_t)n_payload;
    return 4 + (use_rle ? data_bits : 0) + (int64_t)n_payload * data_bits;
}
#endif

// Dispatch: vector stats for the 4x4 hot shape, scalar otherwise.
static inline int64_t block_stats_any(const int32_t* c, int k, int use_rle,
                                      uint8_t* db_o, int16_t* cnt_o,
                                      int16_t* npay_o) {
#if defined(__AVX512F__)
    if (k == 16) return block_stats_one16(c, use_rle, db_o, cnt_o, npay_o);
#endif
    return block_stats_one(c, k, use_rle, db_o, cnt_o, npay_o);
}

// Stats + record emit for ONE block in a single touch of its (cache-hot)
// coefficients — the per-block body of the single-pass encoder.  Returns
// the record size in bits.
static inline int64_t emit_block_one(const int32_t* c, int k, int use_rle,
                                     BitEmitter& em) {
    uint8_t dbv;
    int16_t cnt1, np1;
    const int64_t bits = block_stats_any(c, k, use_rle, &dbv, &cnt1, &np1);
    em.put(4, (uint64_t)dbv);
    if (use_rle) em.put(dbv, (uint64_t)(int64_t)cnt1);
    // (Paired put2 appends measured NEUTRAL here twice — the record emit
    // is bound by the accumulator dependency chain, not flush checks.)
    for (int j = 0; j < np1; j++)
        em.put(dbv, (uint64_t)(int64_t)c[j]);
    return bits;
}

// Persistent worker pool for the pipelined decoder: spawning std::threads
// per call costs ~0.2 ms and, worse, unpredictable scheduling latency on a
// small VM; parked threads wake in tens of µs.  Lazily created on first
// use, detached at exit (the process is going away anyway).
struct PipelinePool {
    std::mutex mu;
    std::condition_variable cv;
    std::function<void(int)> job;   // called with worker index
    uint64_t epoch = 0;
    std::atomic<int> running{0};
    int n_workers = 0;

    static PipelinePool& instance() {
        // Intentionally leaked: a static instance would run its destructor
        // at exit while detached workers still wait on the cv (hang/UB).
        static PipelinePool* p = new PipelinePool();
        return *p;
    }

    void ensure(int n) {
        if (n_workers >= n) return;
        for (int t = n_workers; t < n; t++) {
            std::thread([this, t]() {
                uint64_t seen = 0;
                for (;;) {
                    std::unique_lock<std::mutex> lk(mu);
                    cv.wait(lk, [&] { return epoch != seen; });
                    seen = epoch;
                    auto j = job;
                    lk.unlock();
                    j(t);
                    running.fetch_sub(1, std::memory_order_release);
                }
            }).detach();
        }
        n_workers = n;
    }

    // Run `fn(tid)` on `n` parked workers; returns immediately.  The
    // caller polls running==0 (interleaving its own work) for completion.
    void launch(int n, std::function<void(int)> fn) {
        ensure(n);
        std::lock_guard<std::mutex> lk(mu);
        job = std::move(fn);
        running.store(n_workers, std::memory_order_relaxed);
        epoch++;
        cv.notify_all();
    }

    bool idle() const {
        return running.load(std::memory_order_acquire) == 0;
    }
};

// ---- Huffman byte-FSM tables (shared by the whole-stream decoder and the
// pipelined image decoder).  States are tree node ids; T[state][byte] packs
// (next_state << 4) | n_emitted, with the <= 8 emitted symbols per entry in
// sym_tab.  Built by nibble composition (~8x cheaper than walking 8 tree
// levels per entry).
// Independent FSM state chains walked interleaved per thread in the
// speculative pass (see huffman_fsm_decode): enough to overlap the
// dependent table-load latency without spilling the chain state.
constexpr int FSM_GROUP = 4;

struct FsmTables {
    std::vector<int32_t> child;    // 2 per node; -1 = absent
    std::vector<int32_t> symbol;   // per node; -1 = internal
    // Uninitialized buffers (not vectors): every entry is written by the
    // composition loop, and zero-filling the ~1.5 MB first cost a
    // measurable slice of the ~0.4 ms table build.
    std::unique_ptr<uint16_t[]> step_tab; // n_nodes * 256, (next_state << 4) | count: state <= 510 fits 9 bits
    std::unique_ptr<uint8_t[]> sym_tab;  // n_nodes * 256 * 8
    int n_nodes = 0;
};

// Code tree (child/symbol arrays) from parsed dict entries — shared by
// the full FSM-table build and the bounded head decoder.
static void build_code_tree(const int32_t* syms, const int32_t* words,
                            const int32_t* lens, int n_entries,
                            FsmTables& ft) {
    ft.child.assign(2, -1);
    ft.symbol.assign(1, -1);
    for (int e = 0; e < n_entries; e++) {
        int32_t node = 0;
        for (int k = lens[e] - 1; k >= 0; k--) {
            const int bit = (words[e] >> k) & 1;
            if (ft.child[node * 2 + bit] < 0) {
                ft.child[node * 2 + bit] = (int32_t)ft.symbol.size();
                ft.child.push_back(-1);
                ft.child.push_back(-1);
                ft.symbol.push_back(-1);
            }
            node = ft.child[node * 2 + bit];
        }
        ft.symbol[node] = syms[e];
    }
}

static void build_fsm_tables(const int32_t* syms, const int32_t* words,
                             const int32_t* lens, int n_entries,
                             FsmTables& ft) {
    build_code_tree(syms, words, lens, n_entries, ft);
    const int n_nodes = (int)ft.symbol.size();
    ft.n_nodes = n_nodes;
    std::vector<int32_t> step4((size_t)n_nodes * 16);
    std::vector<uint8_t> sym4((size_t)n_nodes * 16 * 4);
    // Only INTERNAL nodes (and the root) can ever be a walk state: a step
    // that lands on a leaf emits the symbol and resets to the root before
    // the state is stored (both below and in fsm_walk_to_alignment), so
    // leaf rows — half the table for a full 256-symbol tree — are never
    // read and need not be built.
    const auto is_state = [&](int st) {
        return st == 0 || ft.symbol[st] < 0;
    };
    for (int st = 0; st < n_nodes; st++) {
        if (!is_state(st)) continue;
        for (int nib = 0; nib < 16; nib++) {
            int32_t nd = st;
            int c = 0;
            uint8_t* outs = &sym4[((size_t)st * 16 + nib) * 4];
            for (int k = 3; k >= 0; k--) {
                const int bit = (nib >> k) & 1;
                const int32_t nx = ft.child[nd * 2 + bit];
                if (nx < 0) { nd = 0; continue; }
                nd = nx;
                if (ft.symbol[nd] >= 0) {
                    outs[c++] = (uint8_t)ft.symbol[nd];
                    nd = 0;
                }
            }
            step4[(size_t)st * 16 + nib] = (nd << 4) | c;
        }
    }
    ft.step_tab.reset(new uint16_t[(size_t)n_nodes * 256]);
    ft.sym_tab.reset(new uint8_t[(size_t)n_nodes * 256 * 8]);
    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int st = 0; st < n_nodes; st++) {
        TSAN_HB_ACQUIRE();
        if (!is_state(st)) { TSAN_HB_RELEASE(); continue; }
        for (int by = 0; by < 256; by++) {
            const int32_t e1 = step4[(size_t)st * 16 + (by >> 4)];
            const int c1 = e1 & 15;
            const int32_t s1 = e1 >> 4;
            const int32_t e2 = step4[(size_t)s1 * 16 + (by & 15)];
            const int c2 = e2 & 15;
            uint8_t* outs = &ft.sym_tab[((size_t)st * 256 + by) * 8];
            std::memcpy(outs, &sym4[((size_t)st * 16 + (by >> 4)) * 4], 4);
            std::memcpy(outs + c1, &sym4[((size_t)s1 * 16 + (by & 15)) * 4],
                        4);  // may scribble past c1+c2 within the 8B entry
            ft.step_tab[(size_t)st * 256 + by] = (uint16_t)(((e2 >> 4) << 4) | (c1 + c2));
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
}

// Bit-by-bit tree walk until byte alignment (reference Huffman.cpp:376-383:
// an invalid path resets to the root).  Emits into `out`, returns the bit
// position reached; *state_io carries the walk state.
static int64_t fsm_walk_to_alignment(const uint8_t* data, int64_t nbits,
                                     int64_t pos, const FsmTables& ft,
                                     int32_t* state_io, uint8_t* out,
                                     int64_t out_cap, int64_t* n_out_io) {
    int32_t node = *state_io;
    int64_t n_out = *n_out_io;
    while ((pos & 7) != 0 && pos < nbits) {
        const int bit = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
        pos++;
        const int32_t nxt = ft.child[node * 2 + bit];
        if (nxt < 0) { node = 0; continue; }
        node = nxt;
        if (ft.symbol[node] >= 0) {
            if (n_out < out_cap) out[n_out] = (uint8_t)ft.symbol[node];
            n_out++;
            node = 0;
        }
    }
    *state_io = node;
    *n_out_io = n_out;
    return pos;
}

// ---- fused per-block decode bodies (shared by the batch entry points and
// the pipelined decoder).  Bit-identical to the loop bodies they were
// factored out of: decode_to_image_exact (f64, reference accumulation
// order) and decode_to_image_impl (f32 sparse accumulation). ----

static inline uint32_t read_field(const uint8_t* data, int64_t nbytes,
                                  int64_t nbits_total, int64_t pos, int b,
                                  bool fast) {
    if (fast) {
        // One unaligned big-endian 64-bit load per field (b <= 15 always
        // fits), no per-field bounds branches.
        uint64_t wd;
        std::memcpy(&wd, data + (pos >> 3), 8);
        wd = __builtin_bswap64(wd) << (pos & 7);
        return (uint32_t)(wd >> (64 - b));
    }
    if (pos + b <= nbits_total) {
        // 3-byte window covers any field of <= 17 bits.
        const int64_t byte0 = pos >> 3;
        uint32_t wnd = (uint32_t)data[byte0] << 16;
        if (byte0 + 1 < nbytes) wnd |= (uint32_t)data[byte0 + 1] << 8;
        if (byte0 + 2 < nbytes) wnd |= (uint32_t)data[byte0 + 2];
        return (wnd >> (24 - (int)(pos & 7) - b)) & ((1u << b) - 1u);
    }
    BitReader r{data, nbits_total, pos};
    return r.get(b);
}

#if defined(__AVX512F__)
// AVX-512 exact inverse (K = 16 for 4x4 blocks, 64 for 8x8): independent
// field reads (fields sit at off + j*b, so the per-field position chain
// is broken for ILP), the K f64 accumulators live in K/8 zmm registers,
// and each coefficient is one broadcast + mul + add pair per register —
// separate vmulpd/vaddpd, NOT vfmadd, preserving the -ffp-contract=off
// per-product rounding.  The c-ascending accumulation order and per-lane
// independent sums make the result BIT-IDENTICAL to the scalar loop
// (verified: tests pin this path against the numpy chain).
template <int K>
static inline void idctk_accum_avx512(const int32_t* cf,
                                      const double* quant,
                                      const double* wi, __m512d* a) {
    constexpr int NV = K / 8;
    for (int v = 0; v < NV; v++) a[v] = _mm512_setzero_pd();
    // The per-coefficient skip branch predicts well: cf is in row-major
    // order, and which frequencies are nonzero is stable across blocks
    // (low frequencies live, high dead).  A tzcnt-over-nonzero-mask
    // variant was A/B'd ~4% SLOWER (min 3.61 -> 3.76 ms on ex4) — the
    // branches were never the cost.
    for (int c = 0; c < K; c++) {
        if (cf[c] == 0) continue;
        const double y = (double)cf[c] * quant[c];
        const __m512d yv = _mm512_set1_pd(y);
        const double* wr = wi + (size_t)c * K;
        for (int v = 0; v < NV; v++)
            a[v] = _mm512_add_pd(
                a[v], _mm512_mul_pd(yv, _mm512_loadu_pd(wr + 8 * v)));
    }
}

static inline void extract16_fields(const uint8_t* data, int64_t off, int b,
                                    int cnt, const int32_t* zz,
                                    int32_t* cf) {
    const uint32_t sign_bit = 1u << (b - 1);
    const uint32_t ext = ~0u << b;
    for (int j = 0; j < cnt; j++) {
        const int64_t pos = off + (int64_t)j * b;
        uint64_t wd;
        std::memcpy(&wd, data + (pos >> 3), 8);
        wd = __builtin_bswap64(wd) << (pos & 7);
        uint32_t v = (uint32_t)(wd >> (64 - b));
        if (v & sign_bit) v |= ext;
        cf[zz[j]] = (int32_t)v;
    }
}

// AVX-512 exact forward transform + quantize + zig-zag (K = 16 for 4x4
// blocks, 64 for 8x8), NB blocks interleaved: the accumulate loop is
// bound by the f64 add LATENCY of K/8 dependent chains per block (the
// c-ascending order with separate vmulpd/vaddpd — no FMA — is
// parity-mandated, algo.cpp:309-331), so running NB independent blocks'
// chains side by side — sharing each weight-row load — hides it.  Every
// per-element operation and its order match the scalar loop, so the
// coefficients are BIT-IDENTICAL for any NB (tests pin both paths); the
// single-block entry point below is the NB=1 instantiation.
template <int K, int NB>
static inline void dctk_quant_avx512_nb(const double* x /* [NB][K] */,
                                        const double* wf,
                                        const double* scale,
                                        const double* quant,
                                        const int32_t* zz,
                                        int32_t* rows /* [NB][K] */) {
    constexpr int NV = K / 8;
    __m512d a[NB][NV];
    for (int b = 0; b < NB; b++)
        for (int v = 0; v < NV; v++) a[b][v] = _mm512_setzero_pd();
    for (int c = 0; c < K; c++) {
        const double* wr = wf + (size_t)c * K;
        __m512d wv[NV];
        for (int v = 0; v < NV; v++) wv[v] = _mm512_loadu_pd(wr + 8 * v);
        for (int b = 0; b < NB; b++) {
            const __m512d xv = _mm512_set1_pd(x[(size_t)b * K + c]);
            for (int v = 0; v < NV; v++)
                a[b][v] = _mm512_add_pd(a[b][v],
                                        _mm512_mul_pd(xv, wv[v]));
        }
    }
    const __m512d half = _mm512_set1_pd(0.5);
    const __m512d nhalf = _mm512_set1_pd(-0.5);
    const __m512d zero = _mm512_setzero_pd();
    const __m512d one = _mm512_set1_pd(1.0);
    const __m512d mone = _mm512_set1_pd(-1.0);
    const __m512d sgn = _mm512_set1_pd(-0.0);
    const __m512d guard = _mm512_set1_pd(0.5 - 0x1p-40);
    alignas(32) int32_t rm[K];
    for (int b = 0; b < NB; b++) {
        for (int v = 0; v < NV; v++) {
            const __m512d y =
                _mm512_mul_pd(a[b][v], _mm512_loadu_pd(scale + 8 * v));
            const __mmask8 nzm = _mm512_cmp_pd_mask(
                _mm512_andnot_pd(sgn, y),
                _mm512_mul_pd(guard, _mm512_loadu_pd(quant + 8 * v)),
                _CMP_GE_OQ);
            if (!nzm) {
                _mm256_store_si256((__m256i*)(rm + 8 * v),
                                   _mm256_setzero_si256());
                continue;
            }
            const __m512d z =
                _mm512_div_pd(y, _mm512_loadu_pd(quant + 8 * v));
            const __m512d t = _mm512_roundscale_pd(
                z, _MM_FROUND_TO_ZERO | _MM_FROUND_NO_EXC);
            const __m512d d = _mm512_sub_pd(z, t);
            const __mmask8 hm = _mm512_cmp_pd_mask(d, half, _CMP_GE_OQ)
                                | _mm512_cmp_pd_mask(d, nhalf, _CMP_LE_OQ);
            const __m512d inc = _mm512_mask_blend_pd(
                _mm512_cmp_pd_mask(z, zero, _CMP_GE_OQ), mone, one);
            const __m512d r = _mm512_add_pd(
                t, _mm512_mask_blend_pd(hm, zero, inc));
            _mm256_store_si256((__m256i*)(rm + 8 * v),
                               _mm512_cvttpd_epi32(r));
        }
        int32_t* row = rows + (size_t)b * K;
        for (int j = 0; j < K; j++) row[j] = rm[zz[j]];
    }
}

template <int K>
static inline void dctk_quant_avx512(const double* x, const double* wf,
                                     const double* scale,
                                     const double* quant,
                                     const int32_t* zz, int32_t* row) {
    dctk_quant_avx512_nb<K, 1>(x, wf, scale, quant, zz, row);
}

template <int BS>
static inline void storek_px(__m512d* a, const uint8_t* pred_base,
                             int64_t w, uint8_t* base) {
    constexpr int K = BS * BS;
    constexpr int NV = K / 8;
    const __m512d lo = _mm512_setzero_pd();
    const __m512d hi = _mm512_set1_pd(255.0);
    const __m512d c128 = _mm512_set1_pd(128.0);
    alignas(64) double pr[K];
    if (pred_base) {
        // P-frame recon: clamp(pred + (IDCT + 128)) in f64, matching the
        // scalar order (acc + 128.0, then + pred, then clamp).
        for (int r = 0; r < BS; r++)
            for (int c = 0; c < BS; c++)
                pr[r * BS + c] = (double)pred_base[(int64_t)r * w + c];
    }
    alignas(32) int32_t px[K];
    for (int v = 0; v < NV; v++) {
        __m512d acc = _mm512_add_pd(a[v], c128);
        if (pred_base)
            acc = _mm512_add_pd(acc, _mm512_load_pd(pr + 8 * v));
        acc = _mm512_min_pd(_mm512_max_pd(acc, lo), hi);
        _mm256_store_si256((__m256i*)(px + 8 * v),
                           _mm512_cvttpd_epi32(acc));
    }
    uint8_t tmp[K];
    for (int t = 0; t < K; t++) tmp[t] = (uint8_t)px[t];
    for (int r = 0; r < BS; r++)
        std::memcpy(base + (int64_t)r * w, tmp + r * BS, BS);
}

// One fused extract + exact-IDCT + (pred add +) clamp + store block, for
// the two supported block sizes.
template <int BS>
static inline void decode_block_avx512(const uint8_t* data, int64_t off,
                                       int b, int cnt, const int32_t* zz,
                                       const double* quant,
                                       const double* wi, int64_t w,
                                       const uint8_t* pred_base,
                                       uint8_t* base) {
    constexpr int K = BS * BS;
    int32_t cf[K] = {0};
    if (b > 0) extract16_fields(data, off, b, cnt, zz, cf);
    __m512d a[K / 8];
    idctk_accum_avx512<K>(cf, quant, wi, a);
    storek_px<BS>(a, pred_base, w, base);
}
#endif  // __AVX512F__

static inline void decode_block_exact_one(
        const uint8_t* data, int64_t nbytes, int64_t off, int b, int cnt_in,
        const int32_t* zz, int block_size, int k, const double* quant,
        const double* wi, int64_t wb, int64_t w, int64_t n,
        const uint8_t* pred, uint8_t* out) {
    const int cnt = cnt_in < k ? cnt_in : k;
    const bool fast =
        b > 0 && ((off + (int64_t)b * cnt) >> 3) + 9 <= nbytes;
    const int64_t px0 = (n / wb) * (int64_t)block_size * w
                        + (n % wb) * block_size;
#if defined(__AVX512F__)
    if (fast || b == 0) {
        const uint8_t* pb = pred ? pred + px0 : nullptr;
        if (k == 16) {
            decode_block_avx512<4>(data, off, b, cnt, zz, quant, wi, w,
                                   pb, out + px0);
            return;
        }
        if (k == 64) {
            decode_block_avx512<8>(data, off, b, cnt, zz, quant, wi, w,
                                   pb, out + px0);
            return;
        }
    }
#endif
    int32_t cf[256];
    for (int t = 0; t < k; t++) cf[t] = 0;
    if (b > 0) {
        const uint32_t sign_bit = 1u << (b - 1);
        const uint32_t ext = ~0u << b;
        int64_t pos = off;
        for (int j = 0; j < cnt; j++) {
            uint32_t v = read_field(data, nbytes, nbytes * 8, pos, b, fast);
            pos += b;
            if (v & sign_bit) v |= ext;
            cf[zz[j]] = (int32_t)v;
        }
    }
    double acc[256];
    for (int t = 0; t < k; t++) acc[t] = 0.0;
    for (int c = 0; c < k; c++) {
        if (cf[c] == 0) continue;
        const double y = (double)cf[c] * quant[c];
        const double* wr = wi + (size_t)c * k;
        for (int t = 0; t < k; t++) {
            const double p = y * wr[t];
            acc[t] += p;
        }
    }
    uint8_t* base = out + px0;
    const uint8_t* pbase = pred ? pred + px0 : nullptr;
    for (int r = 0; r < block_size; r++) {
        uint8_t* orow = base + (int64_t)r * w;
        const uint8_t* prow = pbase ? pbase + (int64_t)r * w : nullptr;
        const double* yr = acc + r * block_size;
        for (int c2 = 0; c2 < block_size; c2++) {
            // P-frame recon: clamp(pred + (IDCT + 128)) in exact f64
            // order (Frame.cpp:107-117 / Block.cpp:111-119).
            const double e = yr[c2] + 128.0;
            double pv = prow ? (double)prow[c2] + e : e;
            pv = pv < 0.0 ? 0.0 : (pv > 255.0 ? 255.0 : pv);
            orow[c2] = (uint8_t)pv;  // trunc == floor for pv >= 0
        }
    }
}

static inline void decode_block_f32_one(
        const uint8_t* data, int64_t nbytes, int64_t off, int b, int cnt_in,
        const int32_t* zz, int block_size, int k, const float* quant,
        const float* wi, int64_t wb, int64_t w, int64_t n,
        const uint8_t* pred, uint8_t* out) {
    float y[256];
    for (int t = 0; t < k; t++) y[t] = 128.0f;
    const int cnt = cnt_in < k ? cnt_in : k;
    if (b > 0) {
        const uint32_t sign_bit = 1u << (b - 1);
        const uint32_t ext = ~0u << b;
        int64_t pos = off;
        const bool fast = ((pos + (int64_t)b * cnt) >> 3) + 9 <= nbytes;
        for (int j = 0; j < cnt; j++) {
            uint32_t v = read_field(data, nbytes, nbytes * 8, pos, b, fast);
            pos += b;
            if (v & sign_bit) v |= ext;
            const int32_t sv = (int32_t)v;
            if (sv != 0) {
                const int rm = zz[j];
                const float f = (float)sv * quant[rm];
                const float* wr = wi + (size_t)rm * k;
                for (int t = 0; t < k; t++) y[t] += f * wr[t];
            }
        }
    }
    const int64_t px0 = (n / wb) * (int64_t)block_size * w
                        + (n % wb) * block_size;
    uint8_t* base = out + px0;
    const uint8_t* pbase = pred ? pred + px0 : nullptr;
    for (int r = 0; r < block_size; r++) {
        uint8_t* orow = base + (int64_t)r * w;
        const uint8_t* prow = pbase ? pbase + (int64_t)r * w : nullptr;
        const float* yr = y + r * block_size;
        for (int c = 0; c < block_size; c++) {
            // P-frame recon: clamp(pred + (IDCT + 128)) — the residual
            // carries the same -128 bias as pixels (Block.cpp:139-153,
            // Frame.cpp:107-117).
            float pv = prow ? (float)prow[c] + yr[c] : yr[c];
            pv = pv < 0.0f ? 0.0f : (pv > 255.0f ? 255.0f : pv);
            orow[c] = (uint8_t)pv;  // trunc == floor for pv >= 0
        }
    }
}

}  // namespace

extern "C" {

// Keep large allocations on the heap for reuse.  glibc's default
// M_MMAP_THRESHOLD sends numpy's tens-of-MB per-frame temporaries through
// mmap/munmap on every allocation; the resulting page-fault churn measured
// ~3x on the host video encode (3.9 s -> 1.1 s for 12 frames of 720p).
// Raising the trim threshold too keeps freed heap blocks available.
// Trade-off: process RSS holds the high-water mark of temporaries.
int64_t tune_host_allocator() {
    mallopt(M_MMAP_THRESHOLD, 256 << 20);
    mallopt(M_TRIM_THRESHOLD, 256 << 20);
    return 0;
}

namespace {

// One record step of the decode offset walk, shared by the serial walk
// and the speculative chunk walkers so their parses are identical by
// construction.  Fast path: one unaligned big-endian 64-bit load covers
// the 4-bit width and the <=15-bit count (<= 19 bits even at a 7-bit
// phase); bails to the safe bit reader when a load could overrun the
// buffer (reads past the end must return 0 bits, BitStream.cpp:14-28).
// Returns the position after the record's payload.
static inline int64_t walk_step(const uint8_t* data, int64_t nbytes,
                                int64_t pos, int use_rle, int64_t k,
                                int32_t* b_o, int32_t* cnt_o,
                                int64_t* off_o) {
    uint32_t b;
    int64_t count;
    if (pos >= 0 && (pos >> 3) + 9 <= nbytes) {
        uint64_t w;
        std::memcpy(&w, data + (pos >> 3), 8);
        w = __builtin_bswap64(w) << (pos & 7);
        b = (uint32_t)(w >> 60);
        if (use_rle) {
            count = b ? (int64_t)((w << 4) >> (64 - b)) : 0;
            pos += 4 + b;
        } else {
            count = k;
            pos += 4;
        }
    } else {
        BitReader r{data, nbytes * 8, pos};
        b = r.get(4);
        count = use_rle ? (int64_t)r.get((int)b) : k;
        pos = r.pos;
    }
    *b_o = (int32_t)b;
    *cnt_o = (int32_t)count;
    *off_o = pos;
    return pos + (int64_t)b * count;
}

struct WalkRec {  // speculative chunk walker storage (8 B/record)
    uint32_t rel_off;  // payload offset relative to the chunk's start bit
    uint16_t b;
    uint16_t cnt;
};

}  // namespace

// Returns the bit position after the last block, or -1 on error.
//
// The walk is the decode side's one true serial dependency chain (block
// N's start depends on every previous record's width/count,
// ImageDecoder.cpp:88-113).  Like the Huffman byte-FSM above, it is
// parallelized SPECULATIVELY: the record parse is a pure function of the
// bit position, so a chunk walker that starts at the chunk boundary (in
// general mid-record, i.e. wrong) becomes exactly right from the first
// position that coincides with a true record start.  The serial stitch
// steps true records from the chunk's real entry position until one
// matches a walker-visited start (usually within a few records —
// a wrong step lands at an ~uniform bit phase, and record starts are
// dense), then adopts the walker's stored records wholesale; a chunk
// that never syncs (or overflows its record budget on adversarial
// input) is simply walked serially.  Bit-exact by construction.
int64_t walk_offsets(const uint8_t* data, int64_t nbytes, int64_t start_bit,
                     int64_t n_blocks, int use_rle, int block_size,
                     int64_t* out_offsets, int32_t* out_bits,
                     int32_t* out_counts) {
    const int64_t k = (int64_t)block_size * block_size;
    const int64_t nbits = nbytes * 8;

#ifdef _OPENMP
    const int n_threads = omp_get_max_threads();
    if (n_blocks >= 32768 && n_threads > 1 && start_bit >= 0
        && nbits > start_bit && nbits - start_bit < ((int64_t)1 << 31)) {
        // (span bound keeps the chunk-relative offsets in 32 bits)
        constexpr int WG = 4;  // interleaved walkers per thread (the
                               // per-record dependent-load chain is ~13
                               // cycles; independent chains hide it)
        const int n_chunks = WG * n_threads;
        const int64_t span = nbits - start_bit;
        const int64_t per = (span + n_chunks - 1) / n_chunks;
        // Record budget per chunk: generous for real streams (whose
        // records average tens of bits), tiny vs worst case (4-bit
        // records) — an overflowing walker just marks its chunk unsynced.
        const int64_t cap = 2 * (n_blocks / n_chunks) + 8192;
        const int64_t max_steps = cap + (cap >> 1);  // parse-work bound
        constexpr int CS_CAP = 256;  // chain segments per chunk
        // Uninitialized on purpose: only the n_rec[ci] prefix of each
        // chunk's slice is ever read.
        std::unique_ptr<WalkRec[]> recs(
            new WalkRec[(size_t)n_chunks * cap]);
        // Chain segments: a walker's stored records form contiguous parse
        // chains; a chain ends at an implausible parse (count > k — true
        // records have count <= block elements) or at the chunk boundary.
        // Only whole-chain suffixes are adoptable: records within a chain
        // provably continue each other, across a break they do not.
        std::vector<int32_t> ch_first((size_t)n_chunks * CS_CAP);
        std::vector<int32_t> ch_n((size_t)n_chunks * CS_CAP);
        std::vector<int64_t> ch_end((size_t)n_chunks * CS_CAP);
        std::vector<int32_t> cs_n(n_chunks);
        std::vector<int64_t> n_rec(n_chunks);
        const auto lo_of = [&](int ci) { return start_bit + (int64_t)ci * per; };
        const auto hi_of = [&](int ci) {
            const int64_t hi = lo_of(ci) + per;
            return hi < nbits ? hi : nbits;
        };

        const bool dbg = getenv("IER_WALK_STATS") != nullptr;
        const double t0 = dbg ? omp_get_wtime() : 0.0;
        TSAN_HB_RELEASE();
        #pragma omp parallel for schedule(static)
        for (int g = 0; g < n_threads; g++) {
            TSAN_HB_ACQUIRE();
            // WG chunks walked in lockstep so the dependent-load chains
            // overlap.  A parse with count > k is provably garbage (the
            // walker is mid-record): restart one bit later instead of
            // following a bogus up-to-500kbit payload jump out of the
            // chunk (the failure mode that de-synced 10/16 chunks in the
            // first version of this walker).
            int64_t pos[WG], nr[WG], hi[WG], lo[WG], steps[WG];
            int32_t chain_first[WG], csn[WG];
            WalkRec* st[WG];
            bool live_any = true;
            for (int j = 0; j < WG; j++) {
                const int ci = g * WG + j;
                lo[j] = lo_of(ci);
                pos[j] = lo[j];
                hi[j] = hi_of(ci);
                nr[j] = 0;
                steps[j] = 0;
                chain_first[j] = -1;
                csn[j] = 0;
                st[j] = recs.get() + (size_t)ci * cap;
            }
            const auto close_chain = [&](int j, int64_t end_bit) {
                if (chain_first[j] < 0) return;
                const int ci = g * WG + j;
                const size_t s = (size_t)ci * CS_CAP + csn[j];
                ch_first[s] = chain_first[j];
                ch_n[s] = (int32_t)(nr[j] - chain_first[j]);
                ch_end[s] = end_bit;
                csn[j]++;
                chain_first[j] = -1;
            };
            while (live_any) {
                live_any = false;
                for (int j = 0; j < WG; j++) {
                    if (pos[j] >= hi[j] || nr[j] >= cap
                        || steps[j] >= max_steps || csn[j] >= CS_CAP)
                        continue;
                    live_any = true;
                    steps[j]++;
                    int32_t b, cnt;
                    int64_t off;
                    const int64_t nxt = walk_step(data, nbytes, pos[j],
                                                  use_rle, k, &b, &cnt, &off);
                    if (use_rle && cnt > k) {  // provably mid-record
                        close_chain(j, pos[j]);
                        pos[j] += 1;
                        continue;
                    }
                    if (chain_first[j] < 0) chain_first[j] = (int32_t)nr[j];
                    WalkRec& rc = st[j][nr[j]++];
                    rc.rel_off = (uint32_t)(off - lo[j]);
                    rc.b = (uint16_t)b;
                    rc.cnt = (uint16_t)cnt;
                    pos[j] = nxt;
                }
            }
            for (int j = 0; j < WG; j++) {
                close_chain(j, pos[j]);
                n_rec[g * WG + j] = nr[j];
                cs_n[g * WG + j] = csn[j];
            }
            TSAN_HB_RELEASE();
        }
        TSAN_HB_ACQUIRE();

        const double t1 = dbg ? omp_get_wtime() : 0.0;

        // Serial stitch: step true records from each chunk's real entry
        // until a walker-visited start matches, then adopt the rest of
        // that record's CHAIN (the suffix of one parse chain provably
        // continues the true walk; across a restart break it does not —
        // the stitch resumes serially at the chain's end, which on a
        // well-formed stream only ever happens at the chunk boundary).
        // sync_at[ci] = walker record index adopted from; base[ci] = its
        // global record index.
        std::vector<int64_t> sync_at(n_chunks, -1), base(n_chunks, 0),
            take(n_chunks, 0);
        int64_t pos = start_bit, i = 0;
        for (int ci = 0; ci < n_chunks && i < n_blocks; ci++) {
            const int64_t lo = lo_of(ci), hi = hi_of(ci);
            // Step true records, scanning the walker's increasing starts
            // with a moving pointer.  A stored record's start is its
            // payload offset minus its header width.
            int64_t j = 0;
            while (pos < hi && i < n_blocks) {
                const int64_t rel = pos - lo;
                while (j < n_rec[ci]) {
                    const WalkRec& rc = recs[(size_t)ci * cap + j];
                    const int64_t s = (int64_t)rc.rel_off - 4
                                      - (use_rle ? rc.b : 0);
                    if (s >= rel) break;
                    j++;
                }
                if (j < n_rec[ci]) {
                    const WalkRec& rc = recs[(size_t)ci * cap + j];
                    const int64_t s = (int64_t)rc.rel_off - 4
                                      - (use_rle ? rc.b : 0);
                    if (s == rel) { sync_at[ci] = j; break; }
                }
                int32_t b, cnt;
                int64_t off;
                pos = walk_step(data, nbytes, pos, use_rle, k, &b, &cnt,
                                &off);
                out_offsets[i] = off;
                out_bits[i] = b;
                out_counts[i] = cnt;
                i++;
            }
            if (sync_at[ci] < 0) continue;
            // Locate the chain holding the synced record (few segments)
            // and adopt its suffix.
            const int32_t* cf = ch_first.data() + (size_t)ci * CS_CAP;
            const int32_t* cn2 = ch_n.data() + (size_t)ci * CS_CAP;
            int cs = 0;
            while (cs < cs_n[ci] && sync_at[ci] >= cf[cs] + cn2[cs]) cs++;
            if (cs >= cs_n[ci]) {  // defensive: every stored record has a
                sync_at[ci] = -1;  // chain; never expected
                continue;
            }
            const int64_t chain_end_rec = cf[cs] + cn2[cs];
            base[ci] = i;
            const int64_t avail = chain_end_rec - sync_at[ci];
            const int64_t want = n_blocks - i;
            take[ci] = avail < want ? avail : want;
            i += take[ci];
            if (take[ci] == avail) {
                pos = ch_end[(size_t)ci * CS_CAP + cs];
            } else {  // clipped at n_blocks: end after the last taken
                const WalkRec& rc =
                    recs[(size_t)ci * cap + sync_at[ci] + take[ci] - 1];
                pos = lo + (int64_t)rc.rel_off
                      + (int64_t)rc.b * (int64_t)rc.cnt;
            }
        }
        // Anything left (stream shorter than n_blocks records, or every
        // tail chunk unsynced): plain serial walk — reads past the end
        // return 0 bits, exactly like the reference.
        for (; i < n_blocks; i++) {
            pos = walk_step(data, nbytes, pos, use_rle, k, &out_bits[i],
                            &out_counts[i], &out_offsets[i]);
        }
        const int64_t end = pos;
        const double t2 = dbg ? omp_get_wtime() : 0.0;

        // Placement: copy each chunk's adopted tail into the output
        // arrays (parallel; indices disjoint by construction).
        TSAN_HB_RELEASE();
        #pragma omp parallel for schedule(static)
        for (int ci = 0; ci < n_chunks; ci++) {
            TSAN_HB_ACQUIRE();
            if (take[ci] <= 0) { TSAN_HB_RELEASE(); continue; }
            const int64_t lo = lo_of(ci);
            const WalkRec* src = recs.get() + (size_t)ci * cap + sync_at[ci];
            for (int64_t t = 0; t < take[ci]; t++) {
                out_offsets[base[ci] + t] = lo + (int64_t)src[t].rel_off;
                out_bits[base[ci] + t] = src[t].b;
                out_counts[base[ci] + t] = src[t].cnt;
            }
            TSAN_HB_RELEASE();
        }
        TSAN_HB_ACQUIRE();
        if (dbg) {
            int64_t serial_recs = 0;
            for (int ci = 0; ci < n_chunks; ci++) serial_recs += take[ci];
            fprintf(stderr,
                    "[walk] pass1 %.3f ms  stitch %.3f ms  place %.3f ms  "
                    "adopted %lld/%lld\n",
                    (t1 - t0) * 1e3, (t2 - t1) * 1e3,
                    (omp_get_wtime() - t2) * 1e3,
                    (long long)serial_recs, (long long)n_blocks);
            for (int ci = 0; ci < n_chunks; ci++)
                fprintf(stderr, "  chunk %d: n_rec %lld sync_at %lld take %lld\n",
                        ci, (long long)n_rec[ci], (long long)sync_at[ci],
                        (long long)take[ci]);
        }
        return end;
    }
#endif

    int64_t pos = start_bit;
    for (int64_t i = 0; i < n_blocks; i++) {
        pos = walk_step(data, nbytes, pos, use_rle, k, &out_bits[i],
                        &out_counts[i], &out_offsets[i]);
    }
    return pos;
}

// Strict Huffman dict validation (ops/huffman.py::validate_dict_entries
// semantics — that Python loop cost ~0.2 ms per decode).  Returns 0 for a
// valid prefix dict; -1 zero-length code; -2 duplicate code, a code that
// extends another, or a code that prefixes another.
int64_t validate_huffman_dict(const int32_t* words, const int32_t* lens,
                              int n_entries) {
    std::vector<int32_t> child(2, -1);
    std::vector<uint8_t> leaf(1, 0);
    for (int e = 0; e < n_entries; e++) {
        const int ln = lens[e];
        if (ln < 1) return -1;
        int32_t node = 0;
        for (int k = ln - 1; k >= 0; k--) {
            if (leaf[(size_t)node]) return -2;  // extends another code
            const int bit = (words[e] >> k) & 1;
            if (child[(size_t)node * 2 + bit] < 0) {
                child[(size_t)node * 2 + bit] = (int32_t)leaf.size();
                child.push_back(-1);
                child.push_back(-1);
                leaf.push_back(0);
            }
            node = child[(size_t)node * 2 + bit];
        }
        if (leaf[(size_t)node] || child[(size_t)node * 2] >= 0
            || child[(size_t)node * 2 + 1] >= 0)
            return -2;  // duplicate, or prefixes an existing code
        leaf[(size_t)node] = 1;
    }
    return 0;
}

// Decodes all bits from start_bit to the end of the buffer through the code
// tree defined by (syms, words, lens). Returns the number of output bytes,
// or -1 if out_cap would be exceeded.
int64_t huffman_fsm_decode(const uint8_t* data, int64_t nbytes,
                           int64_t start_bit, const int32_t* syms,
                           const int32_t* words, const int32_t* lens,
                           int n_entries, uint8_t* out, int64_t out_cap) {
    // Byte-level FSM: T[state][byte] -> (next state, emitted symbols).
    // States are tree node ids (<= 511 for a 256-symbol alphabet), so the
    // table is a few MB and L2-resident.  Next state and symbol count are
    // packed into ONE entry ((nd << 4) | cnt, cnt <= 8) so the state walk
    // is a single dependent load per byte (see FsmTables).
    FsmTables ft;
    build_fsm_tables(syms, words, lens, n_entries, ft);
    const uint16_t* step_tab = ft.step_tab.get();
    const uint8_t* sym_tab = ft.sym_tab.get();

    const int64_t nbits = nbytes * 8;
    int64_t n_out = 0;
    int32_t node = 0;
    // Bit-by-bit until byte alignment (matches the reference's walk,
    // Huffman.cpp:376-383: invalid path resets to root).
    int64_t pos = fsm_walk_to_alignment(data, nbits, start_bit, ft, &node,
                                        out, out_cap, &n_out);
    if (n_out > out_cap) return -1;

    // Two-pass parallel decode over whole bytes.  Pass 1 finds every
    // chunk's entry state and output offset — the wire format's one true
    // dependency chain.  Rather than walking it serially, each chunk runs
    // the FSM SPECULATIVELY from the root in parallel, EMITTING symbols
    // into a per-chunk scratch buffer as it goes and recording its exit
    // state/count plus the first SYNC_K (state, count) trajectory entries;
    // Huffman byte-FSMs self-synchronize within a few bytes, so the serial
    // stitch only walks each chunk's sync prefix (falling back to a full
    // walk for the rare chunk that never syncs).  Pass 2 then re-walks
    // only each chunk's pre-sync bytes and memcpys the (exact from the
    // sync point on) speculative output into place — the payload is
    // walked ONCE, not twice.
    const int64_t first_byte = pos >> 3;
    const int64_t n_in = nbytes - first_byte;
    int n_threads = 1;
    #ifdef _OPENMP
    n_threads = omp_get_max_threads();
    #endif
    // FSM_GROUP chunks per thread, walked INTERLEAVED in pass 1:
    // independent state chains hide the table walk's dependent-load
    // latency (the per-byte work is two loads off the same data-dependent
    // index; interleaving gives the OoO core FSM_GROUP overlapping misses
    // instead of one serial chain — 2-way measured ~1.7x over serial,
    // 4-way ~1.2x more on ex4's 1.8 MB payload).
    int n_chunks = FSM_GROUP * n_threads;
    if (n_in < (int64_t)1 << 16) n_chunks = 1;
    const int64_t per = (n_in + n_chunks - 1) / n_chunks;
    const auto chunk_lo = [&](int ci) { return first_byte + (int64_t)ci * per; };
    const auto chunk_hi = [&](int ci) {
        const int64_t hi = chunk_lo(ci) + per;
        return hi < nbytes ? hi : nbytes;
    };

    constexpr int SYNC_K = 96;
    std::vector<int32_t> spec_state(n_chunks), spec_traj((size_t)n_chunks * SYNC_K);
    std::vector<int64_t> spec_count(n_chunks);
    std::vector<int64_t> spec_pref((size_t)n_chunks * SYNC_K);
    // Per-chunk speculative output: worst case 8 symbols/byte, plus 8
    // bytes of per-chunk slack (the emit below blind-writes 8 bytes per
    // step and must not touch the next chunk's region).  Uninitialized on
    // purpose — only the emitted prefix is ever read.
    std::unique_ptr<uint8_t[]> spec_out(
        new uint8_t[(size_t)n_in * 8 + (size_t)n_chunks * 8]);
    const auto spec_buf = [&](int ci) {
        return spec_out.get() + (chunk_lo(ci) - first_byte) * 8
               + (size_t)ci * 8;
    };
    const int n_groups = (n_chunks + FSM_GROUP - 1) / FSM_GROUP;
    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int gi = 0; gi < n_groups; gi++) {
        TSAN_HB_ACQUIRE();
        const int c0 = gi * FSM_GROUP;
        const int ng = n_chunks - c0 < FSM_GROUP ? n_chunks - c0 : FSM_GROUP;
        // Compile-time NG so the chain state lives in registers and the
        // per-byte j-loop fully unrolls.
        const auto walk = [&](auto ngc) {
            constexpr int NG = decltype(ngc)::value;
            int32_t s[NG];
            int64_t cnt[NG], len[NG];
            const uint8_t* in[NG];
            uint8_t* op[NG];
            int32_t* tj[NG];
            int64_t* pf[NG];
            int64_t nmax = 0;
            for (int j = 0; j < NG; j++) {
                const int ci = c0 + j;
                s[j] = ci == 0 ? node : 0;  // chunk 0's entry state IS
                cnt[j] = 0;                 // known; others speculate from
                in[j] = data + chunk_lo(ci);  // the root
                len[j] = chunk_hi(ci) - chunk_lo(ci);
                op[j] = spec_buf(ci);
                tj[j] = &spec_traj[(size_t)ci * SYNC_K];
                pf[j] = &spec_pref[(size_t)ci * SYNC_K];
                if (len[j] > nmax) nmax = len[j];
            }
            for (int64_t i = 0; i < nmax; i++) {
                for (int j = 0; j < NG; j++) {
                    // Only the stream's last chunk is short: the guard
                    // predicts perfectly.
                    if (i >= len[j]) continue;
                    const size_t idx = (size_t)s[j] * 256 + in[j][i];
                    const int32_t e = step_tab[idx];
                    std::memcpy(op[j] + cnt[j], &sym_tab[idx * 8], 8);
                    cnt[j] += e & 15;  // c <= 8 live in the blind 8B write
                    s[j] = e >> 4;
                    if (i < SYNC_K) { tj[j][i] = s[j]; pf[j][i] = cnt[j]; }
                }
            }
            for (int j = 0; j < NG; j++) {
                spec_state[c0 + j] = s[j];
                spec_count[c0 + j] = cnt[j];
            }
        };
        switch (ng) {
            case 8: walk(std::integral_constant<int, 8>{}); break;
            case 7: walk(std::integral_constant<int, 7>{}); break;
            case 6: walk(std::integral_constant<int, 6>{}); break;
            case 5: walk(std::integral_constant<int, 5>{}); break;
            case 4: walk(std::integral_constant<int, 4>{}); break;
            case 3: walk(std::integral_constant<int, 3>{}); break;
            case 2: walk(std::integral_constant<int, 2>{}); break;
            default: walk(std::integral_constant<int, 1>{}); break;
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();

    // Serial stitch: true entry state/offset per chunk via sync prefixes.
    // sync_at[ci] = number of leading bytes whose speculative emissions are
    // wrong and must be re-walked (0 = the whole chunk is exact; -1 = the
    // chunk never synced and pass 2 re-walks it entirely).
    std::vector<int32_t> entry_state(n_chunks);
    std::vector<int64_t> entry_out(n_chunks);
    std::vector<int64_t> sync_at(n_chunks);
    int32_t st = node;
    int64_t total = n_out;
    for (int ci = 0; ci < n_chunks; ci++) {
        entry_state[ci] = st;
        entry_out[ci] = total;
        const int64_t lo = chunk_lo(ci), hi = chunk_hi(ci);
        if (ci == 0 || st == 0) {  // speculation ran the true entry state
            sync_at[ci] = 0;
            total += spec_count[ci];
            st = spec_state[ci];
            continue;
        }
        const int32_t* traj = &spec_traj[(size_t)ci * SYNC_K];
        const int64_t* pref = &spec_pref[(size_t)ci * SYNC_K];
        int64_t i = lo;
        bool synced = false;
        for (; i < hi && i - lo < SYNC_K; i++) {
            const int32_t e = step_tab[(size_t)st * 256 + data[i]];
            total += e & 15;
            st = e >> 4;
            if (st == traj[i - lo]) {  // trajectories merged: rest is exact
                sync_at[ci] = i - lo + 1;
                total += spec_count[ci] - pref[i - lo];
                st = spec_state[ci];
                synced = true;
                break;
            }
        }
        if (!synced) {
            sync_at[ci] = -1;
            for (; i < hi; i++) {
                const int32_t e = step_tab[(size_t)st * 256 + data[i]];
                total += e & 15;
                st = e >> 4;
            }
        }
    }
    if (total > out_cap) return -1;

    // Pass 2: re-walk only the pre-sync bytes, then memcpy the exact
    // speculative tail into place.
    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int ci = 0; ci < n_chunks; ci++) {
        TSAN_HB_ACQUIRE();
        int32_t s2 = entry_state[ci];
        uint8_t* op = out + entry_out[ci];
        const int64_t lo = chunk_lo(ci), hi = chunk_hi(ci);
        const int64_t ns = sync_at[ci];
        const int64_t stop = ns < 0 ? hi : lo + ns;
        for (int64_t i = lo; i < stop; i++) {
            const size_t idx = (size_t)s2 * 256 + data[i];
            const int32_t e = step_tab[idx];
            const int c = e & 15;
            const uint8_t* sy = &sym_tab[idx * 8];
            for (int k = 0; k < c; k++) *op++ = sy[k];
            s2 = e >> 4;
        }
        if (ns >= 0) {
            const int64_t from = ns == 0 ? 0
                : spec_pref[(size_t)ci * SYNC_K + ns - 1];
            std::memcpy(op, spec_buf(ci) + from, spec_count[ci] - from);
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return total;
}

// Serial bounded Huffman decode: emit at most max_out symbols (enough for
// a stream header) and stop.  Used by the pipelined image decoder to parse
// the in-payload header before launching the full overlapped decode.
// Tree-only bit walk — building the byte-FSM tables for a few KB of output
// costs more than the walk itself.
int64_t huffman_fsm_decode_head(const uint8_t* data, int64_t nbytes,
                                int64_t start_bit, const int32_t* syms,
                                const int32_t* words, const int32_t* lens,
                                int n_entries, uint8_t* out,
                                int64_t max_out) {
    FsmTables ft;  // tree only — byte tables cost more than a head walk
    build_code_tree(syms, words, lens, n_entries, ft);
    const int64_t nbits = nbytes * 8;
    int32_t node = 0;
    int64_t n_out = 0;
    int64_t pos = start_bit;
    while (pos < nbits && n_out < max_out) {
        const int bit = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
        pos++;
        const int32_t nxt = ft.child[node * 2 + bit];
        if (nxt < 0) { node = 0; continue; }
        node = nxt;
        if (ft.symbol[node] >= 0) {
            out[n_out++] = (uint8_t)ft.symbol[node];
            node = 0;
        }
    }
    return n_out;
}

// Read n consecutive fixed-width signed fields starting at start_bit
// (the motion-vector spans of a P-frame: 2*Nmb fields of MVEC_BITS each,
// Block.cpp:416-423).  One unaligned big-endian load per field; reads
// past the end yield zero bits (reference semantics).
int64_t read_signed_fields(const uint8_t* data, int64_t nbytes,
                           int64_t start_bit, int64_t n, int width,
                           int32_t* out) {
    if (width <= 0 || width > 15) return -1;
    const uint32_t sign_bit = 1u << (width - 1);
    const uint32_t ext = ~0u << width;
    const int64_t nbits_total = nbytes * 8;
    for (int64_t i = 0; i < n; i++) {
        const int64_t pos = start_bit + i * width;
        uint32_t v;
        if ((pos >> 3) + 9 <= nbytes) {
            uint64_t wd;
            std::memcpy(&wd, data + (pos >> 3), 8);
            wd = __builtin_bswap64(wd) << (pos & 7);
            v = (uint32_t)(wd >> (64 - width));
        } else {
            BitReader r{data, nbits_total, pos};
            v = r.get(width);
        }
        if (v & sign_bit) v |= ext;
        out[i] = (int32_t)v;
    }
    return 0;
}

// Parallel byte histogram (np.bincount on u8 measured 8 ms on a 1.8 MB
// stream — 80% of host Huffman encode; per-thread counters make it
// ~0.3 ms).  Serial analogue: Huffman.cpp:236-243.
int64_t byte_histogram(const uint8_t* data, int64_t n, int64_t* out) {
    int nt = 1;
    #ifdef _OPENMP
    if (n > (int64_t)1 << 16) nt = omp_get_max_threads();
    #endif
    // 4 sub-histograms (lanes) per thread: real encoded streams are highly
    // skewed, and a single counter array stalls on store-to-load forwarding
    // when the same byte value repeats (measured 2.5x slower than on
    // uniform-random bytes); rotating lanes breaks the dependency chain.
    std::vector<int64_t> loc((size_t)nt * 8 * 256, 0);
    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int t = 0; t < nt; t++) {
        TSAN_HB_ACQUIRE();
        const int64_t lo = n * t / nt, hi = n * (t + 1) / nt;
        int64_t* h0 = &loc[(size_t)t * 8 * 256];
        int64_t i = lo;
        for (; i + 8 <= hi; i += 8) {  // one 8-byte load per group
            uint64_t w8;
            std::memcpy(&w8, data + i, 8);
            h0[(uint8_t)w8]++;
            h0[256 + (uint8_t)(w8 >> 8)]++;
            h0[512 + (uint8_t)(w8 >> 16)]++;
            h0[768 + (uint8_t)(w8 >> 24)]++;
            h0[1024 + (uint8_t)(w8 >> 32)]++;
            h0[1280 + (uint8_t)(w8 >> 40)]++;
            h0[1536 + (uint8_t)(w8 >> 48)]++;
            h0[1792 + (uint8_t)(w8 >> 56)]++;
        }
        for (; i < hi; i++) h0[data[i]]++;
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    for (int v = 0; v < 256; v++) {
        int64_t s = 0;
        for (int t = 0; t < nt * 8; t++) s += loc[(size_t)t * 256 + v];
        out[v] = s;
    }
    return 0;
}

// Huffman tree build -> code length per symbol (ops/huffman.py::
// code_lengths semantics, bit-for-bit: min-heap keyed lexicographically by
// (freq, smallest-contained-symbol, creation id) — packed into one
// __int128 so integer order == tuple order).  lengths_out[256] gets 0 for
// absent symbols, >= 1 otherwise (length limiting stays in the caller).
// Returns 0, or -1 when fewer than 2 symbols are present.
int64_t huffman_code_lengths(const int64_t* freqs, int32_t* lengths_out) {
    using key_t = unsigned __int128;
    key_t heap[256];
    int hn = 0;
    int n_syms = 0;
    int16_t child_l[512], child_r[512];
    auto hpush = [&](key_t v) {
        int i = hn++;
        heap[i] = v;
        while (i > 0) {
            const int p = (i - 1) >> 1;
            if (heap[p] <= heap[i]) break;
            std::swap(heap[p], heap[i]);
            i = p;
        }
    };
    auto hpop = [&]() {
        const key_t top = heap[0];
        heap[0] = heap[--hn];
        int i = 0;
        for (;;) {
            const int l = 2 * i + 1, r = 2 * i + 2;
            int s = i;
            if (l < hn && heap[l] < heap[s]) s = l;
            if (r < hn && heap[r] < heap[s]) s = r;
            if (s == i) break;
            std::swap(heap[i], heap[s]);
            i = s;
        }
        return top;
    };
    for (int sym = 0; sym < 256; sym++) {
        if (freqs[sym] > 0) {
            hpush(((key_t)(uint64_t)freqs[sym] << 17)
                  | ((key_t)sym << 9) | (key_t)n_syms);
            n_syms++;
        }
    }
    if (n_syms < 2) return -1;
    int next_id = n_syms;
    while (hn > 1) {
        const key_t e1 = hpop(), e2 = hpop();
        const int t1 = (int)((e1 >> 9) & 0xFF), t2 = (int)((e2 >> 9) & 0xFF);
        child_l[next_id] = (int16_t)(e1 & 0x1FF);
        child_r[next_id] = (int16_t)(e2 & 0x1FF);
        hpush((((e1 >> 17) + (e2 >> 17)) << 17)
              | ((key_t)(t1 < t2 ? t1 : t2) << 9) | (key_t)next_id);
        next_id++;
    }
    int32_t depth[512] = {0};
    for (int nid = next_id - 1; nid >= n_syms; nid--) {
        depth[child_l[nid]] = depth[nid] + 1;
        depth[child_r[nid]] = depth[nid] + 1;
    }
    int leaf = 0;
    for (int sym = 0; sym < 256; sym++) {
        if (freqs[sym] > 0) {
            const int d = depth[leaf++];
            lengths_out[sym] = d > 1 ? d : 1;
        } else {
            lengths_out[sym] = 0;
        }
    }
    return 0;
}

// Parse the Huffman dict groups at start_bit: {1-bit has-items | 7-bit
// seq-len | 4-bit value-bit-len} headers followed by seq-len {8-bit key,
// bit-len-bit code} pairs, terminated by a 0 bit (Huffman.cpp:36-46 /
// :120-143 wire format; the leading stream flag bit is group 1's
// has-items bit).  Returns the bit position after the dict, with the
// entry count in *n_out; -1 if max_entries would overflow.
int64_t parse_huffman_dict(const uint8_t* data, int64_t nbytes,
                           int64_t start_bit, int32_t* syms, int32_t* words,
                           int32_t* lens, int32_t* n_out,
                           int32_t max_entries) {
    BitReader r{data, nbytes * 8, start_bit};
    int32_t n = 0;
    while (r.get(1)) {
        const int32_t seq_len = (int32_t)r.get(7);
        const int32_t bit_len = (int32_t)r.get(4);
        for (int32_t i = 0; i < seq_len; i++) {
            if (n >= max_entries) return -1;
            syms[n] = (int32_t)r.get(8);
            words[n] = (int32_t)r.get(bit_len);
            lens[n] = bit_len;
            n++;
        }
    }
    *n_out = n;
    return r.pos;
}

// ---- Pipelined host image decode -----------------------------------------
//
// Runs the three decode stages OVERLAPPED instead of as barriers
// (VERDICT r3 #1): the Huffman byte-FSM finalizes payload chunks
// progressively (chunks whose predecessor is already stitched emit
// DIRECTLY into the payload buffer — only the first thread-wave runs
// speculatively into scratch), the serial offset walk chases the finalized
// watermark on the coordinating thread, and worker threads extract+IDCT
// blocks as soon as the walk publishes them.  The wire format's serial
// chain (record N's offset depends on all earlier records,
// ImageDecoder.cpp:88-113) thus costs only its own ~1.5 ms of latency
// hidden under the parallel stages, and no 8x speculative buffer or
// Python-side byte copies materialize between stages.
//
// exact != 0 -> f64 bit-parity block decode (quant64/wi64);
// exact == 0 -> f32 fast block decode (quant32/wi32).
// n_entries == 0 -> the stream is not Huffman-coded: `data` IS the payload
// (hdr_bits counts from bit 0 of data, including the leading flag bit).
int64_t decode_image_pipelined(
        const uint8_t* data, int64_t nbytes, int64_t start_bit,
        const int32_t* syms, const int32_t* words, const int32_t* lens,
        int n_entries, int64_t hdr_bits, int64_t n_blocks, int use_rle,
        int block_size, const int32_t* zz, const double* quant64,
        const double* wi64, const float* quant32, const float* wi32,
        int exact, int64_t h, int64_t w, uint8_t* out_img) {
    const int k = block_size * block_size;
    if (k > 256) return -1;
    const int64_t wb = w / block_size;
    if (wb <= 0 || n_blocks != wb * (h / block_size)) return -1;

    // ---- payload plumbing ----
    const uint8_t* pay = data;
    uint8_t* pay_mut = nullptr;
    int64_t pay_cap = nbytes;
    std::unique_ptr<uint8_t[]> pay_own;
    std::atomic<int64_t> final_bytes{0};
    std::atomic<int64_t> payload_total{-1};

    FsmTables ft;
    int32_t node = 0;
    int64_t pre_out = 0;   // symbols emitted before byte alignment
    int64_t first_byte = 0, per = 0;
    int n_chunks = 0;

    if (n_entries == 0) {
        final_bytes.store(nbytes, std::memory_order_relaxed);
        payload_total.store(nbytes, std::memory_order_relaxed);
    } else {
        build_fsm_tables(syms, words, lens, n_entries, ft);
        pay_cap = nbytes * 8 + 64;  // worst case 8 symbols per input byte
        pay_own.reset(new uint8_t[(size_t)pay_cap]);
        pay_mut = pay_own.get();
        pay = pay_mut;
        int64_t pos = fsm_walk_to_alignment(data, nbytes * 8, start_bit,
                                            ft, &node, pay_mut, pay_cap,
                                            &pre_out);
        first_byte = pos >> 3;
        const int64_t n_in = nbytes - first_byte;
        // ~4 chunks per thread so the stitch front chases completion and
        // most chunks start non-speculative; >= 64 KB per chunk keeps the
        // sync overhead negligible.
        int T = (int)std::thread::hardware_concurrency();
        if (T < 1) T = 1;
        per = (n_in + 4 * T - 1) / (4 * T);
        if (per < 65536) per = 65536;
        n_chunks = n_in > 0 ? (int)((n_in + per - 1) / per) : 0;
        if (n_chunks == 0) {
            final_bytes.store(pre_out, std::memory_order_relaxed);
            payload_total.store(pre_out, std::memory_order_relaxed);
        }
    }

    // ---- shared pipeline state ----
    constexpr int SYNC_K = 96;
    constexpr int64_t GRAIN = 512;  // blocks per extract batch
    std::unique_ptr<std::atomic<uint8_t>[]> done(
        n_chunks ? new std::atomic<uint8_t>[n_chunks] : nullptr);
    for (int i = 0; i < n_chunks; i++)
        done[i].store(0, std::memory_order_relaxed);
    std::vector<int32_t> exit_state(n_chunks), entry_state(n_chunks);
    std::vector<int64_t> exit_count(n_chunks), entry_out(n_chunks);
    std::vector<uint8_t> is_direct(n_chunks);
    std::vector<int32_t> spec_entry(n_chunks, 0);
    std::vector<int32_t> traj((size_t)n_chunks * SYNC_K);
    std::vector<int64_t> pref((size_t)n_chunks * SYNC_K);
    std::vector<std::unique_ptr<uint8_t[]>> spec((size_t)n_chunks);
    std::atomic<int> next_chunk{0};
    std::atomic<int> stitched{0};
    std::atomic<int64_t> blocks_ready{0};
    std::atomic<int64_t> block_cursor{0};
    std::vector<int64_t> offs((size_t)n_blocks);
    std::vector<int32_t> dbv((size_t)n_blocks), cntv((size_t)n_blocks);
    if (n_chunks) {
        entry_state[0] = node;
        entry_out[0] = pre_out;
    }

    const auto chunk_lo = [&](int ci) { return first_byte + (int64_t)ci * per; };
    const auto chunk_hi = [&](int ci) {
        const int64_t hi = chunk_lo(ci) + per;
        return hi < nbytes ? hi : nbytes;
    };

    // FSM job: direct chunks (predecessor already stitched at claim time)
    // emit straight into the payload at their known offset; the first
    // thread-wave runs speculatively from the root into per-chunk scratch
    // with a SYNC_K (state, count) trajectory for the stitcher.
    const auto fsm_chunk = [&](int ci) {
        const int64_t lo = chunk_lo(ci), hi = chunk_hi(ci);
        const bool direct = stitched.load(std::memory_order_acquire) >= ci;
        int32_t s;
        uint8_t* op;
        if (direct) {
            s = entry_state[ci];
            op = pay_mut + entry_out[ci];
        } else {
            s = 0;
            spec_entry[ci] = 0;
            spec[ci].reset(new uint8_t[(size_t)(hi - lo) * 8 + 8]);
            op = spec[ci].get();
        }
        int64_t cnt = 0;
        int32_t* tj = &traj[(size_t)ci * SYNC_K];
        int64_t* pf = &pref[(size_t)ci * SYNC_K];
        for (int64_t i = lo; i < hi; i++) {
            const size_t idx = (size_t)s * 256 + data[i];
            const int32_t e = ft.step_tab[idx];
            std::memcpy(op + cnt, &ft.sym_tab[idx * 8], 8);  // c <= 8 live
            cnt += e & 15;
            s = e >> 4;
            if (!direct && i - lo < SYNC_K) { tj[i - lo] = s; pf[i - lo] = cnt; }
        }
        exit_state[ci] = s;
        exit_count[ci] = cnt;
        is_direct[ci] = direct;
        done[ci].store(1, std::memory_order_release);
    };

    // Interleaved pair: two independent state chains in one loop hide the
    // table walk's dependent-load latency (~1.7x).  Chunk `cb` always runs
    // speculatively from the root into scratch — its predecessor `ca` is
    // claimed by this very call, so its entry state cannot be known yet
    // (and two contiguous direct chunks would overwrite each other via
    // the 8-byte blind emits anyway).
    const auto fsm_chunk_pair = [&](int ca, int cb) {
        const int64_t loa = chunk_lo(ca), hia = chunk_hi(ca);
        const int64_t lob = chunk_lo(cb), hib = chunk_hi(cb);
        const bool da = stitched.load(std::memory_order_acquire) >= ca;
        int32_t sa, sb = 0;
        uint8_t *opa, *opb;
        if (da) {
            sa = entry_state[ca];
            opa = pay_mut + entry_out[ca];
        } else {
            sa = 0;
            spec_entry[ca] = 0;
            spec[ca].reset(new uint8_t[(size_t)(hia - loa) * 8 + 8]);
            opa = spec[ca].get();
        }
        spec_entry[cb] = 0;
        spec[cb].reset(new uint8_t[(size_t)(hib - lob) * 8 + 8]);
        opb = spec[cb].get();
        int64_t ca_cnt = 0, cb_cnt = 0;
        int32_t* tja = &traj[(size_t)ca * SYNC_K];
        int64_t* pfa = &pref[(size_t)ca * SYNC_K];
        int32_t* tjb = &traj[(size_t)cb * SYNC_K];
        int64_t* pfb = &pref[(size_t)cb * SYNC_K];
        const int64_t na = hia - loa, nb = hib - lob;
        const int64_t nmin = na < nb ? na : nb;
        for (int64_t i = 0; i < nmin; i++) {
            const size_t ia = (size_t)sa * 256 + data[loa + i];
            const size_t ib = (size_t)sb * 256 + data[lob + i];
            const int32_t ea = ft.step_tab[ia];
            const int32_t eb = ft.step_tab[ib];
            std::memcpy(opa + ca_cnt, &ft.sym_tab[ia * 8], 8);
            std::memcpy(opb + cb_cnt, &ft.sym_tab[ib * 8], 8);
            ca_cnt += ea & 15;
            sa = ea >> 4;
            cb_cnt += eb & 15;
            sb = eb >> 4;
            if (i < SYNC_K) {
                if (!da) { tja[i] = sa; pfa[i] = ca_cnt; }
                tjb[i] = sb;
                pfb[i] = cb_cnt;
            }
        }
        for (int64_t i = nmin; i < na; i++) {
            const size_t ia = (size_t)sa * 256 + data[loa + i];
            const int32_t ea = ft.step_tab[ia];
            std::memcpy(opa + ca_cnt, &ft.sym_tab[ia * 8], 8);
            ca_cnt += ea & 15;
            sa = ea >> 4;
            if (!da && i < SYNC_K) { tja[i] = sa; pfa[i] = ca_cnt; }
        }
        exit_state[ca] = sa;
        exit_count[ca] = ca_cnt;
        is_direct[ca] = da;
        done[ca].store(1, std::memory_order_release);
        for (int64_t i = nmin; i < nb; i++) {
            const size_t ib = (size_t)sb * 256 + data[lob + i];
            const int32_t eb = ft.step_tab[ib];
            std::memcpy(opb + cb_cnt, &ft.sym_tab[ib * 8], 8);
            cb_cnt += eb & 15;
            sb = eb >> 4;
            if (i < SYNC_K) { tjb[i] = sb; pfb[i] = cb_cnt; }
        }
        exit_state[cb] = sb;
        exit_count[cb] = cb_cnt;
        is_direct[cb] = 0;
        done[cb].store(1, std::memory_order_release);
    };

    // Walker state (coordinator thread only): the serial offset-recovery
    // chain, restricted to bits below the finalized watermark.
    int64_t walk_pos = hdr_bits;
    int64_t walked = 0;
    const auto walker_advance = [&]() -> bool {
        const int64_t fb = final_bytes.load(std::memory_order_acquire);
        const bool complete = payload_total.load(std::memory_order_acquire) >= 0;
        bool progressed = false;
        if (complete) {
            // End-safe tail: reads past the payload end return 0 bits.
            // Publish progressively so extract workers overlap this walk
            // (a non-Huffman stream is "complete" from the start and
            // would otherwise serialize the whole walk before any
            // extraction).
            BitReader r{pay, fb * 8, walk_pos};
            while (walked < n_blocks) {
                const uint32_t b = r.get(4);
                const int64_t count = use_rle ? (int64_t)r.get((int)b) : k;
                offs[walked] = r.pos;
                dbv[walked] = (int32_t)b;
                cntv[walked] = (int32_t)count;
                r.pos += (int64_t)b * count;
                walked++;
                progressed = true;
                if ((walked & 2047) == 0)
                    blocks_ready.store(walked, std::memory_order_release);
            }
            walk_pos = r.pos;
            blocks_ready.store(n_blocks, std::memory_order_release);
            return progressed;
        }
        // A record header is <= 4 + 15 = 19 bits and parsed via one 8-byte
        // load; require the loaded bits through the header end to be final.
        const int64_t lim = fb * 8 - 72;  // 9-byte guard below the watermark
        while (walked < n_blocks && walk_pos >= 0 && walk_pos < lim) {
            uint64_t wd;
            std::memcpy(&wd, pay + (walk_pos >> 3), 8);
            wd = __builtin_bswap64(wd) << (walk_pos & 7);
            const uint32_t b = (uint32_t)(wd >> 60);
            int64_t count;
            if (use_rle) {
                count = b ? (int64_t)((wd << 4) >> (64 - b)) : 0;
                walk_pos += 4 + b;
            } else {
                count = k;
                walk_pos += 4;
            }
            offs[walked] = walk_pos;
            dbv[walked] = (int32_t)b;
            cntv[walked] = (int32_t)count;
            walk_pos += (int64_t)b * count;
            walked++;
            progressed = true;
        }
        if (walked > 0) {
            // Record N's payload is proven final only once record N+1's
            // header passed the watermark check; release all but the last.
            blocks_ready.store(walked - 1, std::memory_order_release);
        }
        return progressed;
    };

    const auto extract_batch = [&](int64_t b0, int64_t b1) {
        const int64_t nb_now = final_bytes.load(std::memory_order_acquire);
        if (exact) {
            for (int64_t n = b0; n < b1; n++)
                decode_block_exact_one(pay, nb_now, offs[(size_t)n],
                                       dbv[(size_t)n], cntv[(size_t)n], zz,
                                       block_size, k, quant64, wi64, wb, w,
                                       n, nullptr, out_img);
        } else {
            for (int64_t n = b0; n < b1; n++)
                decode_block_f32_one(pay, nb_now, offs[(size_t)n],
                                     dbv[(size_t)n], cntv[(size_t)n], zz,
                                     block_size, k, quant32, wi32, wb, w,
                                     n, nullptr, out_img);
        }
    };

    const auto extract_loop = [&]() {
        for (;;) {
            const int64_t br = blocks_ready.load(std::memory_order_acquire);
            int64_t b0 = block_cursor.load(std::memory_order_relaxed);
            if (b0 >= n_blocks) break;
            if (b0 >= br) {
                std::this_thread::yield();
                continue;
            }
            int64_t take = br - b0;
            if (take > GRAIN) take = GRAIN;
            if (!block_cursor.compare_exchange_weak(
                    b0, b0 + take, std::memory_order_acq_rel))
                continue;
            extract_batch(b0, b0 + take);
        }
    };

    // ---- launch ----
    // One pipelined decode at a time: the pool's workers capture this
    // call's stack state.  Concurrent callers serialize here (each still
    // runs fully parallel inside).
    static std::mutex pipe_mu;
    std::lock_guard<std::mutex> pipe_guard(pipe_mu);
    int T = (int)std::thread::hardware_concurrency();
    if (T < 2) T = 2;
    PipelinePool& pool = PipelinePool::instance();
    pool.launch(T - 1, [&](int) {
        for (;;) {
            const int c = next_chunk.fetch_add(2,
                                               std::memory_order_relaxed);
            if (c >= n_chunks) break;
            if (c + 1 < n_chunks) fsm_chunk_pair(c, c + 1);
            else fsm_chunk(c);
        }
        extract_loop();
    });

    // Coordinator: stitch chunks in order (emitting re-walked pre-sync
    // bytes in place), advance the watermark, and run the serial walker in
    // the gaps.  It does NOT take whole FSM chunks: a chunk on this thread
    // would stall the stitch front, forcing later chunks speculative and
    // starving the walker/extractors (measured 1.5x slower).
    const bool dbg = std::getenv("IER_PIPE_DEBUG") != nullptr;
    const auto tstart = std::chrono::steady_clock::now();
    const auto ms_now = [&]() {
        return std::chrono::duration<double, std::milli>(
                   std::chrono::steady_clock::now() - tstart).count();
    };
    double t_first_stitch = -1, t_fsm_done = -1, t_walk_done = -1;
    // One extract batch, if any blocks are published: bounded (~tens of µs)
    // so the stitch front stays responsive while this thread waits.
    const auto try_extract_one = [&]() -> bool {
        const int64_t br = blocks_ready.load(std::memory_order_acquire);
        int64_t b0 = block_cursor.load(std::memory_order_relaxed);
        if (b0 >= n_blocks || b0 >= br) return false;
        int64_t take = br - b0;
        if (take > GRAIN) take = GRAIN;
        if (!block_cursor.compare_exchange_strong(
                b0, b0 + take, std::memory_order_acq_rel))
            return false;
        extract_batch(b0, b0 + take);
        return true;
    };

    int ci = 0;
    int64_t total_out = pre_out;
    int32_t st = node;
    while (ci < n_chunks) {
        if (!done[ci].load(std::memory_order_acquire)) {
            if (!walker_advance() && !try_extract_one())
                std::this_thread::yield();
            continue;
        }
        const int64_t lo = chunk_lo(ci), hi = chunk_hi(ci);
        if (is_direct[ci] || st == spec_entry[ci]) {
            if (!is_direct[ci]) {
                // Speculation ran from the true entry state (known at claim
                // time, or the root happened to be right): adopt the
                // scratch output wholesale.
                std::memcpy(pay_mut + total_out, spec[ci].get(),
                            (size_t)exit_count[ci]);
            }
            total_out += exit_count[ci];
            st = exit_state[ci];
        } else {
            // Re-walk the pre-sync bytes EMITTING in place, then adopt the
            // exact speculative tail (Huffman FSMs self-synchronize within
            // a few bytes; fall back to a full re-walk if never).
            const int32_t* tj = &traj[(size_t)ci * SYNC_K];
            const int64_t* pf = &pref[(size_t)ci * SYNC_K];
            int64_t i = lo;
            bool synced = false;
            for (; i < hi && i - lo < SYNC_K; i++) {
                const size_t idx = (size_t)st * 256 + data[i];
                const int32_t e = ft.step_tab[idx];
                std::memcpy(pay_mut + total_out, &ft.sym_tab[idx * 8], 8);
                total_out += e & 15;
                st = e >> 4;
                if (st == tj[i - lo]) {
                    const int64_t from = pf[i - lo];
                    std::memcpy(pay_mut + total_out, spec[ci].get() + from,
                                (size_t)(exit_count[ci] - from));
                    total_out += exit_count[ci] - from;
                    st = exit_state[ci];
                    synced = true;
                    break;
                }
            }
            if (!synced) {
                for (; i < hi; i++) {
                    const size_t idx = (size_t)st * 256 + data[i];
                    const int32_t e = ft.step_tab[idx];
                    std::memcpy(pay_mut + total_out, &ft.sym_tab[idx * 8],
                                8);
                    total_out += e & 15;
                    st = e >> 4;
                }
            }
        }
        spec[ci].reset();
        ci++;
        if (ci < n_chunks) {
            entry_state[ci] = st;
            entry_out[ci] = total_out;
        }
        // The blind 8-byte emit may scribble up to 7 bytes past the true
        // count; the watermark only certifies bytes strictly below it.
        final_bytes.store(total_out, std::memory_order_release);
        stitched.store(ci, std::memory_order_release);
        if (dbg && t_first_stitch < 0) t_first_stitch = ms_now();
        walker_advance();
    }
    if (n_entries != 0 && n_chunks > 0) {
        payload_total.store(total_out, std::memory_order_release);
        final_bytes.store(total_out, std::memory_order_release);
    }
    if (dbg) t_fsm_done = ms_now();
    while (blocks_ready.load(std::memory_order_acquire) < n_blocks)
        walker_advance();
    if (dbg) t_walk_done = ms_now();
    extract_loop();
    while (!pool.idle())  // workers reference this frame's stack state
        std::this_thread::yield();
    if (dbg)
        std::fprintf(stderr,
                     "[pipe] first_stitch %.2f fsm_done %.2f walk_done %.2f "
                     "all %.2f ms (%d chunks)\n",
                     t_first_stitch, t_fsm_done, t_walk_done, ms_now(),
                     n_chunks);
    return 0;
}

// Bit-exact replica of the reference's naive 2-D DCT accumulation
// (algo.cpp:309-331 order) over flattened [n_blocks, k] f64 tiles:
//   acc[uv] = (sum over cells in order) x[cell] * w[cell][uv], then * scale.
// Must be compiled with -ffp-contract=off: an FMA would skip the
// intermediate rounding the reference (and the numpy path) performs.
// scale may be null (inverse transform bakes C into w).
int64_t dct_exact(const double* blocks, int64_t n_blocks, int k,
                  const double* w, const double* scale, double* out) {
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_blocks > 1024)
    for (int64_t n = 0; n < n_blocks; n++) {
        TSAN_HB_ACQUIRE();
        const double* x = blocks + n * k;
        double* acc = out + n * k;
        for (int uv = 0; uv < k; uv++) acc[uv] = 0.0;
        for (int c = 0; c < k; c++) {
            const double xv = x[c];
            const double* wr = w + c * k;
            for (int uv = 0; uv < k; uv++) {
                const double t = xv * wr[uv];
                acc[uv] += t;
            }
        }
        if (scale) {
            for (int uv = 0; uv < k; uv++) acc[uv] *= scale[uv];
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// Coefficient extraction: for each block, read `counts[i]` fields of
// `bits[i]` bits starting at offsets[i], sign-extend, and store at the
// row-major position given by the zig-zag LUT (zz[j] = row-major index of
// the j-th zig-zag coefficient). Unwritten positions must be pre-zeroed by
// the caller. Reads past the end yield zero bits (reference semantics).
int64_t extract_coeffs(const uint8_t* data, int64_t nbytes,
                       const int64_t* offsets, const int32_t* bits,
                       const int32_t* counts, int64_t n_blocks,
                       const int32_t* zz, int block_size, int16_t* out) {
    const int k = block_size * block_size;
    const int64_t nbits_total = nbytes * 8;
    // Offsets are precomputed, so blocks extract independently.
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_blocks > 4096)
    for (int64_t n = 0; n < n_blocks; n++) {
        TSAN_HB_ACQUIRE();
        const int b = bits[n];
        const int cnt = counts[n] < k ? counts[n] : k;
        int64_t pos = offsets[n];
        int16_t* row = out + n * k;
        if (b == 0) continue;
        const uint32_t sign_bit = 1u << (b - 1);
        const uint32_t ext = ~0u << b;
        if (((pos + (int64_t)b * cnt) >> 3) + 9 <= nbytes) {
            // Fast path: one unaligned big-endian 64-bit load per field
            // (b <= 15 always fits), no per-field bounds branches.
            for (int j = 0; j < cnt; j++) {
                uint64_t wd;
                std::memcpy(&wd, data + (pos >> 3), 8);
                wd = __builtin_bswap64(wd) << (pos & 7);
                uint32_t v = (uint32_t)(wd >> (64 - b));
                pos += b;
                if (v & sign_bit) v |= ext;  // sign-extend
                row[zz[j]] = (int16_t)(int32_t)v;
            }
            continue;
        }
        for (int j = 0; j < cnt; j++) {
            uint32_t v = 0;
            if (pos + b <= nbits_total) {
                // 3-byte window covers any field of <= 17 bits.
                const int64_t byte0 = pos >> 3;
                uint32_t w = (uint32_t)data[byte0] << 16;
                if (byte0 + 1 < nbytes) w |= (uint32_t)data[byte0 + 1] << 8;
                if (byte0 + 2 < nbytes) w |= (uint32_t)data[byte0 + 2];
                v = (w >> (24 - (int)(pos & 7) - b)) & ((1u << b) - 1u);
            } else {
                BitReader r{data, nbits_total, pos};
                v = r.get(b);
            }
            pos += b;
            if (v & sign_bit) v |= ext;  // sign-extend
            row[zz[j]] = (int16_t)(int32_t)v;
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// Fused decode back end: coefficient extraction + dequant + inverse DCT +
// pixel restore/clamp + deblockify in ONE pass over the blocks, writing
// decoded bytes straight into the [h, w] image (no [N, k] coefficient or
// [N, B, B] block intermediates).  The inverse transform is the sparse
// accumulation y += (coeff * quant[rm]) * wi_row[rm] over only the
// non-zero extracted coefficients (typical blocks carry a handful), with
// y initialised to the +128 pixel restore.  f32 like the host "fast"
// BLAS path (inverse_transform_fast); +-1 rounding-tie class vs the f64
// bit-parity path.  Mirrors reference ImageDecoder.cpp:88-122 +
// Block.cpp:163-177 semantics (clamp = uint8(std::clamp(x, 0., 255.))).
// wi is the row-major [k, k] inverse weight matrix (y_flat = c_flat @ wi).
static int64_t decode_to_image_impl(
        const uint8_t* data, int64_t nbytes, const int64_t* offsets,
        const int32_t* bits, const int32_t* counts, int64_t n_blocks,
        const int32_t* zz, int block_size, const float* quant,
        const float* wi, int64_t h, int64_t w, const uint8_t* pred,
        uint8_t* out) {
    const int k = block_size * block_size;
    if (k > 256) return -1;
    const int64_t wb = w / block_size;
    if (wb <= 0 || n_blocks != wb * (h / block_size)) return -1;
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_blocks > 1024)
    for (int64_t n = 0; n < n_blocks; n++) {
        TSAN_HB_ACQUIRE();
        decode_block_f32_one(data, nbytes, offsets[n], bits[n], counts[n],
                             zz, block_size, k, quant, wi, wb, w, n, pred,
                             out);
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// f64 BIT-PARITY twin of decode_to_image: extraction + dequant + the
// reference-order f64 inverse DCT (algo.cpp:343-363 via the same
// accumulate-over-coefficients order as dct_exact; zero coefficients are
// skipped — their ±0.0 contributions cannot change any nonzero partial
// sum, and the +128 bias erases zero signs) + clamp + deblockify.
// Replicates the numpy chain exactly: y = c*quant, acc += y*wi[c][pix]
// in row-major c order, x+128, floor(clip(x,0,255)).
int64_t decode_to_image_exact(const uint8_t* data, int64_t nbytes,
                              const int64_t* offsets, const int32_t* bits,
                              const int32_t* counts, int64_t n_blocks,
                              const int32_t* zz, int block_size,
                              const double* quant, const double* wi,
                              int64_t h, int64_t w, uint8_t* out) {
    const int k = block_size * block_size;
    if (k > 256) return -1;
    const int64_t wb = w / block_size;
    if (wb <= 0 || n_blocks != wb * (h / block_size)) return -1;
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_blocks > 1024)
    for (int64_t n = 0; n < n_blocks; n++) {
        TSAN_HB_ACQUIRE();
        decode_block_exact_one(data, nbytes, offsets[n], bits[n], counts[n],
                               zz, block_size, k, quant, wi, wb, w, n,
                               nullptr, out);
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// P-frame BIT-PARITY variant: residual extract + exact f64 IDCT +
// prediction add + clamp (the f64 twin of decode_residual_to_image;
// decode mirror of Frame.cpp:107-117 in the reference's own precision).
int64_t decode_residual_to_image_exact(
        const uint8_t* data, int64_t nbytes, const int64_t* offsets,
        const int32_t* bits, const int32_t* counts, int64_t n_blocks,
        const int32_t* zz, int block_size, const double* quant,
        const double* wi, int64_t h, int64_t w, const uint8_t* pred,
        uint8_t* out) {
    const int k = block_size * block_size;
    if (k > 256) return -1;
    const int64_t wb = w / block_size;
    if (wb <= 0 || n_blocks != wb * (h / block_size)) return -1;
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_blocks > 1024)
    for (int64_t n = 0; n < n_blocks; n++) {
        TSAN_HB_ACQUIRE();
        decode_block_exact_one(data, nbytes, offsets[n], bits[n], counts[n],
                               zz, block_size, k, quant, wi, wb, w, n,
                               pred, out);
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

int64_t decode_to_image(const uint8_t* data, int64_t nbytes,
                        const int64_t* offsets, const int32_t* bits,
                        const int32_t* counts, int64_t n_blocks,
                        const int32_t* zz, int block_size,
                        const float* quant, const float* wi,
                        int64_t h, int64_t w, uint8_t* out) {
    return decode_to_image_impl(data, nbytes, offsets, bits, counts,
                                n_blocks, zz, block_size, quant, wi, h, w,
                                nullptr, out);
}

// P-frame variant: adds the motion-compensated prediction before the
// clamp (decode mirror of Frame.cpp:107-117).
int64_t decode_residual_to_image(
        const uint8_t* data, int64_t nbytes, const int64_t* offsets,
        const int32_t* bits, const int32_t* counts, int64_t n_blocks,
        const int32_t* zz, int block_size, const float* quant,
        const float* wi, int64_t h, int64_t w, const uint8_t* pred,
        uint8_t* out) {
    return decode_to_image_impl(data, nbytes, offsets, bits, counts,
                                n_blocks, zz, block_size, quant, wi, h, w,
                                pred, out);
}

// Motion-compensated prediction assembly: every 16x16 macroblock copies
// its clamped window from the reference frame (Block.cpp:482-496 —
// position = own coord + mvec, clamped to the frame). mv is [n_mb, 2]
// (x, y) in row-major macroblock order.
int64_t predict_frame(const uint8_t* ref, int64_t h, int64_t w,
                      const int32_t* mv, uint8_t* out) {
    const int MB = 16;
    if (h % MB || w % MB) return -1;
    const int64_t mbx = w / MB, n_mb = mbx * (h / MB);
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_mb > 256)
    for (int64_t m = 0; m < n_mb; m++) {
        TSAN_HB_ACQUIRE();
        const int64_t bx = (m % mbx) * MB, by = (m / mbx) * MB;
        int64_t px = bx + mv[2 * m], py = by + mv[2 * m + 1];
        px = px < 0 ? 0 : (px > w - MB ? w - MB : px);
        py = py < 0 ? 0 : (py > h - MB ? h - MB : py);
        for (int r = 0; r < MB; r++)
            std::memcpy(out + (by + r) * w + bx,
                        ref + (py + r) * w + px, MB);
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// MSB-first packer: each field's low nbits[i] bits of values[i], concatenated.
// out must be zeroed by the caller. Returns 0, or -1 if out_cap is too small.
//
// Two-phase parallel formulation (the C++ mirror of ops/device_pack.py):
// a serial prefix sum fixes every field's absolute bit offset, then fields
// write their bits independently; bytes shared between neighbouring fields
// are combined with atomic OR, bytes wholly inside one field are plain
// stores.  Falls back to the serial accumulator for small inputs.
// 2D-log motion search for every 16x16 MacroBlock of `cur` against `ref`
// (Block.cpp:268-339 semantics as replicated by ops/motion.py: MER_SIGNS
// probe order, <= tie-break updating within a level, clamped-to-self skip
// for p > 0, window clamping at the frame edge).  steps = the per-level
// step sizes (merange//2, //4, ..., 1).  out_mvec int32 [N, 2] as (x, y)
// relative offsets, MacroBlocks in row-major order.
// 16x16 SAD of a macroblock against a reference window (both stride w).
// psadbw sums absolute u8 differences 8 bytes at a time — one op per
// 16-byte row instead of 16 scalar abs-diffs; integer-exact either way.
static inline int64_t sad16x16(const uint8_t* a, const uint8_t* b,
                               int64_t w) {
#if defined(__SSE2__)
    __m128i acc = _mm_setzero_si128();
    for (int r = 0; r < 16; r++) {
        const __m128i va =
            _mm_loadu_si128((const __m128i*)(a + (int64_t)r * w));
        const __m128i vb =
            _mm_loadu_si128((const __m128i*)(b + (int64_t)r * w));
        acc = _mm_add_epi64(acc, _mm_sad_epu8(va, vb));
    }
    return _mm_cvtsi128_si64(acc)
           + _mm_cvtsi128_si64(_mm_srli_si128(acc, 8));
#else
    int64_t diff = 0;
    for (int r = 0; r < 16; r++) {
        const uint8_t* c_ = a + (int64_t)r * w;
        const uint8_t* r_ = b + (int64_t)r * w;
        int d = 0;
        for (int c2 = 0; c2 < 16; c2++) {
            const int t = (int)c_[c2] - (int)r_[c2];
            d += t < 0 ? -t : t;
        }
        diff += d;
    }
    return diff;
#endif
}

int64_t find_motion(const uint8_t* cur, const uint8_t* ref, int64_t h,
                    int64_t w, const int32_t* steps, int n_steps,
                    int32_t* out_mvec) {
    static const int SX[9] = {0, 1, 1, 0, -1, -1, -1, 0, 1};
    static const int SY[9] = {0, 0, 1, 1, 1, 0, -1, -1, -1};
    const int64_t nby = h / 16, nbx = w / 16;
    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int64_t mb = 0; mb < nby * nbx; mb++) {
        TSAN_HB_ACQUIRE();
        const int64_t by = (mb / nbx) * 16, bx = (mb % nbx) * 16;
        const uint8_t* cb = cur + by * w + bx;
        int offx = 0, offy = 0;
        int64_t best = INT64_MAX;
        for (int si = 0; si < n_steps; si++) {
            const int s = steps[si];
            int64_t running = best;
            int selx = offx, sely = offy;
            for (int p = 0; p < 9; p++) {
                const int cx = offx + SX[p] * s, cy = offy + SY[p] * s;
                int64_t px = bx + cx, py = by + cy;
                if (px < 0) px = 0;
                if (px > w - 16) px = w - 16;
                if (py < 0) py = 0;
                if (py > h - 16) py = h - 16;
                if (p > 0 && px == bx && py == by) continue;  // skip rule
                const uint8_t* rb = ref + py * w + px;
                const int64_t diff = sad16x16(cb, rb, w);
                if (diff <= running) {
                    running = diff;
                    selx = cx;
                    sely = cy;
                }
            }
            offx = selx;
            offy = sely;
            best = running;
        }
        out_mvec[mb * 2] = offx;
        out_mvec[mb * 2 + 1] = offy;
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// Fused bit-parity forward transform: u8 blocks -> quantized int32
// coefficients in ZIG-ZAG order.  Replicates the reference accumulation
// order exactly (algo.cpp:309-331; compiled with -ffp-contract=off so no
// FMA skips the intermediate rounding), then the separate f64
// *scale / quant ops and the trunc-based round-half-away
// (Block.cpp:148-153) — bit-identical to the numpy chain it replaces
// (astype(f64)-128 -> dct2_exact -> /quant -> round -> int32).
int64_t dct_quantize_exact(const uint8_t* blocks, int64_t n_blocks, int k,
                           const double* w, const double* scale,
                           const double* quant, const int32_t* zz,
                           int32_t* out) {
    if (k > 256) return -1;
#if defined(__AVX512F__)
    if ((k == 16 || k == 64) && zz) {
        // Interleaved groups (4x 4x4 / 2x 8x8 blocks): see
        // dctk_quant_avx512_nb.
        const int G = k == 16 ? 4 : 2;
        const int64_t ng = (n_blocks + G - 1) / G;
        TSAN_HB_RELEASE();
        #pragma omp parallel for schedule(static) if (n_blocks > 1024)
        for (int64_t g = 0; g < ng; g++) {
            TSAN_HB_ACQUIRE();
            const int64_t n0 = g * G;
            const int gn = (int)(n_blocks - n0 < G ? n_blocks - n0 : G);
            alignas(64) double xd[4 * 64];
            for (int b = 0; b < gn; b++) {
                const uint8_t* x = blocks + (n0 + b) * k;
                for (int c = 0; c < k; c++)
                    xd[(size_t)b * k + c] = (double)x[c] - 128.0;
            }
            int32_t* rows = out + n0 * k;
            if (gn == 4 && k == 16)
                dctk_quant_avx512_nb<16, 4>(xd, w, scale, quant, zz, rows);
            else if (gn == 2 && k == 64)
                dctk_quant_avx512_nb<64, 2>(xd, w, scale, quant, zz, rows);
            else
                for (int b = 0; b < gn; b++) {
                    if (k == 16)
                        dctk_quant_avx512<16>(xd + (size_t)b * k, w, scale,
                                              quant, zz, rows + b * k);
                    else
                        dctk_quant_avx512<64>(xd + (size_t)b * k, w, scale,
                                              quant, zz, rows + b * k);
                }
            TSAN_HB_RELEASE();
        }
        TSAN_HB_ACQUIRE();
        return 0;
    }
#endif
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_blocks > 1024)
    for (int64_t n = 0; n < n_blocks; n++) {
        TSAN_HB_ACQUIRE();
        const uint8_t* x = blocks + n * k;
        int32_t* row = out + n * k;
        double acc[256];
        for (int uv = 0; uv < k; uv++) acc[uv] = 0.0;
        for (int c = 0; c < k; c++) {
            const double xv = (double)x[c] - 128.0;
            const double* wr = w + c * k;
            for (int uv = 0; uv < k; uv++) {
                const double t = xv * wr[uv];
                acc[uv] += t;
            }
        }
        for (int j = 0; j < k; j++) {
            const int uv = zz ? zz[j] : j;
            const double y = acc[uv] * scale[uv];
            const double z = y / quant[uv];
            const double t = __builtin_trunc(z);
            const double d = z - t;
            const double r = (d >= 0.5 || d <= -0.5)
                ? (z >= 0.0 ? t + 1.0 : t - 1.0) : t;
            row[j] = (int32_t)r;
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// f64-input twin of dct_quantize_exact for video residual blocks (the
// -128 bias applies to residuals too, Block.cpp:139-153 / SUBTRACT_128).
int64_t dct_quantize_exact_f64(const double* blocks, int64_t n_blocks,
                               int k, const double* w, const double* scale,
                               const double* quant, const int32_t* zz,
                               int32_t* out) {
    if (k > 256) return -1;
#if defined(__AVX512F__)
    if ((k == 16 || k == 64) && zz) {
        const int G = k == 16 ? 4 : 2;
        const int64_t ng = (n_blocks + G - 1) / G;
        TSAN_HB_RELEASE();
        #pragma omp parallel for schedule(static) if (n_blocks > 1024)
        for (int64_t g = 0; g < ng; g++) {
            TSAN_HB_ACQUIRE();
            const int64_t n0 = g * G;
            const int gn = (int)(n_blocks - n0 < G ? n_blocks - n0 : G);
            alignas(64) double xd[4 * 64];
            for (int b = 0; b < gn; b++) {
                const double* x = blocks + (n0 + b) * k;
                for (int c = 0; c < k; c++)
                    xd[(size_t)b * k + c] = x[c] - 128.0;
            }
            int32_t* rows = out + n0 * k;
            if (gn == 4 && k == 16)
                dctk_quant_avx512_nb<16, 4>(xd, w, scale, quant, zz, rows);
            else if (gn == 2 && k == 64)
                dctk_quant_avx512_nb<64, 2>(xd, w, scale, quant, zz, rows);
            else
                for (int b = 0; b < gn; b++) {
                    if (k == 16)
                        dctk_quant_avx512<16>(xd + (size_t)b * k, w, scale,
                                              quant, zz, rows + b * k);
                    else
                        dctk_quant_avx512<64>(xd + (size_t)b * k, w, scale,
                                              quant, zz, rows + b * k);
                }
            TSAN_HB_RELEASE();
        }
        TSAN_HB_ACQUIRE();
        return 0;
    }
#endif
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_blocks > 1024)
    for (int64_t n = 0; n < n_blocks; n++) {
        TSAN_HB_ACQUIRE();
        const double* x = blocks + n * k;
        int32_t* row = out + n * k;
        double acc[256];
        for (int uv = 0; uv < k; uv++) acc[uv] = 0.0;
        for (int c = 0; c < k; c++) {
            const double xv = x[c] - 128.0;
            const double* wr = w + c * k;
            for (int uv = 0; uv < k; uv++) {
                const double t = xv * wr[uv];
                acc[uv] += t;
            }
        }
        for (int j = 0; j < k; j++) {
            const int uv = zz ? zz[j] : j;
            const double y = acc[uv] * scale[uv];
            const double z = y / quant[uv];
            const double t = __builtin_trunc(z);
            const double d = z - t;
            const double r = (d >= 0.5 || d <= -0.5)
                ? (z >= 0.0 ? t + 1.0 : t - 1.0) : t;
            row[j] = (int32_t)r;
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// Exact-order f64 residual reconstruction (the encoder's own decode,
// ImageBase.cpp:266-306): zig-zag int32 coefficients -> dequant ->
// reference-order inverse DCT -> +128 -> add prediction -> clamp,
// writing the reconstructed frame deblockified.  Zero coefficients are
// skipped (provably exact, see decode_to_image_exact).
int64_t idct_recon_exact(const int32_t* czz, int64_t n_blocks,
                         int block_size, const int32_t* zz,
                         const double* wi, const double* quant,
                         const uint8_t* pred, int64_t h, int64_t w,
                         uint8_t* out) {
    const int k = block_size * block_size;
    if (k > 256) return -1;
    const int64_t wb = w / block_size;
    if (wb <= 0 || n_blocks != wb * (h / block_size)) return -1;
    TSAN_HB_RELEASE();
    #pragma omp parallel for schedule(static) if (n_blocks > 1024)
    for (int64_t n = 0; n < n_blocks; n++) {
        TSAN_HB_ACQUIRE();
        const int32_t* src = czz + n * k;
#if defined(__AVX512F__)
        if (k == 16) {
            int32_t cf16[16];
            for (int j = 0; j < 16; j++) cf16[zz[j]] = src[j];
            __m512d a[2];
            idctk_accum_avx512<16>(cf16, quant, wi, a);
            const int64_t px0 = (n / wb) * 4 * w + (n % wb) * 4;
            storek_px<4>(a, pred + px0, w, out + px0);
            continue;
        }
        if (k == 64) {
            int32_t cf64[64];
            for (int j = 0; j < 64; j++) cf64[zz[j]] = src[j];
            __m512d a[8];
            idctk_accum_avx512<64>(cf64, quant, wi, a);
            const int64_t px0 = (n / wb) * 8 * w + (n % wb) * 8;
            storek_px<8>(a, pred + px0, w, out + px0);
            continue;
        }
#endif
        int32_t cf[256];
        for (int t = 0; t < k; t++) cf[t] = 0;
        for (int j = 0; j < k; j++) cf[zz[j]] = src[j];
        double acc[256];
        for (int t = 0; t < k; t++) acc[t] = 0.0;
        for (int c = 0; c < k; c++) {
            if (cf[c] == 0) continue;
            const double y = (double)cf[c] * quant[c];
            const double* wr = wi + (size_t)c * k;
            for (int t = 0; t < k; t++) {
                const double p = y * wr[t];
                acc[t] += p;
            }
        }
        const int64_t px0 = (n / wb) * (int64_t)block_size * w
                            + (n % wb) * block_size;
        uint8_t* base = out + px0;
        const uint8_t* pbase = pred + px0;
        for (int r = 0; r < block_size; r++) {
            uint8_t* orow = base + (int64_t)r * w;
            const uint8_t* prow = pbase + (int64_t)r * w;
            const double* yr = acc + r * block_size;
            for (int c2 = 0; c2 < block_size; c2++) {
                const double e = yr[c2] + 128.0;
                double pv = (double)prow[c2] + e;
                pv = pv < 0.0 ? 0.0 : (pv > 255.0 ? 255.0 : pv);
                orow[c2] = (uint8_t)pv;
            }
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return 0;
}

// Wire-encode quantized zig-zag blocks in ONE pass: per-block RLE stats
// (Block.cpp:186-232 incl. the trailing-strip quirk and the ffs(0)->1
// clamp), field emission ([4-bit width][width-bit count if rle][payload])
// and bit packing (Block.cpp:372-413).  Chunk-parallel like
// huffman_pack_bytes: pass A computes per-block stats + chunk bit totals,
// pass B streams fields through a 64-bit accumulator; the two shared
// boundary bytes per chunk are atomic-ORs (zeroed up front via
// zero_merge_bytes, so `out` may be uninitialized past the pre-placed
// header prefix); returns total bits or -1.
int64_t encode_pack_blocks(const int32_t* coeffs, int64_t n_blocks, int k,
                           int use_rle, int64_t start_bit, uint8_t* out,
                           int64_t out_cap) {
    if (k <= 0 || k > 32767) return -1;
    int n_chunks = 1;
    #ifdef _OPENMP
    if (n_blocks > 4096) n_chunks = omp_get_max_threads();
    #endif
    const int64_t per = (n_blocks + n_chunks - 1) / n_chunks;
    std::vector<int64_t> cstart((size_t)n_chunks + 1);
    // Single pass over the coefficients: stats + record emit into a
    // chunk-local buffer per block (one read of coeffs instead of two),
    // then bit-splice each chunk to its prefix offset.
    std::vector<std::unique_ptr<uint8_t[]>> cbuf((size_t)n_chunks);
    const int64_t cap_bytes = (per * (4 + 33 + (int64_t)k * 33) + 7) / 8 + 16;

    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int ci = 0; ci < n_chunks; ci++) {
        TSAN_HB_ACQUIRE();
        const int64_t lo = (int64_t)ci * per;
        const int64_t hi = lo + per < n_blocks ? lo + per : n_blocks;
        int64_t bits = 0;
        uint8_t* lb = nullptr;
        if (lo < hi) {
            cbuf[(size_t)ci].reset(new uint8_t[(size_t)cap_bytes]);
            lb = cbuf[(size_t)ci].get();
        }
        BitEmitter em(lb, 0, /*exclusive=*/true);
        for (int64_t nb = lo; nb < hi; nb++)
            bits += emit_block_one(coeffs + nb * k, k, use_rle, em);
        if (lb) em.flush();
        cstart[(size_t)ci + 1] = bits;
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    cstart[0] = start_bit;
    for (int ci = 0; ci < n_chunks; ci++)
        cstart[(size_t)ci + 1] += cstart[(size_t)ci];
    const int64_t total = cstart[(size_t)n_chunks];
    if ((total + 7) / 8 > out_cap) return -1;
    zero_merge_bytes(out, cstart.data(), n_chunks + 1);

    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int ci = 0; ci < n_chunks; ci++) {
        TSAN_HB_ACQUIRE();
        if (cbuf[(size_t)ci])
            bit_splice(out, cstart[(size_t)ci], cbuf[(size_t)ci].get(),
                       cstart[(size_t)ci + 1] - cstart[(size_t)ci]);
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return total;
}

// One-pass native FRAME encode (the video back end, Frame.cpp:160-243):
// per 4x4 block, residual/pixel read straight from the [h, w] images
// (no blockified f64 intermediates), exact-order f64 DCT + quantize +
// zig-zag (dct_quantize_exact semantics), RLE stats, then motion-vector
// fields (x, y per MacroBlock, Block.cpp:416-423) followed by the
// chunk-parallel block-record emit, all at bit offset `start_bit` of the
// shared stream buffer (uninitialized OK — merge-target bytes are zeroed
// up front, every other touched byte is plain-stored).  With `recon`
// non-null the
// reconstruction (pred + dequantized residual, clamped — the encoder's own
// decode, ImageBase.cpp:266-306) is also produced for the next P-frame's
// reference.  pred == null encodes an I-frame (no mvecs, pixels direct).
// Returns the new total bit position, or -1 on capacity error.
int64_t encode_frame_pack(const uint8_t* cur, const uint8_t* pred,
                          int64_t h, int64_t w, int block_size,
                          const double* wf, const double* scale,
                          const double* quant, const int32_t* zz,
                          int use_rle, const int32_t* mvec, int64_t n_macro,
                          int mvec_bits, const double* wi, uint8_t* recon,
                          int64_t start_bit, uint8_t* out, int64_t out_cap) {
    const int k = block_size * block_size;
    if (k > 256 || w % block_size || h % block_size) return -1;
    const int64_t wb = w / block_size;
    const int64_t n_blocks = wb * (h / block_size);
    const bool want_recon = (recon && pred && wi);

    int n_chunks = 1;
    #ifdef _OPENMP
    if (n_blocks > 2048) n_chunks = omp_get_max_threads();
    #endif
    const int64_t per = (n_blocks + n_chunks - 1) / n_chunks;
    std::vector<int64_t> cstart((size_t)n_chunks + 1);

    // Two layouts (uninitialized scratch either way — std::vector would
    // memset ~60 MB of czz per ex4 frame that pass A fully overwrites):
    //  - recon path: per-block coefficients persist in czz for the
    //    reconstruction pass, records are emitted by a second sweep;
    //  - no-recon path (I-frames, images, raw-ref P-frames): SINGLE PASS —
    //    each block is stats'ed + emitted into a chunk-local bit buffer
    //    while its coefficients are cache-hot, then the chunk buffers are
    //    bit-spliced to their prefix offsets.  Skips ~2x n_blocks*k*4 B of
    //    scratch traffic (ex4: 117 MB -> 0, the pack half's memory wall).
    std::unique_ptr<int32_t[]> czz(
        want_recon ? new int32_t[(size_t)n_blocks * k] : nullptr);
    std::unique_ptr<uint8_t[]> db(
        want_recon ? new uint8_t[(size_t)n_blocks] : nullptr);
    std::unique_ptr<int16_t[]> cntv(
        want_recon ? new int16_t[(size_t)n_blocks] : nullptr);
    std::unique_ptr<int16_t[]> npay(
        want_recon ? new int16_t[(size_t)n_blocks] : nullptr);
    std::vector<std::unique_ptr<uint8_t[]>> cbuf(
        want_recon ? 0 : (size_t)n_chunks);
    // Worst-case record: 4-bit width + width-bit count + k fields, each of
    // block_stats_one's honest int32 bound (<= 33 bits).
    const int64_t cap_bytes = (per * (4 + 33 + (int64_t)k * 33) + 7) / 8 + 16;

    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int ci = 0; ci < n_chunks; ci++) {
        TSAN_HB_ACQUIRE();
        const int64_t lo = (int64_t)ci * per;
        const int64_t hi = lo + per < n_blocks ? lo + per : n_blocks;
        int64_t bits = 0;
        double x[256], acc[256];
        int32_t local_row[256];
        uint8_t* lb = nullptr;
        if (!want_recon && lo < hi) {
            cbuf[(size_t)ci].reset(new uint8_t[(size_t)cap_bytes]);
            lb = cbuf[(size_t)ci].get();
        }
        BitEmitter em(lb, 0, /*exclusive=*/true);
#if defined(__AVX512F__)
        const int G = (k == 16) ? 8 : (k == 64 ? 2 : 1);
        alignas(64) double xq[8 * 16 > 4 * 64 ? 8 * 16 : 4 * 64];
        int32_t rowq[4 * 64];
#else
        const int G = 1;
#endif
        for (int64_t nb0 = lo; nb0 < hi; ) {
            const int gn = (int)(hi - nb0 < G ? hi - nb0 : G);
#if defined(__AVX512F__)
            if (G > 1) {
                // Interleaved group: load gn blocks' (residual) pixels
                // with the -128 bias (SUBTRACT_128, Block.cpp:139-153;
                // cur - pred is integer-exact in f64), transform together
                // (dctk_quant_avx512_nb: shared weight loads, independent
                // accumulator chains), then stats/emit per block.
                for (int b = 0; b < gn; b++) {
                    const int64_t nb = nb0 + b;
                    const int64_t by = (nb / wb) * block_size;
                    const int64_t bx = (nb % wb) * block_size;
                    const uint8_t* cb = cur + by * w + bx;
                    double* xd = xq + (size_t)b * k;
                    if (pred) {
                        const uint8_t* pb = pred + by * w + bx;
                        for (int r = 0; r < block_size; r++)
                            for (int c2 = 0; c2 < block_size; c2++)
                                xd[r * block_size + c2] =
                                    ((double)cb[(int64_t)r * w + c2]
                                     - (double)pb[(int64_t)r * w + c2])
                                    - 128.0;
                    } else {
                        for (int r = 0; r < block_size; r++)
                            for (int c2 = 0; c2 < block_size; c2++)
                                xd[r * block_size + c2] =
                                    (double)cb[(int64_t)r * w + c2] - 128.0;
                    }
                }
                int32_t* rows = want_recon ? czz.get() + (size_t)nb0 * k
                                           : rowq;
                if (gn == 8 && k == 16)
                    dctk_quant_avx512_nb<16, 8>(xq, wf, scale, quant, zz,
                                                rows);
                else if (gn == 4 && k == 16)
                    dctk_quant_avx512_nb<16, 4>(xq, wf, scale, quant, zz,
                                                rows);
                else if (gn == 2 && k == 64)
                    dctk_quant_avx512_nb<64, 2>(xq, wf, scale, quant, zz,
                                                rows);
                else
                    for (int b = 0; b < gn; b++) {
                        if (k == 16)
                            dctk_quant_avx512<16>(xq + (size_t)b * k, wf,
                                                  scale, quant, zz,
                                                  rows + (size_t)b * k);
                        else
                            dctk_quant_avx512<64>(xq + (size_t)b * k, wf,
                                                  scale, quant, zz,
                                                  rows + (size_t)b * k);
                    }
                for (int b = 0; b < gn; b++) {
                    const int32_t* row = rows + (size_t)b * k;
                    if (want_recon)
                        bits += block_stats_any(
                            row, k, use_rle, &db[(size_t)(nb0 + b)],
                            &cntv[(size_t)(nb0 + b)],
                            &npay[(size_t)(nb0 + b)]);
                    else
                        bits += emit_block_one(row, k, use_rle, em);
                }
                nb0 += gn;
                continue;
            }
#endif
            const int64_t nb = nb0;
            const int64_t by = (nb / wb) * block_size;
            const int64_t bx = (nb % wb) * block_size;
            const uint8_t* cb = cur + by * w + bx;
            // Residual carries the same -128 bias as pixels (SUBTRACT_128,
            // Block.cpp:139-153); cur - pred is integer-exact in f64.
            if (pred) {
                const uint8_t* pb = pred + by * w + bx;
                for (int r = 0; r < block_size; r++)
                    for (int c2 = 0; c2 < block_size; c2++)
                        x[r * block_size + c2] =
                            ((double)cb[(int64_t)r * w + c2]
                             - (double)pb[(int64_t)r * w + c2]) - 128.0;
            } else {
                for (int r = 0; r < block_size; r++)
                    for (int c2 = 0; c2 < block_size; c2++)
                        x[r * block_size + c2] =
                            (double)cb[(int64_t)r * w + c2] - 128.0;
            }
            // Reference accumulation order (algo.cpp:309-331; no FMA —
            // built with -ffp-contract=off), then *scale, /quant,
            // trunc-based round-half-away (Block.cpp:148-153).
            int32_t* row = want_recon ? czz.get() + (size_t)nb * k
                                      : local_row;
            {
                for (int uv = 0; uv < k; uv++) acc[uv] = 0.0;
                for (int c2 = 0; c2 < k; c2++) {
                    const double xv = x[c2];
                    const double* wr = wf + (size_t)c2 * k;
                    for (int uv = 0; uv < k; uv++) {
                        const double t = xv * wr[uv];
                        acc[uv] += t;
                    }
                }
                for (int j = 0; j < k; j++) {
                    const int uv = zz[j];
                    const double y = acc[uv] * scale[uv];
                    const double z = y / quant[uv];
                    const double t = __builtin_trunc(z);
                    const double d = z - t;
                    row[j] = (int32_t)((d >= 0.5 || d <= -0.5)
                                       ? (z >= 0.0 ? t + 1.0 : t - 1.0) : t);
                }
            }
            if (want_recon)
                bits += block_stats_any(row, k, use_rle, &db[(size_t)nb],
                                        &cntv[(size_t)nb],
                                        &npay[(size_t)nb]);
            else
                bits += emit_block_one(row, k, use_rle, em);
            nb0 += 1;
        }
        if (!want_recon && lb) em.flush();
        cstart[(size_t)ci + 1] = bits;
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();

    const int64_t mv_bits =
        (pred && mvec) ? n_macro * 2 * (int64_t)mvec_bits : 0;
    cstart[0] = start_bit + mv_bits;
    for (int ci = 0; ci < n_chunks; ci++)
        cstart[(size_t)ci + 1] += cstart[(size_t)ci];
    const int64_t total = cstart[(size_t)n_chunks];
    if ((total + 7) / 8 > out_cap) return -1;
    {
        // Merge-target zeroing so `out` may be uninitialized: segment
        // edges are the mvec run (when present) plus every chunk boundary.
        std::vector<int64_t> bnds;
        bnds.reserve((size_t)n_chunks + 2);
        bnds.push_back(start_bit);
        for (int ci = 0; ci <= n_chunks; ci++)
            bnds.push_back(cstart[(size_t)ci]);
        zero_merge_bytes(out, bnds.data(), (int)bnds.size());
    }

    if (mv_bits) {  // all mvecs precede the residual blocks (Frame.cpp:229)
        BitEmitter em(out, start_bit);
        for (int64_t m2 = 0; m2 < n_macro; m2++) {
            em.put(mvec_bits, (uint64_t)(int64_t)mvec[2 * m2]);
            em.put(mvec_bits, (uint64_t)(int64_t)mvec[2 * m2 + 1]);
        }
        em.flush();
    }

    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int ci = 0; ci < n_chunks; ci++) {
        TSAN_HB_ACQUIRE();
        if (want_recon) {
            const int64_t lo = (int64_t)ci * per;
            const int64_t hi = lo + per < n_blocks ? lo + per : n_blocks;
            emit_block_range(czz.get(), lo, hi, k, use_rle, db.get(),
                             cntv.get(), npay.get(), cstart[(size_t)ci],
                             out);
        } else if (cbuf[(size_t)ci]) {
            bit_splice(out, cstart[(size_t)ci], cbuf[(size_t)ci].get(),
                       cstart[(size_t)ci + 1] - cstart[(size_t)ci]);
        }
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();

    if (want_recon) {
        if (idct_recon_exact(czz.get(), n_blocks, block_size, zz, wi,
                             quant, pred, h, w, recon) < 0) return -1;
    }
    return total;
}

// Huffman-encode payload bytes through a 256-entry (code, len <= 15) LUT
// into `out` starting at bit `start_bit` (the serialized dict, already
// written by the caller; the rest of `out` may be uninitialized).
// Chunk-parallel:
// per-chunk bit offsets come from a lens-LUT prefix pass; interior bytes
// are exclusively owned, the two shared boundary bytes per chunk are
// atomic-ORs.  Returns total bits, or -1 if out_cap would be exceeded.
// (Serial analogue: the reference's per-byte re-encode loop,
// Huffman.cpp:314-319.)
int64_t huffman_pack_bytes(const uint8_t* data, int64_t n,
                           const uint32_t* code_words,
                           const uint8_t* code_lens, int64_t start_bit,
                           uint8_t* out, int64_t out_cap) {
    int n_chunks = 1;
    #ifdef _OPENMP
    if (n > 65536) n_chunks = omp_get_max_threads();
    #endif
    const int64_t per = (n + n_chunks - 1) / n_chunks;
    std::vector<int64_t> cstart((size_t)n_chunks + 1);
    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int ci = 0; ci < n_chunks; ci++) {
        TSAN_HB_ACQUIRE();
        const int64_t lo = (int64_t)ci * per;
        const int64_t hi = lo + per < n ? lo + per : n;
        int64_t bits = 0;
        for (int64_t i = lo; i < hi; i++) bits += code_lens[data[i]];
        cstart[(size_t)ci + 1] = bits;
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    cstart[0] = start_bit;
    for (int ci = 0; ci < n_chunks; ci++)
        cstart[(size_t)ci + 1] += cstart[(size_t)ci];
    const int64_t total = cstart[(size_t)n_chunks];
    if ((total + 7) / 8 > out_cap) return -1;
    zero_merge_bytes(out, cstart.data(), n_chunks + 1);

    TSAN_HB_RELEASE();
    #ifdef _OPENMP
    #pragma omp parallel for schedule(static)
    #endif
    for (int ci = 0; ci < n_chunks; ci++) {
        TSAN_HB_ACQUIRE();
        const int64_t lo = (int64_t)ci * per;
        const int64_t hi = lo + per < n ? lo + per : n;
        BitEmitter em(out, cstart[(size_t)ci]);
        int64_t i = lo;
        for (; i + 1 < hi; i += 2) {
            const uint8_t b0 = data[i], b1 = data[i + 1];
            em.put2(code_lens[b0], code_words[b0],
                    code_lens[b1], code_words[b1]);
        }
        if (i < hi) {
            const uint8_t b = data[i];
            em.put(code_lens[b], code_words[b]);
        }
        em.flush();
        TSAN_HB_RELEASE();
    }
    TSAN_HB_ACQUIRE();
    return total;
}

int64_t pack_fields(const int64_t* values, const int32_t* nbits, int64_t m,
                    uint8_t* out, int64_t out_cap) {
#ifdef _OPENMP
    if (m > 65536) {
        // Chunk-parallel accumulator pack: per-chunk bit totals (parallel
        // reduce) -> chunk start bits -> each chunk streams its fields
        // through a 64-bit accumulator.  Interior bytes are exclusively
        // owned; only a chunk's first and last (partial) bytes are shared
        // with its neighbors and merged with atomic ORs.  Replaces the
        // round-2 design (a full per-field offset array + per-field
        // byte-granular atomic loop).
        const int n_chunks = omp_get_max_threads();
        const int64_t per = (m + n_chunks - 1) / n_chunks;
        std::vector<int64_t> cstart((size_t)n_chunks + 1);
        TSAN_HB_RELEASE();
        #pragma omp parallel for schedule(static)
        for (int ci = 0; ci < n_chunks; ci++) {
            TSAN_HB_ACQUIRE();
            const int64_t lo = (int64_t)ci * per;
            const int64_t hi = lo + per < m ? lo + per : m;
            int64_t bits = 0;
            for (int64_t i = lo; i < hi; i++) bits += nbits[i];
            cstart[(size_t)ci + 1] = bits;
            TSAN_HB_RELEASE();
        }
        TSAN_HB_ACQUIRE();
        cstart[0] = 0;
        for (int ci = 0; ci < n_chunks; ci++)
            cstart[(size_t)ci + 1] += cstart[(size_t)ci];
        if ((cstart[(size_t)n_chunks] + 7) / 8 > out_cap) return -1;
        zero_merge_bytes(out, cstart.data(), n_chunks + 1);

        TSAN_HB_RELEASE();
        #pragma omp parallel for schedule(static)
        for (int ci = 0; ci < n_chunks; ci++) {
            TSAN_HB_ACQUIRE();
            const int64_t lo = (int64_t)ci * per;
            const int64_t hi = lo + per < m ? lo + per : m;
            BitEmitter em(out, cstart[(size_t)ci]);
            for (int64_t i = lo; i < hi; i++) {
                int b = nbits[i];
                if (b == 0) continue;
                const uint64_t v = (uint64_t)values[i]
                    & ((b >= 64) ? ~0ull : ((1ull << b) - 1));
                while (b > 0) {
                    const int take = b > 32 ? 32 : b;
                    em.put(take, v >> (b - take));
                    b -= take;
                }
            }
            em.flush();
            TSAN_HB_RELEASE();
        }
        TSAN_HB_ACQUIRE();
        return 0;
    }
#endif
    uint64_t acc = 0;  // bit accumulator, MSB-aligned fill
    int na = 0;        // bits in accumulator
    int64_t byte_pos = 0;
    for (int64_t i = 0; i < m; i++) {
        const int b = nbits[i];
        if (b == 0) continue;
        const uint64_t v = (uint64_t)values[i] & ((b >= 64) ? ~0ull : ((1ull << b) - 1));
        acc = (acc << b) | v;
        na += b;
        while (na >= 8) {
            if (byte_pos >= out_cap) return -1;
            out[byte_pos++] = (uint8_t)(acc >> (na - 8));
            na -= 8;
        }
    }
    if (na > 0) {
        if (byte_pos >= out_cap) return -1;
        out[byte_pos++] = (uint8_t)((acc << (8 - na)) & 0xFF);
    }
    return 0;
}

}  // extern "C"

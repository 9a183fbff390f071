// Sanitizer driver for the native runtime: exercises every
// concurrency-bearing entry point with synthetic-but-valid data and
// cross-checks outputs, so TSAN/ASAN instrumented builds
// (runtime/build.py::build_sanitized) can vet the OpenMP chunk-parallel
// packers' shared-boundary atomic ORs, the speculative-emit Huffman FSM,
// and the std::thread decode pipeline — the native analogue of the
// reference's Valgrind fix (BitStream.cpp:16-19).
//
// Build (tests/test_sanitizers.py drives this):
//   g++ -O1 -g -std=c++17 -fopenmp -fsanitize=thread \
//       imageencoder_tpu/runtime/native/runtime.cpp \
//       tools/sanitize_drive.cpp -o /tmp/ier_drive_tsan
//
// Pure C++ — running Python/numpy under TSAN is 100x slow and noisy.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
int64_t encode_pack_blocks(const int32_t*, int64_t, int, int, int64_t,
                           uint8_t*, int64_t);
int64_t encode_frame_pack(const uint8_t*, const uint8_t*, int64_t, int64_t,
                          int, const double*, const double*, const double*,
                          const int32_t*, int, const int32_t*, int64_t, int,
                          const double*, uint8_t*, int64_t, uint8_t*,
                          int64_t);
int64_t pack_fields(const int64_t*, const int32_t*, int64_t, uint8_t*,
                    int64_t);
int64_t huffman_pack_bytes(const uint8_t*, int64_t, const uint32_t*,
                           const uint8_t*, int64_t, uint8_t*, int64_t);
int64_t huffman_fsm_decode(const uint8_t*, int64_t, int64_t, const int32_t*,
                           const int32_t*, const int32_t*, int, uint8_t*,
                           int64_t);
int64_t walk_offsets(const uint8_t*, int64_t, int64_t, int64_t, int, int,
                     int64_t*, int32_t*, int32_t*);
int64_t decode_to_image_exact(const uint8_t*, int64_t, const int64_t*,
                              const int32_t*, const int32_t*, int64_t,
                              const int32_t*, int, const double*,
                              const double*, int64_t, int64_t, uint8_t*);
int64_t decode_image_pipelined(const uint8_t*, int64_t, int64_t,
                               const int32_t*, const int32_t*,
                               const int32_t*, int, int64_t, int64_t, int,
                               int, const int32_t*, const double*,
                               const double*, const float*, const float*,
                               int, int64_t, int64_t, uint8_t*);
int64_t find_motion(const uint8_t*, const uint8_t*, int64_t, int64_t,
                    const int32_t*, int, int32_t*);
int64_t predict_frame(const uint8_t*, int64_t, int64_t, const int32_t*,
                      uint8_t*);
int64_t byte_histogram(const uint8_t*, int64_t, int64_t*);
}

static uint32_t lcg_state = 12345;
static uint32_t lcg() {
    lcg_state = lcg_state * 1664525u + 1013904223u;
    return lcg_state >> 8;
}

#define CHECK(cond)                                                         \
    do {                                                                    \
        if (!(cond)) {                                                      \
            std::fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__,   \
                         __LINE__, #cond);                                  \
            return 1;                                                       \
        }                                                                   \
    } while (0)

int main() {
    const int64_t h = 1024, w = 4096, bs = 4, k = 16;
    const int64_t wb = w / bs, n_blocks = wb * (h / bs);

    // Synthetic quantized zig-zag coefficients: RLE-friendly heads.
    std::vector<int32_t> czz((size_t)n_blocks * k, 0);
    for (int64_t n = 0; n < n_blocks; n++) {
        const int cnt = 1 + (int)(lcg() % 8);
        for (int j = 0; j < cnt; j++)
            czz[(size_t)n * k + j] = (int32_t)(lcg() % 255) - 127;
    }

    std::fprintf(stderr, "step 1\n");
    // 1. Chunk-parallel one-pass block packer.
    const int64_t cap_bits = n_blocks * (4 + 17 * (k + 1)) + 64;
    std::vector<uint8_t> stream((size_t)(cap_bits + 7) / 8, 0);
    const int64_t total =
        encode_pack_blocks(czz.data(), n_blocks, (int)k, 1, 0,
                           stream.data(), (int64_t)stream.size());
    CHECK(total > 0);

    std::fprintf(stderr, "step 2\n");
    // 2. Serial walk + parallel fused exact decode.
    std::vector<int64_t> offs((size_t)n_blocks);
    std::vector<int32_t> dbv((size_t)n_blocks), cnv((size_t)n_blocks);
    const int64_t end = walk_offsets(stream.data(), (int64_t)stream.size(),
                                     0, n_blocks, 1, (int)bs, offs.data(),
                                     dbv.data(), cnv.data());
    CHECK(end == total);
    {
        // Adversarial walk: pseudorandom bytes parse as garbage records
        // (huge bogus counts) — exercises the speculative walkers'
        // restart/chain-segment paths and the serial-stitch fallback
        // under the sanitizers.
        std::vector<uint8_t> junk(1 << 21);
        uint32_t x = 0x9e3779b9u;
        for (auto& b : junk) { x ^= x << 13; x ^= x >> 17; x ^= x << 5; b = (uint8_t)x; }
        const int64_t jn = 50000;
        std::vector<int64_t> joffs((size_t)jn);
        std::vector<int32_t> jdb((size_t)jn), jcn((size_t)jn);
        CHECK(walk_offsets(junk.data(), (int64_t)junk.size(), 5, jn, 1,
                           (int)bs, joffs.data(), jdb.data(),
                           jcn.data()) >= 0);
    }
    double quant[16], wi[256];
    for (int i = 0; i < 16; i++) quant[i] = 1.0 + (i % 7);
    for (int i = 0; i < 256; i++) wi[i] = 0.01 * ((int)(i % 37) - 18);
    int32_t zz[16] = {0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15};
    std::vector<uint8_t> img_a((size_t)(h * w)), img_b((size_t)(h * w));
    CHECK(decode_to_image_exact(stream.data(), (int64_t)stream.size(),
                                offs.data(), dbv.data(), cnv.data(),
                                n_blocks, zz, (int)bs, quant, wi, h, w,
                                img_a.data()) == 0);

    std::fprintf(stderr, "step 3\n");
    // 3. std::thread pipelined decode, non-Huffman path (walk || extract).
    CHECK(decode_image_pipelined(stream.data(), (int64_t)stream.size(), 0,
                                 nullptr, nullptr, nullptr, 0, 0, n_blocks,
                                 1, (int)bs, zz, quant, wi, nullptr,
                                 nullptr, 1, h, w, img_b.data()) == 0);
    CHECK(std::memcmp(img_a.data(), img_b.data(), (size_t)(h * w)) == 0);

    std::fprintf(stderr, "step 4\n");
    // 4. Chunk-parallel Huffman byte pack (8-bit identity codes) + the
    //    speculative-emit parallel FSM decode, cross-checked.
    const int64_t sbytes = (total + 7) / 8;
    std::vector<uint32_t> cw(256);
    std::vector<uint8_t> cl(256, 8);
    for (int i = 0; i < 256; i++) cw[i] = (uint32_t)i;
    std::vector<uint8_t> huff((size_t)sbytes + 16, 0);
    CHECK(huffman_pack_bytes(stream.data(), sbytes, cw.data(), cl.data(), 0,
                             huff.data(), (int64_t)huff.size())
          == sbytes * 8);
    CHECK(std::memcmp(huff.data(), stream.data(), (size_t)sbytes) == 0);
    std::vector<int32_t> syms(256), words(256), lens(256, 8);
    for (int i = 0; i < 256; i++) { syms[i] = i; words[i] = i; }
    std::vector<uint8_t> fsm_out((size_t)sbytes + 16);
    CHECK(huffman_fsm_decode(huff.data(), sbytes, 0, syms.data(),
                             words.data(), lens.data(), 256, fsm_out.data(),
                             (int64_t)fsm_out.size()) == sbytes);
    CHECK(std::memcmp(fsm_out.data(), stream.data(), (size_t)sbytes) == 0);

    std::fprintf(stderr, "step 5\n");
    // 5. Pipelined decode through the FSM front (direct + speculative
    //    chunks, watermark walker, extract workers).
    std::fill(img_b.begin(), img_b.end(), 0);
    CHECK(decode_image_pipelined(huff.data(), sbytes, 0, syms.data(),
                                 words.data(), lens.data(), 256, 0,
                                 n_blocks, 1, (int)bs, zz, quant, wi,
                                 nullptr, nullptr, 1, h, w,
                                 img_b.data()) == 0);
    CHECK(std::memcmp(img_a.data(), img_b.data(), (size_t)(h * w)) == 0);

    std::fprintf(stderr, "step 6\n");
    // 6. Chunk-parallel field packer.
    const int64_t m = 300000;
    std::vector<int64_t> vals((size_t)m);
    std::vector<int32_t> nb((size_t)m);
    int64_t tb = 0;
    for (int64_t i = 0; i < m; i++) {
        nb[(size_t)i] = 1 + (int)(lcg() % 17);
        vals[(size_t)i] = (int64_t)lcg();
        tb += nb[(size_t)i];
    }
    std::vector<uint8_t> packed((size_t)(tb + 7) / 8 + 8, 0);
    CHECK(pack_fields(vals.data(), nb.data(), m, packed.data(),
                      (int64_t)packed.size()) == 0);

    std::fprintf(stderr, "step 7\n");
    // 7. Video: motion search + prediction + one-pass frame encoder
    //    (incl. the exact reconstruction), both I and P.
    const int64_t vh = 192, vw = 256;
    std::vector<uint8_t> cur((size_t)(vh * vw)), ref((size_t)(vh * vw));
    for (auto& p : ref) p = (uint8_t)lcg();
    for (int64_t i = 0; i < vh * vw; i++)
        cur[(size_t)i] = (uint8_t)(ref[(size_t)i] + (lcg() % 5));
    int32_t steps[4] = {8, 4, 2, 1};
    std::vector<int32_t> mv((size_t)(vh / 16) * (vw / 16) * 2);
    CHECK(find_motion(cur.data(), ref.data(), vh, vw, steps, 4,
                      mv.data()) == 0);
    std::vector<uint8_t> pred((size_t)(vh * vw));
    CHECK(predict_frame(ref.data(), vh, vw, mv.data(), pred.data()) == 0);
    double wf[256], scale[16];
    for (int i = 0; i < 256; i++) wf[i] = 0.02 * ((int)(i % 29) - 14);
    for (int i = 0; i < 16; i++) scale[i] = 0.25;
    std::vector<uint8_t> vstream((size_t)(vh * vw * 4), 0);
    std::vector<uint8_t> recon((size_t)(vh * vw));
    int64_t pos = encode_frame_pack(cur.data(), nullptr, vh, vw, (int)bs,
                                    wf, scale, quant, zz, 1, nullptr, 0, 0,
                                    nullptr, nullptr, 0, vstream.data(),
                                    (int64_t)vstream.size());
    CHECK(pos > 0);
    pos = encode_frame_pack(cur.data(), pred.data(), vh, vw, (int)bs, wf,
                            scale, quant, zz, 1, mv.data(),
                            (vh / 16) * (vw / 16), 5, wi, recon.data(), pos,
                            vstream.data(), (int64_t)vstream.size());
    CHECK(pos > 0);

    // 8. Parallel byte histogram vs a serial recount.
    int64_t hist[256], ser[256] = {0};
    CHECK(byte_histogram(stream.data(), sbytes, hist) == 0);
    for (int64_t i = 0; i < sbytes; i++) ser[stream[(size_t)i]]++;
    for (int v = 0; v < 256; v++) CHECK(hist[v] == ser[v]);

    std::printf("sanitize_drive: ok (%lld stream bits)\n",
                (long long)total);
    return 0;
}

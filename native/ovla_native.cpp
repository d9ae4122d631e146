// ovla_native: C++ host-runtime kernels for the TPU input pipeline.
//
// The reference framework's host-side native surface is PIL's C resample +
// torch's C++ collation (SURVEY.md §2: "native machinery" column). This
// library provides the equivalents for our pipeline, exposed through a plain
// C ABI consumed via ctypes (no pybind11 in the build image):
//
//   * resample_u8_exact — Pillow-bit-exact separable uint8 resample using the
//     same fixed-point scheme (coefficients pre-quantized to 1/2^22 by the
//     Python side; accumulation in int64, clip8((acc + 2^21) >> 22)).
//   * pad_stack_i64    — right-pad + stack token id rows (collator hot loop).
//   * stack_u8         — contiguous uint8 image batch assembly.
//
// Build: `make -C native` (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

static inline uint8_t clip8(int64_t acc, int precision_bits) {
    const int64_t half = 1LL << (precision_bits - 1);
    int64_t v = (acc + half) >> precision_bits;
    if (v < 0) return 0;
    if (v > 255) return 255;
    return (uint8_t)v;
}

// Separable resample, horizontal pass then vertical pass (Pillow's order).
//
// wq_h: [ow, iw] int32 quantized weights (w * 2^precision_bits, rounded
//       half-away-from-zero) — dense matrices, zeros outside each window.
// wq_v: [oh, ih] likewise.
// src: [ih, iw, c] uint8; dst: [oh, ow, c] uint8; tmp: caller-allocated
//       [ih, ow, c] uint8 scratch.
void resample_u8_exact(
    const uint8_t* src, int ih, int iw, int c,
    uint8_t* dst, int oh, int ow,
    const int32_t* wq_h, const int32_t* wq_v,
    uint8_t* tmp, int precision_bits)
{
    // horizontal: [ih, iw, c] -> [ih, ow, c]
    for (int y = 0; y < ih; ++y) {
        const uint8_t* row = src + (size_t)y * iw * c;
        uint8_t* orow = tmp + (size_t)y * ow * c;
        for (int x = 0; x < ow; ++x) {
            const int32_t* wrow = wq_h + (size_t)x * iw;
            for (int ch = 0; ch < c; ++ch) {
                int64_t acc = 0;
                for (int k = 0; k < iw; ++k) {
                    int32_t w = wrow[k];
                    if (w != 0) acc += (int64_t)w * row[(size_t)k * c + ch];
                }
                orow[(size_t)x * c + ch] = clip8(acc, precision_bits);
            }
        }
    }
    // vertical: [ih, ow, c] -> [oh, ow, c]
    for (int y = 0; y < oh; ++y) {
        const int32_t* wcol = wq_v + (size_t)y * ih;
        uint8_t* orow = dst + (size_t)y * ow * c;
        for (int x = 0; x < ow; ++x) {
            for (int ch = 0; ch < c; ++ch) {
                int64_t acc = 0;
                for (int k = 0; k < ih; ++k) {
                    int32_t w = wcol[k];
                    if (w != 0) acc += (int64_t)w * tmp[((size_t)k * ow + x) * c + ch];
                }
                orow[(size_t)x * c + ch] = clip8(acc, precision_bits);
            }
        }
    }
}

// Right-pad + stack n rows of int64 token ids into [n, length].
// rows: array of n pointers; lens: per-row lengths (truncated at length).
void pad_stack_i64(
    const int64_t** rows, const int64_t* lens, int n,
    int64_t length, int64_t fill, int64_t* out)
{
    for (int i = 0; i < n; ++i) {
        int64_t m = lens[i] < length ? lens[i] : length;
        std::memcpy(out + (size_t)i * length, rows[i], (size_t)m * sizeof(int64_t));
        for (int64_t j = m; j < length; ++j) out[(size_t)i * length + j] = fill;
    }
}

// Stack n equally-shaped uint8 buffers (images) contiguously.
void stack_u8(const uint8_t** srcs, int n, int64_t nbytes_each, uint8_t* out) {
    for (int i = 0; i < n; ++i) {
        std::memcpy(out + (size_t)i * nbytes_each, srcs[i], (size_t)nbytes_each);
    }
}

}  // extern "C"

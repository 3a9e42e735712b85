/*
 * Shim for building a SIMD (intrinsics) reference SvtAv1EncApp on a
 * host with no yasm/nasm: the 13 .asm files are assembled to empty
 * objects and the functions they would provide are supplied here —
 * either as plain-C ports of the trivial kernels (bilinear/8-tap
 * column filters, variance helpers) or as link-time aliases to the
 * reference's own C fallbacks (see tools/build_ref_simd.sh --defsym
 * list).  This binary is a SPEED baseline only; conformance checks
 * keep using the pristine COMPILE_C_ONLY oracle build.
 */
#include <stddef.h>
#include <stdint.h>

static inline uint8_t clip_u8(int v) {
    return v < 0 ? 0 : (v > 255 ? 255 : (uint8_t)v);
}

static inline int8_t pack_s8(int16_t v) {
    return v < -128 ? -128 : (v > 127 ? 127 : (int8_t)v);
}

/* bilinear column/row filters: taps filter[3], filter[4] packed to s8
 * (packsswb) then (a*f3 + b*f4 + 64) >> 7 (pmaddubsw + pmulhrsw with
 * 0x0100), matching aom_subpixel_bilinear_ssse3.asm */
static void bilinear_1d(const uint8_t *src, ptrdiff_t pitch, uint8_t *dst,
                        ptrdiff_t dst_pitch, uint32_t h, const int16_t *f,
                        int width, ptrdiff_t step) {
    int f3 = pack_s8(f[3]), f4 = pack_s8(f[4]);
    for (uint32_t r = 0; r < h; ++r) {
        for (int c = 0; c < width; ++c) {
            int v = src[c] * f3 + src[c + step] * f4;
            dst[c] = clip_u8((v + 64) >> 7);
        }
        src += pitch;
        dst += dst_pitch;
    }
}

#define BILINEAR(name, width, horiz)                                         \
    void name(const uint8_t *src_ptr, ptrdiff_t src_pitch,                   \
              uint8_t *output_ptr, ptrdiff_t out_pitch,                      \
              uint32_t output_height, const int16_t *filter) {               \
        bilinear_1d(src_ptr, src_pitch, output_ptr, out_pitch,               \
                    output_height, filter, width, horiz ? 1 : src_pitch);    \
    }

BILINEAR(svt_aom_filter_block1d4_h2_ssse3, 4, 1)
BILINEAR(svt_aom_filter_block1d8_h2_ssse3, 8, 1)
BILINEAR(svt_aom_filter_block1d16_h2_ssse3, 16, 1)
BILINEAR(svt_aom_filter_block1d4_v2_ssse3, 4, 0)
BILINEAR(svt_aom_filter_block1d8_v2_ssse3, 8, 0)
BILINEAR(svt_aom_filter_block1d16_v2_ssse3, 16, 0)

/* 8-tap vertical for width 4 (aom_subpixel_8t_sse2.asm) */
void svt_aom_filter_block1d4_v8_sse2(const uint8_t *src_ptr,
                                     ptrdiff_t src_pitch,
                                     uint8_t *output_ptr,
                                     ptrdiff_t out_pitch,
                                     uint32_t output_height,
                                     const int16_t *filter) {
    for (uint32_t r = 0; r < output_height; ++r) {
        for (int c = 0; c < 4; ++c) {
            int v = 0;
            for (int k = 0; k < 8; ++k)
                v += src_ptr[c + k * src_pitch] * filter[k];
            output_ptr[c] = clip_u8((v + 64) >> 7);
        }
        src_ptr += src_pitch;
        output_ptr += out_pitch;
    }
}

/* high-bitdepth block variance helpers (highbd_variance_impl_sse2.asm) */
#define HBD_VAR(name, n)                                                     \
    uint32_t name(const uint16_t *src, int32_t src_stride,                   \
                  const uint16_t *ref, int32_t ref_stride, uint32_t *sse,    \
                  int32_t *sum) {                                            \
        int64_t s = 0;                                                       \
        uint64_t e = 0;                                                      \
        for (int i = 0; i < n; ++i)                                          \
            for (int j = 0; j < n; ++j) {                                    \
                int d = src[i * src_stride + j] - ref[i * ref_stride + j];   \
                s += d;                                                      \
                e += (uint64_t)(d * d);                                      \
            }                                                                \
        *sum = (int32_t)s;                                                   \
        *sse = (uint32_t)e;                                                  \
        return *sse;                                                         \
    }

HBD_VAR(svt_aom_highbd_calc4x4var_sse2, 4)
HBD_VAR(svt_aom_highbd_calc8x8var_sse2, 8)
HBD_VAR(svt_aom_highbd_calc16x16var_sse2, 16)

/* BSR-style floor log2 (x86inc Log2f_ASM) */
uint32_t Log2f_ASM(uint32_t x) {
    return x <= 1 ? 0 : 31 - (uint32_t)__builtin_clz(x);
}

/* emms: only needed after MMX code, of which this build has none */
void RunEmms(void) {}

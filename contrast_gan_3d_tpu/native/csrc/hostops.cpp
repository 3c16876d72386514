// Native host-side data ops for the input pipeline.
//
// The reference outsources its host data path to native wheels
// (batchgenerators' C-backed numpy crops, SimpleITK's ITK C++ core —
// SURVEY.md §2). This library is the framework's own native runtime piece:
// zero-copy-ish patch cropping out of memory-mapped (W, H, D, C) int16
// patient arrays (the train-time hot path feeding the TPU) and a vectorized
// trilinear resampler (ostia-patch extraction during labeling). Bound via
// ctypes; built on demand with g++ -O3 (no pybind11 in the image).
//
// Layout contract: volumes are C-contiguous (W, H, D, C) int16 — a crop's
// innermost (z, c) extent is a single contiguous run, so each (x, y) pair
// costs one memcpy.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Copy a (px, py, pz, C) window starting at (sx, sy, sz) — which MAY be
// negative or overhang — from a (W, H, D, C) int16 volume into `out`,
// zero-filling voxels outside the volume. Returns copied voxel count.
long crop_pad_int16(
    const int16_t* __restrict src,
    long W, long H, long D, long C,
    long sx, long sy, long sz,
    long px, long py, long pz,
    int16_t* __restrict out)
{
    std::memset(out, 0, sizeof(int16_t) * px * py * pz * C);

    const long x_lo = std::max(sx, 0L), x_hi = std::min(sx + px, W);
    const long y_lo = std::max(sy, 0L), y_hi = std::min(sy + py, H);
    const long z_lo = std::max(sz, 0L), z_hi = std::min(sz + pz, D);
    if (x_lo >= x_hi || y_lo >= y_hi || z_lo >= z_hi) return 0;

    const long run = (z_hi - z_lo) * C;           // contiguous int16s per (x, y)
    const long src_y_stride = D * C;
    const long src_x_stride = H * D * C;
    const long out_y_stride = pz * C;
    const long out_x_stride = py * pz * C;

    for (long x = x_lo; x < x_hi; ++x) {
        const int16_t* sp = src + x * src_x_stride + y_lo * src_y_stride + z_lo * C;
        int16_t* op = out + (x - sx) * out_x_stride + (y_lo - sy) * out_y_stride
                      + (z_lo - sz) * C;
        for (long y = y_lo; y < y_hi; ++y) {
            std::memcpy(op, sp, sizeof(int16_t) * run);
            sp += src_y_stride;
            op += out_y_stride;
        }
    }
    return (x_hi - x_lo) * (y_hi - y_lo) * (z_hi - z_lo);
}

// Vectorized trilinear interpolation of a (W, H, D) float32 volume at n
// fractional coordinates, clamp-to-edge (reference fast_trilinear,
// geometry.py:30-58 semantics).
void trilinear_f32(
    const float* __restrict vol,
    long W, long H, long D,
    const float* __restrict xs,
    const float* __restrict ys,
    const float* __restrict zs,
    long n,
    float* __restrict out)
{
    const long sy = D, sx = H * D;
    for (long i = 0; i < n; ++i) {
        float xf = xs[i], yf = ys[i], zf = zs[i];
        // reference fast_trilinear semantics: base index TRUNCATES toward
        // zero (np .astype(int64)), the +1 neighbor is clipped independently
        // of the clipped base, and the fraction is taken against the clamped
        // base — exact even for deep out-of-range coordinates
        const long x0p = (long)xf, y0p = (long)yf, z0p = (long)zf;
        const long x0 = std::min(std::max(x0p, 0L), W - 1);
        const long y0 = std::min(std::max(y0p, 0L), H - 1);
        const long z0 = std::min(std::max(z0p, 0L), D - 1);
        const float fx = xf - x0, fy = yf - y0, fz = zf - z0;
        const long x1 = std::min(std::max(x0p + 1L, 0L), W - 1);
        const long y1 = std::min(std::max(y0p + 1L, 0L), H - 1);
        const long z1 = std::min(std::max(z0p + 1L, 0L), D - 1);

        const float c000 = vol[x0 * sx + y0 * sy + z0];
        const float c100 = vol[x1 * sx + y0 * sy + z0];
        const float c010 = vol[x0 * sx + y1 * sy + z0];
        const float c001 = vol[x0 * sx + y0 * sy + z1];
        const float c110 = vol[x1 * sx + y1 * sy + z0];
        const float c101 = vol[x1 * sx + y0 * sy + z1];
        const float c011 = vol[x0 * sx + y1 * sy + z1];
        const float c111 = vol[x1 * sx + y1 * sy + z1];

        const float gx = 1.0f - fx, gy = 1.0f - fy, gz = 1.0f - fz;
        out[i] = c000 * gx * gy * gz + c100 * fx * gy * gz
               + c010 * gx * fy * gz + c001 * gx * gy * fz
               + c110 * fx * fy * gz + c101 * fx * gy * fz
               + c011 * gx * fy * fz + c111 * fx * fy * fz;
    }
}

// Fused spatial-augmentation warp of one (W, H, D) int16 scan + mask pair:
//   src = A @ (dst - center) + center + amp * elastic(dst)
// where elastic(dst) upsamples a coarse (G, G, G, 3) noise field with the
// half-pixel convention of jax.image.resize(method="linear") — identical to
// the device augmenter. Scan is trilinearly resampled, mask
// nearest-neighbour (clamped edges). This replaces the device-side gather
// (TPUs are very slow at data-dependent gathers: measured 1.4 s for
// 8x128^3 on v5e) — it runs in the async host prefetch pipeline, fully
// overlapped with device compute.
//
// Performance structure (the train-time hot path on small hosts):
// - OpenMP slab-split over x (one patch warp scales across host cores;
//   additionally, whole patches parallelize across prefetch threads since
//   ctypes releases the GIL).
// - The coarse-field interpolation is separable: per-axis (cell, frac)
//   pairs are precomputed once, and per (x, y) the field collapses to G
//   xy-bilerped z-line values, so the inner z loop does 3 lerps instead of
//   a 24-load trilinear gather.
// - Affine coordinates accumulate incrementally along z (one FMA per axis).

long warp_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

void warp_augment_int16(
    const int16_t* __restrict scan,
    const int16_t* __restrict seg,
    long W, long H, long D,
    const float* __restrict affine,   // row-major 3x3
    const float* __restrict coarse,   // (G, G, G, 3) or NULL
    long G,
    const float* __restrict amp,      // (3,) elastic amplitude, voxels
    int16_t* __restrict out_scan,
    int16_t* __restrict out_seg)
{
    const float cx = (W - 1) * 0.5f, cy = (H - 1) * 0.5f, cz = (D - 1) * 0.5f;
    const long sy = D, sx = H * D;

    // per-axis half-pixel coarse-field cells and fractions:
    //   src = clamp((dst + 0.5) * G / dim - 0.5, 0, G - 1)
    std::vector<long> gxs, gys, gzs;
    std::vector<float> axs, ays, azs;
    if (coarse) {
        auto fill = [G](std::vector<long>& cells, std::vector<float>& fracs, long dim) {
            cells.resize(dim);
            fracs.resize(dim);
            const float scale = (float)G / (float)dim;
            for (long i = 0; i < dim; ++i) {
                float f = (i + 0.5f) * scale - 0.5f;
                f = std::min(std::max(f, 0.f), (float)(G - 1));
                long c = std::min(std::max((long)f, 0L), std::max(G - 2, 0L));
                cells[i] = c;
                fracs[i] = f - c;
            }
        };
        fill(gxs, axs, W);
        fill(gys, ays, H);
        fill(gzs, azs, D);
    }

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long x = 0; x < W; ++x) {
        const float rx = x - cx;
        // xy-bilerped coarse z-lines for the current (x, y): Ez[gz*3 + c]
        std::vector<float> Ez(coarse ? (size_t)G * 3 : 0);
        for (long y = 0; y < H; ++y) {
            const float ry = y - cy;
            // affine coords accumulate along z: p(z) = b + a_col2 * z
            const float bx = affine[0] * rx + affine[1] * ry + affine[2] * (0.f - cz) + cx;
            const float by = affine[3] * rx + affine[4] * ry + affine[5] * (0.f - cz) + cy;
            const float bz = affine[6] * rx + affine[7] * ry + affine[8] * (0.f - cz) + cz;

            if (coarse) {
                const long gx = gxs[x], gy = gys[y];
                const float ax = axs[x], ay = ays[y];
                const long gx1 = std::min(gx + 1, G - 1);
                const long gy1 = std::min(gy + 1, G - 1);
                const float w00 = (1 - ax) * (1 - ay), w10 = ax * (1 - ay);
                const float w01 = (1 - ax) * ay, w11 = ax * ay;
                const long gs = G * 3, gss = G * G * 3;
                const float* r00 = coarse + gx * gss + gy * gs;
                const float* r10 = coarse + gx1 * gss + gy * gs;
                const float* r01 = coarse + gx * gss + gy1 * gs;
                const float* r11 = coarse + gx1 * gss + gy1 * gs;
                for (long gz = 0; gz < G; ++gz)
                    for (int c = 0; c < 3; ++c)
                        Ez[gz * 3 + c] = w00 * r00[gz * 3 + c] + w10 * r10[gz * 3 + c]
                                       + w01 * r01[gz * 3 + c] + w11 * r11[gz * 3 + c];
            }

            int16_t* __restrict os = out_scan + x * sx + y * sy;
            int16_t* __restrict og = out_seg + x * sx + y * sy;
            for (long z = 0; z < D; ++z) {
                float xs = bx + affine[2] * z;
                float ys = by + affine[5] * z;
                float zs = bz + affine[8] * z;

                if (coarse) {
                    const long gz = gzs[z];
                    const float az = azs[z];
                    const float* e0 = &Ez[gz * 3];
                    const float* e1 = &Ez[std::min(gz + 1, G - 1) * 3];
                    xs += amp[0] * (e0[0] * (1 - az) + e1[0] * az);
                    ys += amp[1] * (e0[1] * (1 - az) + e1[1] * az);
                    zs += amp[2] * (e0[2] * (1 - az) + e1[2] * az);
                }

                // trilinear scan sample, clamped (fraction vs clamped floor)
                long x0 = (long)std::floor(xs), y0 = (long)std::floor(ys), z0 = (long)std::floor(zs);
                x0 = std::min(std::max(x0, 0L), W - 1);
                y0 = std::min(std::max(y0, 0L), H - 1);
                z0 = std::min(std::max(z0, 0L), D - 1);
                const float fxw = xs - x0, fyw = ys - y0, fzw = zs - z0;
                const long x1 = std::min(x0 + 1L, W - 1);
                const long y1 = std::min(y0 + 1L, H - 1);
                const long z1 = std::min(z0 + 1L, D - 1);
                const float gxw = 1.f - fxw, gyw = 1.f - fyw, gzw = 1.f - fzw;

                const int16_t* p00 = scan + x0 * sx + y0 * sy;
                const int16_t* p10 = scan + x1 * sx + y0 * sy;
                const int16_t* p01 = scan + x0 * sx + y1 * sy;
                const int16_t* p11 = scan + x1 * sx + y1 * sy;
                const float v =
                      p00[z0] * gxw * gyw * gzw
                    + p10[z0] * fxw * gyw * gzw
                    + p01[z0] * gxw * fyw * gzw
                    + p00[z1] * gxw * gyw * fzw
                    + p11[z0] * fxw * fyw * gzw
                    + p10[z1] * fxw * gyw * fzw
                    + p01[z1] * gxw * fyw * fzw
                    + p11[z1] * fxw * fyw * fzw;
                os[z] = (int16_t)std::floor(v + 0.5f);

                // nearest-neighbour mask sample
                long xn = (long)std::floor(xs + 0.5f);
                long yn = (long)std::floor(ys + 0.5f);
                long zn = (long)std::floor(zs + 0.5f);
                xn = std::min(std::max(xn, 0L), W - 1);
                yn = std::min(std::max(yn, 0L), H - 1);
                zn = std::min(std::max(zn, 0L), D - 1);
                og[z] = seg[xn * sx + yn * sy + zn];
            }
        }
    }
}

}  // extern "C"

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
        // clamp the floor FIRST, then take the fraction against the clamped
        // base (reference fast_trilinear / geometry.trilinear_interpolate
        // semantics for out-of-range coordinates)
        const long x0 = std::min(std::max((long)std::floor(xf), 0L), W - 1);
        const long y0 = std::min(std::max((long)std::floor(yf), 0L), H - 1);
        const long z0 = std::min(std::max((long)std::floor(zf), 0L), D - 1);
        const float fx = xf - x0, fy = yf - y0, fz = zf - z0;
        const long x1 = std::min(x0 + 1L, W - 1);
        const long y1 = std::min(y0 + 1L, H - 1);
        const long z1 = std::min(z0 + 1L, D - 1);

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
// where elastic(dst) trilinearly upsamples a coarse (G, G, G, 3) noise field
// on the fly. Scan is trilinearly resampled, mask nearest-neighbour (clamped
// edges). This replaces the device-side gather (TPUs are very slow at
// data-dependent gathers: measured 1.4 s for 8x128^3 on v5e) — it runs in
// the async host prefetch pipeline, fully overlapped with device compute.
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
    // half-pixel coarse-field upsampling — the exact convention of
    // jax.image.resize(method="linear"), so the host and device augmenters
    // produce IDENTICAL elastic displacement fields for the same noise:
    //   src = clamp((dst + 0.5) * G / W - 0.5, 0, G - 1)
    const float gsx = (float)G / (float)W;
    const float gsy = (float)G / (float)H;
    const float gsz = (float)G / (float)D;

    for (long x = 0; x < W; ++x) {
        const float rx = x - cx;
        for (long y = 0; y < H; ++y) {
            const float ry = y - cy;
            for (long z = 0; z < D; ++z) {
                const float rz = z - cz;
                float xs = affine[0] * rx + affine[1] * ry + affine[2] * rz + cx;
                float ys = affine[3] * rx + affine[4] * ry + affine[5] * rz + cy;
                float zs = affine[6] * rx + affine[7] * ry + affine[8] * rz + cz;

                if (coarse) {
                    // trilinear sample of the coarse field at (x, y, z),
                    // half-pixel mapping clamped to [0, G-1] (truncated
                    // edge kernels renormalize to exactly this)
                    float fx = (x + 0.5f) * gsx - 0.5f;
                    float fy = (y + 0.5f) * gsy - 0.5f;
                    float fz = (z + 0.5f) * gsz - 0.5f;
                    fx = std::min(std::max(fx, 0.f), (float)(G - 1));
                    fy = std::min(std::max(fy, 0.f), (float)(G - 1));
                    fz = std::min(std::max(fz, 0.f), (float)(G - 1));
                    long gx = std::min(std::max((long)fx, 0L), std::max(G - 2, 0L));
                    long gy = std::min(std::max((long)fy, 0L), std::max(G - 2, 0L));
                    long gz = std::min(std::max((long)fz, 0L), std::max(G - 2, 0L));
                    const long gx1 = std::min(gx + 1, G - 1);
                    const long gy1 = std::min(gy + 1, G - 1);
                    const long gz1 = std::min(gz + 1, G - 1);
                    const float ax = fx - gx, ay = fy - gy, az = fz - gz;
                    const long gs = G * 3, gss = G * G * 3;
                    for (int c = 0; c < 3; ++c) {
                        const float* f = coarse + c;
                        const float c00 = f[gx*gss + gy*gs + gz*3] * (1-ax) + f[gx1*gss + gy*gs + gz*3] * ax;
                        const float c10 = f[gx*gss + gy1*gs + gz*3] * (1-ax) + f[gx1*gss + gy1*gs + gz*3] * ax;
                        const float c01 = f[gx*gss + gy*gs + gz1*3] * (1-ax) + f[gx1*gss + gy*gs + gz1*3] * ax;
                        const float c11 = f[gx*gss + gy1*gs + gz1*3] * (1-ax) + f[gx1*gss + gy1*gs + gz1*3] * ax;
                        const float v = (c00 * (1-ay) + c10 * ay) * (1-az)
                                      + (c01 * (1-ay) + c11 * ay) * az;
                        if (c == 0) xs += v * amp[0];
                        else if (c == 1) ys += v * amp[1];
                        else zs += v * amp[2];
                    }
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

                const float v =
                      scan[x0*sx + y0*sy + z0] * gxw * gyw * gzw
                    + scan[x1*sx + y0*sy + z0] * fxw * gyw * gzw
                    + scan[x0*sx + y1*sy + z0] * gxw * fyw * gzw
                    + scan[x0*sx + y0*sy + z1] * gxw * gyw * fzw
                    + scan[x1*sx + y1*sy + z0] * fxw * fyw * gzw
                    + scan[x1*sx + y0*sy + z1] * fxw * gyw * fzw
                    + scan[x0*sx + y1*sy + z1] * gxw * fyw * fzw
                    + scan[x1*sx + y1*sy + z1] * fxw * fyw * fzw;
                out_scan[x*sx + y*sy + z] = (int16_t)std::lround(v);

                // nearest-neighbour mask sample
                long xn = (long)std::lround(xs), yn = (long)std::lround(ys), zn = (long)std::lround(zs);
                xn = std::min(std::max(xn, 0L), W - 1);
                yn = std::min(std::max(yn, 0L), H - 1);
                zn = std::min(std::max(zn, 0L), D - 1);
                out_seg[x*sx + y*sy + z] = seg[xn*sx + yn*sy + zn];
            }
        }
    }
}

}  // extern "C"

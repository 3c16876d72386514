"""Exactness of the block-space ("packed") conv pipeline (ops/packed.py)
against the direct lax convolutions, and of the packed generator layout
against the standard one. All on CPU f32 — pure layout transformations must
match to fp associativity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.ops.packed import (
    packed_conv3d,
    packed_tconv3d,
    reflect_pad_packed,
    transform_kernel_packed,
)
from contrast_gan_3d_tpu.ops.s2d_conv import (
    d2s_tconv3d,
    depth_to_space,
    space_to_depth,
)


def _direct_conv(x, w, stride, pad, mode="constant"):
    """Reference: torch-style conv with padding p per side."""
    if pad:
        x = jnp.pad(
            x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)),
            mode=("reflect" if mode == "reflect" else "constant"),
        )
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize(
    "k,stride,pad,f_in,f_out,ci,co,dim",
    [
        (3, 1, 1, 2, 2, 4, 8, 8),     # stem-like stride-1
        (7, 1, 3, 2, 2, 1, 16, 16),   # actual stem shape (small dims)
        (3, 2, 1, 2, 2, 4, 8, 16),    # down conv, packed out
        (3, 2, 1, 2, 1, 4, 8, 16),    # down conv, unpacked out
        (7, 1, 3, 2, 4, 16, 1, 16),   # projection: f2 in, f4 out
        (3, 1, 1, 4, 4, 2, 3, 8),     # f4 pipeline
        (3, 2, 1, 4, 2, 2, 3, 16),    # f4 in, f2 out, stride 2
    ],
)
def test_packed_conv_zero_pad(k, stride, pad, f_in, f_out, ci, co, dim):
    rng = np.random.default_rng(hash((k, stride, f_in, f_out, dim)) % 2**32)
    x = jnp.asarray(rng.standard_normal((2, dim, dim, dim, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, k, ci, co)), jnp.float32)

    ref = _direct_conv(x, w, stride, pad)
    out_dim = dim // stride
    xp = space_to_depth(x, f_in)
    got_p = packed_conv3d(
        xp, w, f_in=f_in, f_out=f_out, stride=stride, pad=pad,
        out_blocks=(out_dim // f_out,) * 3,
    )
    got = depth_to_space(got_p, f_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_packed_conv_bias():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    ref = _direct_conv(x, w, 1, 1) + b
    got = depth_to_space(
        packed_conv3d(
            space_to_depth(x, 2), w, b, f_in=2, f_out=2, stride=1, pad=1,
            out_blocks=(4, 4, 4),
        ),
        2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("f,p,dim", [(2, 3, 8), (2, 1, 8), (4, 3, 16), (2, 4, 12)])
def test_reflect_pad_packed(f, p, dim):
    """The packed reflect pad equals a full-resolution reflect pad of
    L*f = ceil(p/f)*f voxels (a superset of the requested p; the extra
    o = L*f - p leading positions are never read by the offset conv)."""
    rng = np.random.default_rng(f * 100 + p)
    x = jnp.asarray(rng.standard_normal((2, dim, dim, dim, 3)), jnp.float32)
    L = -(-p // f)
    ref = jnp.pad(
        x, ((0, 0), (L * f, L * f), (L * f, L * f), (L * f, L * f), (0, 0)),
        mode="reflect",
    )
    padded, o = reflect_pad_packed(space_to_depth(x, f), f, p)
    assert o == L * f - p
    got = depth_to_space(padded, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


@pytest.mark.parametrize("k,pad,f,ci,co,dim", [(7, 3, 2, 2, 3, 16), (7, 3, 4, 16, 1, 16)])
def test_packed_conv_reflect(k, pad, f, ci, co, dim):
    """Reflect-padded conv: reflect_pad_packed + offset conv == direct
    reflect conv (the generator's stem/projection pattern)."""
    rng = np.random.default_rng(k + f)
    x = jnp.asarray(rng.standard_normal((1, dim, dim, dim, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, k, ci, co)), jnp.float32)
    ref = _direct_conv(x, w, 1, pad, mode="reflect")
    xp, o = reflect_pad_packed(space_to_depth(x, f), f, pad)
    # f4 output for the projection case, else keep f
    f_out = 4 if co == 1 else f
    got_p = packed_conv3d(
        xp, w, f_in=f, f_out=f_out, stride=1, o=(o, o, o),
        out_blocks=(dim // f_out,) * 3,
    )
    got = depth_to_space(got_p, f_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("convention", ["same", "torch"])
def test_packed_tconv(convention):
    """packed_tconv3d (packed output kept) == d2s_tconv3d after unpacking."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    ref = d2s_tconv3d(x, w, b, stride=2, convention=convention)
    got = depth_to_space(
        packed_tconv3d(x, w, b, stride=2, convention=convention), 2
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_transform_kernel_packed_matches_s2d():
    """With f_in == f_out == f, stride 1, zero offset, the general transform
    reduces to ops/s2d_conv.transform_kernel."""
    from contrast_gan_3d_tpu.ops.s2d_conv import transform_kernel

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2, 4)), jnp.float32)
    a = transform_kernel_packed(w, 2, 2, 1, (0, 0, 0))
    b = transform_kernel(w, 2, 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_packed_generator_matches_direct():
    """The flagship generator in layout='packed' equals layout='direct' for
    the same variables (inference mode)."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen_d = ResnetGenerator()
    gen_p = ResnetGenerator(layout="packed")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 16, 16, 1)), jnp.float32
    )
    variables = gen_d.init(jax.random.key(0), x, train=False)
    ref = gen_d.apply(variables, x, train=False)
    got = gen_p.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_packed_generator_train_mode_stats():
    """Packed layout updates identical BatchNorm stats in train mode."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen_d = ResnetGenerator()
    gen_p = ResnetGenerator(layout="packed")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 16, 16, 16, 1)), jnp.float32
    )
    variables = gen_d.init(jax.random.key(0), x, train=False)
    ref, upd_d = gen_d.apply(variables, x, train=True, mutable=["batch_stats"])
    got, upd_p = gen_p.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        upd_d["batch_stats"],
        upd_p["batch_stats"],
    )


def test_packed_generator_torch_placement():
    """Packed layout honors tconv_placement='torch' (reference-checkpoint
    window) as well."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen_d = ResnetGenerator(tconv_placement="torch")
    gen_p = ResnetGenerator(tconv_placement="torch", layout="packed")
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 16, 16, 16, 1)), jnp.float32
    )
    variables = gen_d.init(jax.random.key(0), x, train=False)
    ref = gen_d.apply(variables, x, train=False)
    got = gen_p.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_packed_generator_grads_match():
    """Autodiff through the packed layout yields the same true-weight
    gradients as the direct layout."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen_d = ResnetGenerator()
    gen_p = ResnetGenerator(layout="packed")
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 16, 16, 16, 1)), jnp.float32
    )
    variables = gen_d.init(jax.random.key(0), x, train=False)

    def loss(params, gen):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        out, _ = gen.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out**2)

    g_d = jax.grad(loss)(variables["params"], gen_d)
    g_p = jax.grad(loss)(variables["params"], gen_p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-4
        ),
        g_d,
        g_p,
    )


def test_packed_input_output_roundtrip():
    """packed_input consumes an f2-packed patch; packed_output emits the f4
    attenuation — both must match the full-resolution direct forward."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen_d = ResnetGenerator()
    gen_pio = ResnetGenerator(layout="packed", packed_input=True, packed_output=True)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 16, 16, 16, 1)), jnp.float32
    )
    variables = gen_d.init(jax.random.key(0), x, train=False)
    ref = gen_d.apply(variables, x, train=False)
    got_p = gen_pio.apply(variables, space_to_depth(x, 2), train=False)
    assert got_p.shape == (2, 4, 4, 4, 64)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(got_p, 4)), np.asarray(ref), atol=2e-4
    )


def test_packed_corrector_matches_direct():
    """make_volume_corrector(packed_io=True) equals the direct corrector on a
    block-aligned volume (identical grid: stride already % 4)."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.ops.sliding_window import make_volume_corrector

    gen = ResnetGenerator()
    vol = jnp.asarray(
        np.random.default_rng(4).integers(-800, 600, (24, 20, 16)), jnp.float32
    )
    variables = gen.init(
        jax.random.key(1), jnp.zeros((1, 16, 16, 16, 1), jnp.float32), train=False
    )
    apply_d = lambda p: gen.apply(variables, p, train=False)
    gen_p = ResnetGenerator(layout="packed", packed_input=True, packed_output=True)
    apply_p = lambda p: gen_p.apply(variables, p, train=False)

    # overlap .5 -> stride 8 (already % 4): identical patch grids
    ref = make_volume_corrector(apply_d, patch_size=(16, 16, 16), overlap=0.5,
                                batch_size=2)(vol)
    got = make_volume_corrector(apply_p, patch_size=(16, 16, 16), overlap=0.5,
                                batch_size=2, packed_io=True)(vol)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_packed_corrector_unaligned_dims():
    """packed_io pads non-block-aligned volumes internally and crops back."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.ops.sliding_window import make_volume_corrector

    gen = ResnetGenerator()
    variables = gen.init(
        jax.random.key(1), jnp.zeros((1, 16, 16, 16, 1), jnp.float32), train=False
    )
    gen_p = ResnetGenerator(layout="packed", packed_input=True, packed_output=True)
    apply_p = lambda p: gen_p.apply(variables, p, train=False)

    vol = jnp.asarray(
        np.random.default_rng(5).integers(-800, 600, (22, 19, 14)), jnp.float32
    )
    out = make_volume_corrector(apply_p, patch_size=(16, 16, 16), overlap=0.25,
                                batch_size=2, packed_io=True)(vol)
    assert out.shape == (22, 19, 14)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("convention", ["same", "torch"])
def test_packed_tconv_f4(convention):
    """packed_tconv3d_f4 (f=4 output, no repack) == d2s_tconv3d + s2d(4)."""
    from contrast_gan_3d_tpu.ops.packed import packed_tconv3d_f4

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 5)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    ref = space_to_depth(d2s_tconv3d(x, w, b, stride=2, convention=convention), 4)
    got = packed_tconv3d_f4(x, w, b, stride=2, convention=convention)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_packed_generator_remat_matches():
    """remat=True over the packed stages: identical forward and gradients."""
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen_p = ResnetGenerator(layout="packed")
    gen_r = ResnetGenerator(layout="packed", remat=True)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((1, 16, 16, 16, 1)), jnp.float32
    )
    variables = gen_p.init(jax.random.key(0), x, train=False)

    def loss(params, gen):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        out, _ = gen.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out**2)

    g_p = jax.grad(loss)(variables["params"], gen_p)
    g_r = jax.grad(loss)(variables["params"], gen_r)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g_p,
        g_r,
    )


def test_reflect_pad_packed_too_few_blocks():
    """Slab construction needs L+1 blocks per axis — actionable error."""
    xp = jnp.zeros((1, 1, 4, 4, 8), jnp.float32)  # 1 block on axis 0, f=2
    with pytest.raises(ValueError, match="blocks"):
        reflect_pad_packed(xp, 2, 3)


def test_repack_roundtrip_matches_s2d():
    """repack/unpack_repack == direct space_to_depth factor change."""
    from contrast_gan_3d_tpu.ops.packed import repack, unpack_repack

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 3)), jnp.float32)
    f2 = space_to_depth(x, 2)
    f4 = space_to_depth(x, 4)
    assert jnp.array_equal(repack(f2, 2, 2, 3), f4)
    assert jnp.array_equal(unpack_repack(f4, 2, 2, 3), f2)


def test_corrector_rejects_preconfigured_packed_generator():
    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator

    gen = ResnetGenerator(layout="packed", packed_input=True, packed_output=True)
    v = ResnetGenerator().init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1), jnp.float32), train=False
    )
    with pytest.raises(ValueError, match="plain full-resolution"):
        CCTAContrastCorrector(gen, v["params"], v.get("batch_stats"),
                              inference_patch_size=(16, 16, 16))


def test_packed_io_rejects_extreme_overlap():
    from contrast_gan_3d_tpu.ops.sliding_window import make_volume_corrector

    with pytest.raises(ValueError, match="stride >= 4"):
        make_volume_corrector(lambda x: x, patch_size=(16, 16, 16),
                              overlap=0.9, packed_io=True)


def test_builder_generator_args_layout_override():
    from dataclasses import replace

    from contrast_gan_3d_tpu.experiments import load_config
    from contrast_gan_3d_tpu.experiments.builder import build

    cfg = load_config("basic_3d")
    cfg = replace(cfg, generator_args={**cfg.generator_args, "layout": "direct"})
    assert build(cfg).generator.layout == "direct"

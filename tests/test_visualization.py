"""Visualization smoke tests (reference capability: utils/visualization.py)."""

import numpy as np

from contrast_gan_3d_tpu.utils import visualization as viz


def test_plot_axial_slices(rng):
    vol = rng.normal(0, 300, (16, 16, 9)).astype(np.float32)
    mask = (rng.random((16, 16, 9)) < 0.05).astype(np.uint8)
    fig = viz.plot_axial_slices(vol, mask=mask, max_slices=4, title="t")
    assert fig.axes  # rendered something
    viz.close(fig)


def test_plot_attenuation_colormap(rng):
    vol = rng.normal(0, 0.3, (8, 8, 4)).astype(np.float32)
    fig = viz.plot_axial_slices(vol, cmap="RdBu", max_slices=4)
    viz.close(fig)


def test_three_views(rng):
    fig = viz.plot_three_views(rng.normal(0, 300, (12, 10, 8)))
    assert len(fig.axes) == 3
    viz.close(fig)


def test_gmm_fit_plot(rng):
    from contrast_gan_3d_tpu.data.labeling import gmm_grid_search

    vals = np.concatenate([rng.normal(100, 20, 200), rng.normal(420, 30, 200)])
    gmm = gmm_grid_search(vals, max_components=3, seed=0)
    fig = viz.plot_GMM_fit(vals, gmm)
    viz.close(fig)


def test_hu_shift_plot(rng):
    data = {
        "low": {"centerlines": rng.normal(250, 40, 500), "ostia": rng.normal(260, 30, 100)},
        "low-corrected": {"centerlines": rng.normal(400, 40, 500), "ostia": rng.normal(395, 30, 100)},
        "opt": {"centerlines": rng.normal(410, 35, 500), "ostia": rng.normal(400, 30, 100)},
    }
    fig = viz.hu_distribution_shift_plot(data, regions=("centerlines", "ostia"))
    viz.close(fig)


def test_get_medical_views_convention(rng):
    vol = rng.normal(0, 300, (6, 5, 4)).astype(np.float32)
    ax, sag, cor = viz.get_medical_views(vol, (2, 3, 1))
    # axial: transposed z-slice; sagittal/coronal transposed + flipped (LPS display)
    assert np.array_equal(ax, vol[..., 1].T)
    assert np.array_equal(sag, np.flip(vol[2, ...].T, 0))
    assert np.array_equal(cor, np.flip(vol[:, 3, :].T, 0))


def test_plot_ostium_patch(rng):
    patch = rng.normal(300, 100, (19, 19, 19)).astype(np.float32)
    fig = viz.plot_ostium_patch(patch, title="ostium")
    assert len(fig.axes) == 3
    viz.close(fig)
    import pytest

    with pytest.raises(ValueError):
        viz.plot_ostium_patch(patch, coords="center")


def test_subsample_voxels(rng):
    small = rng.normal(size=100)
    assert viz.subsample_voxels(small, max_size=200) is not None
    assert len(viz.subsample_voxels(small, max_size=200)) == 100  # untouched
    big = rng.normal(size=5000)
    sub = viz.subsample_voxels(big, max_size=500, rng=np.random.default_rng(0))
    assert len(sub) == 500
    assert np.isin(sub, big).all()


def test_plot_image_histogram(rng):
    imgs = [rng.normal(size=(8, 8)) for _ in range(3)]
    fig = viz.plot_image_histogram(imgs[0], (imgs[1], "titled"), imgs[2])
    # 2x2 grid for 3 images: one axis hidden
    assert sum(ax.get_visible() for ax in fig.axes) == 3
    viz.close(fig)


def test_plot_gmm_fitted_ostium_patch(rng):
    from sklearn.mixture import GaussianMixture

    vals = np.concatenate(
        [rng.normal(100, 30, 2000), rng.normal(420, 40, 2000)]
    ).reshape(-1, 1)
    gmm = GaussianMixture(2, random_state=0).fit(vals)
    patch = rng.normal(300, 150, (19, 19, 19)).astype(np.float32)
    fig = viz.plot_gmm_fitted_ostium_patch(patch, gmm, title="fit")
    assert len(fig.axes) == 4
    assert len(fig.axes[3].lines) == 3  # 2 components + cumulative
    viz.close(fig)


def test_plot_gmm_fitted_ostium_patch_many_components(rng):
    # 11 components exceeds matplotlib's C0..C9 cycle; must not crash
    from sklearn.mixture import GaussianMixture

    vals = rng.normal(300, 200, (600, 1))
    gmm = GaussianMixture(11, random_state=0, reg_covar=1.0).fit(vals)
    patch = rng.normal(300, 150, (9, 9, 9)).astype(np.float32)
    fig = viz.plot_gmm_fitted_ostium_patch(patch, gmm)
    assert len(fig.axes[3].lines) == 12
    viz.close(fig)


def test_plot_image_histogram_empty():
    import pytest

    with pytest.raises(ValueError):
        viz.plot_image_histogram()


def test_plot_hu_distributions(rng):
    fig = viz.plot_hu_distributions(
        rng.normal(250, 40, 3000),
        rng.normal(400, 40, 3000),
        rng.normal(410, 30, 3000),
        title="shift",
        max_voxels=1000,
    )
    assert fig.axes[0].get_legend() is not None
    viz.close(fig)


def test_plot_centerlines_3d(rng):
    pts = rng.normal(size=(500, 4))  # trailing radius column ignored
    fig = viz.plot_centerlines_3d(pts, downsample_factor=5, title="ctl", s=2)
    assert fig.axes[0].name == "3d"
    viz.close(fig)


def test_plot_mid_slice():
    """Reference plot_mid_slice (visualization.py:197-219): 3 center views +
    shape/middle suptitle; returns the axes."""
    import numpy as np

    from contrast_gan_3d_tpu.utils import visualization as viz

    vol = np.random.default_rng(0).integers(-1000, 1000, (12, 10, 8)).astype(np.int16)
    axes = viz.plot_mid_slice(vol, title="scan")
    flat = np.ravel(axes)
    assert len(flat) == 3
    assert flat[0].get_title() == "Axial"
    fig = flat[0].get_figure()
    assert "scan (12, 10, 8), middle: [6 5 4]" in fig._suptitle.get_text()
    viz.plt.close("all")

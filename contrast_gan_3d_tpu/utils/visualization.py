"""Plotting utilities (matplotlib; host-side, off the device path).

Capability parity with reference ``contrast_gan_3D/utils/visualization.py``:
axial-slice grids with HU colorbars (:67-96), centerline scatter overlays
(:99-129), the 3-view axial/sagittal/coronal display for LPS volumes
(:161-163), GMM-fit / ostia-patch diagnostics (:166-252) and the
HU-distribution-shift KDE figure (:255-347). All functions return the figure
so callers (threaded loggers, notebooks) control rendering/closing.
"""

from typing import Dict, Optional, Sequence, Tuple

import os
import sys

import matplotlib

# default to headless Agg, but NEVER override a backend the session already
# selected (a live pyplot import — e.g. notebook inline — or an explicit
# MPLBACKEND): the module docstring promises callers control rendering
if "matplotlib.pyplot" not in sys.modules and not os.environ.get("MPLBACKEND"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from contrast_gan_3d_tpu.constants import VMAX, VMIN


def close(fig):
    plt.close(fig)


def _slice_indices(depth: int, max_slices: int, rng=None) -> np.ndarray:
    if depth <= max_slices:
        return np.arange(depth)
    if rng is not None:
        return np.sort(rng.choice(depth, size=max_slices, replace=False))
    return np.linspace(0, depth - 1, max_slices).astype(int)


def plot_axial_slices(
    volume: np.ndarray,
    mask: Optional[np.ndarray] = None,
    cmap: str = "gray",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    max_slices: int = 64,
    title: Optional[str] = None,
    rng=None,
):
    """Grid of axial (z) slices of a (W, H, D) volume with one shared
    colorbar; optional centerline-mask scatter overlay (reference
    ``plot_axial_slices`` + ``plot_axial_centerlines``)."""
    volume = np.asarray(volume)
    if volume.ndim == 2:
        volume = volume[..., None]
    ids = _slice_indices(volume.shape[-1], max_slices, rng)
    n = len(ids)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    # default each limit independently: a caller-passed vmax must survive a
    # defaulted vmin (and vice versa), and a half-specified range must not
    # leave the other limit per-slice autoscaled under the shared colorbar
    if vmin is None or vmax is None:
        if cmap == "gray":
            d_vmin, d_vmax = VMIN, VMAX
        else:
            amax = float(np.abs(volume).max() or 1.0)
            d_vmin, d_vmax = -amax, amax
        vmin = d_vmin if vmin is None else vmin
        vmax = d_vmax if vmax is None else vmax

    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows), squeeze=False)
    im = None
    for ax, z in zip(axes.ravel(), ids):
        im = ax.imshow(volume[..., z].T, cmap=cmap, vmin=vmin, vmax=vmax, origin="lower")
        if mask is not None:
            ys, xs = np.nonzero(np.asarray(mask)[..., z].T)
            if len(xs):
                ax.scatter(xs, ys, s=2, c="red", alpha=0.8)
        ax.set_title(f"z={z}", fontsize=6)
    for ax in axes.ravel():
        ax.axis("off")
    if im is not None:
        fig.colorbar(im, ax=axes, shrink=0.8, label="HU")
    if title:
        fig.suptitle(title)
    return fig


def get_medical_views(scan: np.ndarray, xyz: np.ndarray):
    """Axial / sagittal / coronal 2-D views of an LPS (W, H, D) volume through
    voxel ``xyz``, in the reference's display convention (sagittal/coronal
    flipped vertically; reference ``visualization.py:159-163``)."""
    scan = np.asarray(scan)
    x, y, z = np.asarray(xyz).astype(int)
    return [
        scan[..., z].T,
        np.flip(scan[x, ...].T, 0),
        np.flip(scan[:, y, :].T, 0),
    ]


def _render_ostium_views(axes, ostium_patch: np.ndarray, coords, vmin, vmax):
    """Shared 3-view renderer for the ostium-patch figures: normalizes
    ``coords`` ("middle" or a voxel triple) and imshows the medical views
    onto the first three ``axes``. Returns the normalized coords."""
    ostium_patch = np.asarray(ostium_patch)
    if isinstance(coords, str):
        if coords != "middle":
            raise ValueError(f"coords must be a voxel triple or 'middle', got {coords!r}")
        coords = np.asarray(ostium_patch.shape) // 2
    for ax, view in zip(axes, get_medical_views(ostium_patch, coords)):
        ax.imshow(view, cmap="gray", vmin=vmin, vmax=vmax)
        ax.axis("off")
    return coords


def plot_ostium_patch(
    ostium_patch: np.ndarray,
    coords="middle",
    vmin: float = VMIN,
    vmax: float = VMAX,
    title: Optional[str] = None,
):
    """Three medical views through an extracted ostium patch (reference
    ``plot_ostium_patch``, ``visualization.py:166-192``); ``coords`` is a
    voxel triple or ``"middle"``. Returns the figure."""
    fig, axes = plt.subplots(1, 3, figsize=(7, 5))
    _render_ostium_views(axes, ostium_patch, coords, vmin, vmax)
    if title is not None:
        fig.suptitle(title)
    return fig


def plot_mid_slice(
    image: np.ndarray,
    axes=None,
    title: Optional[str] = None,
    vmin: float = VMIN,
    vmax: float = VMAX,
):
    """Axial/sagittal/coronal views through the volume CENTER (reference
    ``plot_mid_slice``, ``visualization.py:197-219``) with the shape+middle
    suptitle. Returns the axes array like the reference."""
    if axes is None:
        _, axes = plt.subplots(1, 3, figsize=(10, 5))
    image = np.asarray(image)
    if image.ndim != 3:
        raise ValueError(
            f"plot_mid_slice takes a (W, H, D) volume, got {image.shape} — "
            "for packed patients pass data[..., 0]"
        )
    middle = np.asarray(image.shape) // 2
    views = get_medical_views(image, middle)
    for ax, ax_title, view in zip(np.ravel(axes), ["Axial", "Sagittal", "Coronal"], views):
        ax.imshow(view, cmap="gray", vmin=vmin, vmax=vmax)
        ax.set_title(ax_title)
    full_title = f"{tuple(image.shape)}, middle: {middle}"
    if title is not None:
        full_title = f"{title} {full_title}"
    np.ravel(axes)[0].get_figure().suptitle(full_title)
    return axes


def subsample_voxels(values: np.ndarray, max_size: int = 100_000, rng=None) -> np.ndarray:
    """Cap a 1-D voxel-intensity sample for histogram/KDE rendering
    (reference ``downsampled_hist`` + ``utils.downsample``,
    ``visualization.py:255-265`` — random subsample without replacement)."""
    from contrast_gan_3d_tpu.utils import downsample

    values = np.asarray(values).ravel()
    if values.size <= max_size:
        return values
    return downsample(values, max_size, rng)


def plot_three_views(
    volume: np.ndarray,
    coords: Optional[np.ndarray] = None,
    cmap: str = "gray",
    vmin: float = VMIN,
    vmax: float = VMAX,
):
    """Axial / sagittal / coronal views of an LPS (W, H, D) volume through
    ``coords`` (defaults to the center; reference :161-163)."""
    volume = np.asarray(volume)
    x, y, z = (
        np.asarray(coords).astype(int)
        if coords is not None
        else np.asarray(volume.shape) // 2
    )
    views = [
        (volume[..., z].T, f"axial z={z}"),
        (volume[x, ...].T, f"sagittal x={x}"),
        (volume[:, y, :].T, f"coronal y={y}"),
    ]
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (img, name) in zip(axes, views):
        ax.imshow(img, cmap=cmap, vmin=vmin, vmax=vmax, origin="lower")
        ax.set_title(name)
        ax.axis("off")
    return fig


def plot_centerlines_3d(
    centerlines: np.ndarray,
    downsample_factor: int = 1,
    title: Optional[str] = None,
    figsize: Tuple[int, int] = (10, 10),
    **scatter_kwargs,
):
    """3D scatter of an (N, 3+) centerline point cloud (world or image
    coordinates; a trailing radius column is ignored — reference
    ``visualization.py:36-61``). Returns the figure."""
    pts = np.asarray(centerlines)[::downsample_factor, :3]
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], **scatter_kwargs)
    if title is not None:
        ax.set_title(title)
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    return fig


def plot_histogram(
    values: np.ndarray, bins: int = 100, title: Optional[str] = None, ax=None
):
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 4))
    else:
        fig = ax.figure
    ax.hist(np.asarray(values).ravel(), bins=bins)
    ax.set_xlabel("HU")
    if title:
        ax.set_title(title)
    return fig


def plot_image_histogram(
    *images,
    bins: int = 80,
    figsize: Tuple[int, int] = (10, 5),
    **hist_kwargs,
):
    """Grid of per-image intensity histograms; each positional argument is an
    array or an ``(array, title)`` pair (reference ``plot_image_histogram``,
    ``visualization.py:133-158``). Returns the figure."""
    n = len(images)
    if n == 0:
        raise ValueError("plot_image_histogram needs at least one image")
    rows = int(round(np.sqrt(n))) or 1
    cols = int(np.ceil(n / rows))
    fig, axes = plt.subplots(rows, cols, figsize=figsize, squeeze=False)
    for i, ax in enumerate(axes.ravel()):
        if i >= n:
            ax.set_visible(False)
            continue
        img = images[i]
        if isinstance(img, tuple) and len(img) == 2:
            img, title = img
            ax.set_title(title)
        ax.hist(np.asarray(img).ravel(), color="black", bins=bins, **hist_kwargs)
    return fig


def plot_gmm_fitted_ostium_patch(
    ostium_patch: np.ndarray,
    gmm,
    coords="middle",
    title: Optional[str] = None,
    hu_range: Tuple[float, float] = (-300, 900),
):
    """Three medical views of an ostium patch plus its HU histogram overlaid
    with the fitted GMM: one curve per component and the dashed cumulative
    density (reference ``plot_GMM_fitted_ostium_patch``,
    ``visualization.py:222-252``). ``gmm`` is a fitted
    ``sklearn.mixture.GaussianMixture`` over 1-D HU values (what
    ``data.labeling.gmm_grid_search`` returns). Returns the figure."""
    from scipy.stats import norm as _norm

    ostium_patch = np.asarray(ostium_patch)
    means = np.asarray(gmm.means_).ravel()
    # per-component variance for 1-D fits across covariance types:
    # full (n,1,1) / diag (n,1) / spherical (n,) / tied (1,1)
    cov = np.asarray(gmm.covariances_)
    if cov.size == 1:
        var = np.full(len(means), cov.ravel()[0])
    elif cov.size == len(means):
        var = cov.ravel()
    else:
        raise ValueError("expected a GMM fitted on 1-D (HU) values")
    stds = np.sqrt(var)
    weights = np.asarray(gmm.weights_).ravel()

    fig, axes = plt.subplots(1, 4, figsize=(10, 5))
    _render_ostium_views(axes[:3], ostium_patch, coords, VMIN, VMAX)
    ax = axes[3]
    ax.hist(ostium_patch.ravel(), density=True, color="black", bins=80)
    x = np.arange(hu_range[0], hu_range[1], 10)
    y = _norm.pdf(x[None], means[:, None], stds[:, None]) * weights[:, None]
    # the matplotlib property cycle only defines C0..C9: cycle component
    # colors and keep the cumulative curve a fixed distinct style
    ax.plot(x, y.sum(0), lw=3, c="black", ls="dashed")
    for i, yy in enumerate(y):
        ax.plot(x, yy, lw=3, c=f"C{i % 10}")
    if title is not None:
        fig.suptitle(title)
    return fig


def plot_hu_distributions(
    subopt: np.ndarray,
    corrected_subopt: np.ndarray,
    opt: np.ndarray,
    ax=None,
    title: Optional[str] = None,
    alpha: float = 0.6,
    max_voxels: int = 100_000,
    rng=None,
):
    """Single-axis density histogram + KDE of suboptimal vs corrected vs
    optimal HU samples (reference ``plot_HU_distributions``,
    ``visualization.py:268-290``); each series is subsampled to
    ``max_voxels`` first. Returns the figure."""
    import seaborn as sns

    if ax is None:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    rng = np.random.default_rng(0) if rng is None else rng
    series = [
        (subopt, "Suboptimal"),
        (corrected_subopt, "Corrected suboptimal"),
        (opt, "Optimal"),
    ]
    for vals, label in series:
        vals = subsample_voxels(np.asarray(vals), max_voxels, rng)
        sns.histplot(
            vals, label=label, ax=ax, stat="density", kde=True,
            edgecolor="none", alpha=alpha,
        )
    ax.legend()
    if title is not None:
        ax.set_title(title)
    return fig


def plot_GMM_fit(values: np.ndarray, gmm, bins: int = 80):
    """Histogram of ostium-patch HU values with the fitted GMM density
    overlaid (reference :166-252 diagnostics)."""
    values = np.asarray(values, dtype=np.float64).ravel()
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(values, bins=bins, density=True, alpha=0.6)
    xs = np.linspace(values.min(), values.max(), 512).reshape(-1, 1)
    dens = np.exp(gmm.score_samples(xs))
    ax.plot(xs.ravel(), dens, "r-", lw=2)
    for mu in np.asarray(gmm.means_).ravel():
        ax.axvline(mu, color="k", ls="--", lw=1)
    ax.set_xlabel("HU")
    ax.set_ylabel("density")
    return fig


def hu_distribution_shift_plot(
    voxels_by_scan_type: Dict[str, Dict[str, np.ndarray]],
    regions: Sequence[str] = ("centerlines", "ostia", "myocardium"),
    hu_range: Tuple[float, float] = (-200, 1000),
):
    """KDE comparison of HU distributions per region, original vs corrected
    vs optimal (reference ``HU_distribution_shift_plot``, :293-347).

    ``voxels_by_scan_type``: {series_name: {region: 1-D HU values}} — e.g.
    series "low", "low-corrected", "opt". Series larger than ``max_voxels``
    are randomly subsampled before the KDE (reference ``downsampled_hist``):
    myocardium masks reach 10^7 voxels and KDE cost is quadratic-ish in n.
    """
    import seaborn as sns

    rng = np.random.default_rng(0)
    max_voxels = 100_000
    fig, axes = plt.subplots(1, len(regions), figsize=(5 * len(regions), 4), squeeze=False)
    for ax, region in zip(axes.ravel(), regions):
        for series, by_region in voxels_by_scan_type.items():
            vals = np.asarray(by_region.get(region, []))
            if vals.size:
                vals = subsample_voxels(vals[np.isfinite(vals)], max_voxels, rng)
                # warn_singular off: tiny masks (2-voxel ostia) have zero
                # variance — normal at smoke scale, not worth a warning
                sns.kdeplot(vals, ax=ax, label=series, fill=False, warn_singular=False)
        ax.set_title(region)
        ax.set_xlim(*hu_range)
        ax.set_xlabel("HU")
        if ax.get_legend_handles_labels()[1]:  # degenerate series draw nothing
            ax.legend()
    return fig

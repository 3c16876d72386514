"""Interactive batch viewer (reference capability: the GUI BatchViewer of
notebooks/view_batches.py:37-64). Driven headlessly via synthetic matplotlib
key events — the same code path an interactive backend fires."""

import matplotlib
import numpy as np
import pytest

matplotlib.use("Agg", force=True)

from contrast_gan_3d_tpu.utils.batch_viewer import BatchViewer, view_batch


def _press(viewer, key):
    from matplotlib.backend_bases import KeyEvent

    KeyEvent("key_press_event", viewer.fig.canvas, key)._process()


@pytest.fixture
def batch(rng):
    data = rng.normal(0, 1, (3, 8, 6, 10)).astype(np.float32)
    seg = (rng.random((3, 8, 6, 10)) < 0.1).astype(np.float32)
    return data, seg


def test_viewer_scrolls_slices_and_samples(batch):
    data, seg = batch
    v = BatchViewer([data, seg], titles=["data", "seg"])
    assert v.n_samples == 3 and v.n_slices == 10
    assert v.slice == 5  # starts centered
    _press(v, "up")
    assert v.slice == 6
    _press(v, "pagedown")
    assert v.slice == 0  # clamped
    _press(v, "end")
    assert v.slice == 9
    _press(v, "up")
    assert v.slice == 9  # clamped at the top
    assert v.sample == 0
    _press(v, "right")
    assert v.sample == 1
    _press(v, "left")
    _press(v, "left")
    assert v.sample == 2  # wraps
    # the displayed image tracks (sample, slice) and is transposed (H up)
    shown = v._images[0].get_array()
    np.testing.assert_array_equal(shown, data[2, :, :, 9].T)
    v.close()


def test_viewer_accepts_single_volume_3d(batch):
    data, _ = batch
    v = BatchViewer([data[0]])  # (W,H,D) -> batch of one
    assert v.n_samples == 1 and v.n_slices == 10
    _press(v, "q")  # closes without error


def test_viewer_rejects_mismatched_shapes(batch):
    data, _ = batch
    with pytest.raises(ValueError, match="disagree"):
        BatchViewer([data, data[:, :, :, :5]])
    with pytest.raises(ValueError, match="expected"):
        BatchViewer([data[0, 0]])


def test_view_batch_refuses_headless_backend(batch):
    data, seg = batch
    with pytest.raises(RuntimeError, match="non-interactive"):
        view_batch(data, seg)

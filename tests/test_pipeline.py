"""Prefetch pipeline tests (reference capability: batchgenerators
NonDetMultiThreadedAugmenter lifecycle, trainer/utils.py:44-107)."""

import threading
import time

import numpy as np
import pytest

from contrast_gan_3d_tpu.data.pipeline import PrefetchLoader, create_loaders
from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler

from tests.synth import make_dataset

PATCH = (16, 16, 16)


def test_prefetch_loader_lifecycle(tmp_path, rng):
    fold = make_dataset(tmp_path, rng, n_per_label=1)
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(paths, PATCH, batch_size=2, rng=rng)
    loader = PrefetchLoader(sampler, num_threads=1, prefetch=2, to_device=False)
    loader.start()
    for _ in range(3):
        batch = next(loader)
        assert batch["data"].shape == (2, *PATCH)
        assert batch["data"].dtype == np.int16
        assert batch["seg"].shape == (2, *PATCH)
        assert set(np.unique(batch["seg"])) <= {0, 1}
    loader.stop()
    assert not loader._threads
    # restartable (reference augmenter restart semantics)
    loader.start()
    assert next(loader)["data"].shape == (2, *PATCH)
    loader.stop()


def test_2d_centerline_sampling_pads_small_scans(tmp_path, rng):
    """A scan smaller than the 2D patch must still emit full-size patches
    from the centerline-guided branch (the reference's branch skips
    pad_nd_image, CCTADataLoader.py:55-69 — a latent short-patch crash)."""
    fold = make_dataset(tmp_path, rng, n_per_label=1, shape=(10, 12, 8))
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(paths, (16, 16), batch_size=4, rng=rng)
    for _ in range(8):  # both branches fire at 50/50 across draws
        batch = sampler.next_batch()
        assert batch["data"].shape == (4, 16, 16)
        assert batch["seg"].shape == (4, 16, 16)


def test_finite_sampler_iteration_protocol(tmp_path, rng):
    """PEP 479: iterating a finite sampler ends cleanly at end-of-pass
    instead of raising 'generator raised StopIteration'."""
    fold = make_dataset(tmp_path, rng, n_per_label=1)
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(paths, PATCH, batch_size=2, rng=rng, infinite=False)
    batches = list(sampler)
    assert sum(len(b["name"]) for b in batches) == len(paths)


def test_create_loaders_per_scantype(tmp_path, rng):
    fold = make_dataset(tmp_path, rng, n_per_label=2)
    loaders = create_loaders(
        fold, PATCH, {0: 2, -1: 1, 1: 3}, rng, num_threads=1, to_device=False
    )
    assert set(loaders) == {0, -1, 1}
    try:
        assert next(loaders[0])["data"].shape[0] == 2
        assert next(loaders[-1])["data"].shape[0] == 1
        assert next(loaders[1])["data"].shape[0] == 3
    finally:
        for l in loaders.values():
            l.stop()


def test_loader_with_host_augmenter(tmp_path, rng):
    from contrast_gan_3d_tpu import native

    if not native.has_native():
        pytest.skip("no native lib")
    from contrast_gan_3d_tpu.data.augment import AugmentConfig
    from contrast_gan_3d_tpu.data.host_augment import HostAugmenter

    fold = make_dataset(tmp_path, rng, n_per_label=1)
    aug = HostAugmenter(
        AugmentConfig(p_elastic=1.0, p_scale=1.0, p_rotation=1.0, elastic_grid=4),
        np.random.default_rng(3),
    )
    loaders = create_loaders(
        fold, PATCH, {0: 1, -1: 1, 1: 1}, rng, num_threads=1,
        to_device=False, augmenter=aug,
    )
    try:
        batch = next(loaders[0])
        assert batch["data"].shape == (1, *PATCH)
        assert np.isfinite(batch["data"]).all()
        assert set(np.unique(batch["seg"])) <= {0, 1}
    finally:
        for l in loaders.values():
            l.stop()


def test_finite_sampler_single_epoch(tmp_path, rng):
    """infinite=False: one full pass over the patient list, then StopIteration
    (eval-style iteration)."""
    fold = make_dataset(tmp_path, rng, n_per_label=1)  # 3 patients
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(paths, PATCH, batch_size=3, rng=rng, infinite=False)
    batch = sampler.next_batch()
    assert batch["data"].shape[0] == 3
    with pytest.raises(StopIteration):
        sampler.next_batch()


def test_finite_sampler_short_final_batch(tmp_path, rng):
    """infinite=False with len(paths) % batch_size != 0: the trailing partial
    batch is returned short, so every patient appears exactly once."""
    fold = make_dataset(tmp_path, rng, n_per_label=1)  # 3 patients
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(paths, PATCH, batch_size=2, rng=rng, infinite=False)
    b1 = sampler.next_batch()
    b2 = sampler.next_batch()
    assert b1["data"].shape[0] == 2 and b2["data"].shape[0] == 1
    assert sorted(b1["path"] + b2["path"]) == sorted(paths)
    with pytest.raises(StopIteration):
        sampler.next_batch()


def test_prefetch_loader_finite_terminates(tmp_path, rng):
    """A finite sampler behind PrefetchLoader must terminate iteration (not
    hang): workers post sentinels and __next__ raises StopIteration."""
    fold = make_dataset(tmp_path, rng, n_per_label=1)
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(paths, PATCH, batch_size=2, rng=rng, infinite=False)
    loader = PrefetchLoader(sampler, num_threads=2, prefetch=2, to_device=False)
    seen = sum(b["data"].shape[0] for b in loader)
    assert seen == len(paths)
    loader.stop()


def test_prefetch_loader_exact_replay_across_queue(tmp_path, rng):
    """get_state points at the CONSUMER's position: batches prefetched into
    the queue but not yet served must be re-produced after a restore."""
    fold = make_dataset(tmp_path, rng, n_per_label=2)
    paths = [p for p, _ in fold]

    def mk():
        s = CCTAPatchSampler(paths, PATCH, batch_size=2,
                             rng=np.random.default_rng(7))
        return PrefetchLoader(s, num_threads=1, prefetch=3, to_device=False)

    loader = mk()
    loader.start()
    for _ in range(2):
        next(loader)  # consume 2; more batches sit prefetched in the queue
    state = loader.get_state()
    expected = [next(loader)["data"].copy() for _ in range(4)]
    loader.stop()

    resumed = mk()
    resumed.set_state(state)
    resumed.start()
    got = [next(resumed)["data"].copy() for _ in range(4)]
    resumed.stop()
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e, g)


def test_worker_failure_surfaces_not_hangs(tmp_path, rng):
    """A prefetch worker dying on a non-StopIteration exception (corrupt
    patient, failed warp) must surface the error to the consumer instead of
    leaving __next__ spinning on an empty queue forever."""
    from tests.synth import make_dataset

    from contrast_gan_3d_tpu.data.pipeline import PrefetchLoader
    from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler

    fold = make_dataset(tmp_path, rng, n_per_label=1, labels=(0,))
    sampler = CCTAPatchSampler(
        [p for p, _ in fold], (8, 8, 8), 2, rng=np.random.default_rng(0)
    )

    calls = {"n": 0}
    real = sampler.next_batch
    # __next__ surfaces worker errors EAGERLY (before draining queued
    # batches), so hold the failure back until batch 1 was consumed — else
    # a slow consumer sees the RuntimeError on its first next() already
    served_first = threading.Event()

    def flaky():
        calls["n"] += 1
        if calls["n"] >= 2:
            assert served_first.wait(timeout=30)
            raise ValueError("corrupt patient file")
        return real()

    sampler.next_batch = flaky
    loader = PrefetchLoader(sampler, num_threads=1, prefetch=1, to_device=False)
    loader.start()
    next(loader)  # first batch fine
    served_first.set()
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        for _ in range(5):
            next(loader)
    loader.stop()


def test_device_put_failure_surfaces_not_hangs(tmp_path, rng, monkeypatch):
    """device_put can fail in the worker too (HBM OOM, device lost): the
    error must surface to the consumer like a sampler failure, not hang."""
    import contrast_gan_3d_tpu.data.pipeline as pl

    fold = make_dataset(tmp_path, rng, n_per_label=1, labels=(0,))
    sampler = CCTAPatchSampler(
        [p for p, _ in fold], (8, 8, 8), 2, rng=np.random.default_rng(0)
    )

    def boom(x, *a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: out of HBM")

    monkeypatch.setattr(pl.jax, "device_put", boom)
    loader = PrefetchLoader(sampler, num_threads=1, prefetch=1, to_device=True)
    loader.start()
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        for _ in range(5):
            next(loader)
    loader.stop()


def test_trailing_batch_not_dropped_on_done_race(tmp_path, rng):
    """The exhaustion race: a finite worker posts its FINAL batch between
    __next__'s timed-out get() and the all-done check. The drain must serve
    that batch before declaring the pass exhausted (one-full-pass semantics
    must not drop the trailing batch). Exercised deterministically with a
    queue whose timed get always misses but whose drain holds the batch."""
    import queue as _q

    fold = make_dataset(tmp_path, rng, n_per_label=1, labels=(0,))
    sampler = CCTAPatchSampler(
        [p for p, _ in fold], (8, 8, 8), 1, rng=np.random.default_rng(0)
    )
    loader = PrefetchLoader(sampler, num_threads=1, prefetch=1, to_device=False)

    class RacyQueue:
        def __init__(self, item):
            self._item = item

        def get(self, timeout=None):
            raise _q.Empty  # the timed get that lost the race

        def get_nowait(self):
            if self._item is None:
                raise _q.Empty
            item, self._item = self._item, None
            return item

        def empty(self):
            return self._item is None

    batch = {"data": np.zeros((1, 8, 8, 8), np.int16)}
    loader._threads = [object()]  # worker finished: done count == threads
    loader._done_box = {"n": 1}
    loader._queue = RacyQueue((None, batch))
    assert next(loader) is batch
    with pytest.raises(StopIteration):
        next(loader)


def test_worker_error_not_swallowed_on_done_race(tmp_path, rng):
    """The failure twin of the trailing-batch race: a worker sets err_box +
    done count under the lock BEFORE its sentinel lands in the queue. If the
    consumer's timed get() misses that window, the exhaustion drain must
    still raise the worker error — a truncated pass must not report clean
    exhaustion."""
    import queue as _q

    fold = make_dataset(tmp_path, rng, n_per_label=1, labels=(0,))
    sampler = CCTAPatchSampler(
        [p for p, _ in fold], (8, 8, 8), 1, rng=np.random.default_rng(0)
    )
    loader = PrefetchLoader(sampler, num_threads=1, prefetch=1, to_device=False)

    class EmptyQueue:
        def get(self, timeout=None):
            raise _q.Empty

        def get_nowait(self):
            raise _q.Empty  # the sentinel hasn't landed yet

        def empty(self):
            return True

    loader._threads = [object()]
    loader._done_box = {"n": 1}
    loader._err_box = {"e": ValueError("corrupt patient")}
    # the eager pre-check at the loop top normally catches this; simulate
    # the race by injecting the error AFTER that check would have run — the
    # drain path itself must also check
    real_check = loader._maybe_raise_worker_error
    calls = {"n": 0}

    def delayed_check():
        calls["n"] += 1
        if calls["n"] > 1:  # skip the eager loop-top check once
            real_check()

    loader._maybe_raise_worker_error = delayed_check
    loader._queue = EmptyQueue()
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        next(loader)


def test_start_joins_finished_zombies(tmp_path, rng):
    """start() must wait out workers that outlived a previous stop() before
    snapshotting sampler state: an in-flight draw finishing after the new
    generation's (batch, state_after) pairs would silently desync replay."""
    fold = make_dataset(tmp_path, rng, n_per_label=1, labels=(0,))
    sampler = CCTAPatchSampler(
        [p for p, _ in fold], (8, 8, 8), 1, rng=np.random.default_rng(0)
    )
    loader = PrefetchLoader(sampler, num_threads=1, prefetch=1, to_device=False)
    release = threading.Event()
    zombie = threading.Thread(target=release.wait, daemon=True)
    zombie.start()
    loader._zombies = [zombie]
    release.set()  # zombie exits; start() joins and clears it
    loader.start()
    assert loader._zombies == []
    assert next(loader)["data"].shape == (1, 8, 8, 8)
    loader.stop()


def test_3d_centerline_guided_sampling(tmp_path, rng):
    """p_centerline_3d=1.0: every 3D patch window contains a centerline
    voxel (the window is centered on a rasterized centerline point —
    BASELINE.json's centerline-guided 3D patch extraction; the 3D analogue
    of the reference's 2D guided slices, CCTADataLoader.py:51-69)."""
    fold = make_dataset(tmp_path, rng, n_per_label=1, shape=(32, 32, 32))
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(
        paths, (8, 8, 8), batch_size=3, rng=rng, p_centerline_3d=1.0
    )
    for _ in range(6):
        batch = sampler.next_batch()
        assert batch["data"].shape == (3, 8, 8, 8)
        # uniform 8^3 crops of a 32^3 volume holding a ~30-voxel polyline hit
        # the vessel ~25% of the time; 18 consecutive guided hits is the signal
        assert (batch["seg"].reshape(3, -1).max(axis=1) == 1).all()


def test_3d_centerline_guided_edge_clamping(tmp_path, rng):
    """Guided windows around near-edge points are clamped in-bounds; with a
    patch larger than the volume the padding path still emits full shapes."""
    from contrast_gan_3d_tpu.data.preprocess import write_patient
    from tests.synth import synthetic_patient

    vol, mask, _, meta = synthetic_patient(rng, shape=(10, 12, 8))
    # centerline point at the very corner of the volume (world coords)
    meta = dict(meta)
    meta["centerlines_world"] = np.array(
        [[0, 0, 0, 0.5]], np.float32
    ) * meta["spacing"][0] + np.r_[meta["offset"], 0.0].astype(np.float32)
    mask[:] = 0
    mask[0, 0, 0] = 1
    path = write_patient(vol, mask, meta, "edge", tmp_path)
    sampler = CCTAPatchSampler(
        [str(path)], (6, 6, 6), batch_size=2, rng=rng, p_centerline_3d=1.0
    )
    batch = sampler.next_batch()
    assert batch["data"].shape == (2, 6, 6, 6)
    assert (batch["seg"].reshape(2, -1).max(axis=1) == 1).all()

    big = CCTAPatchSampler(
        [str(path)], (16, 16, 16), batch_size=1, rng=rng, p_centerline_3d=1.0
    )
    b = big.next_batch()
    assert b["data"].shape == (1, 16, 16, 16)
    assert b["seg"].max() == 1


def test_3d_guided_zero_probability_stream_unchanged(tmp_path, rng):
    """p_centerline_3d=0.0 consumes NO extra rng draws: streams are
    bit-identical to a sampler without the feature (resume compatibility)."""
    fold = make_dataset(tmp_path, rng, n_per_label=1)
    paths = [p for p, _ in fold]
    a = CCTAPatchSampler(paths, PATCH, 2, rng=np.random.default_rng(9))
    b = CCTAPatchSampler(
        paths, PATCH, 2, rng=np.random.default_rng(9), p_centerline_3d=0.0
    )
    for _ in range(4):
        ba, bb = a.next_batch(), b.next_batch()
        np.testing.assert_array_equal(ba["data"], bb["data"])
        np.testing.assert_array_equal(ba["seg"], bb["seg"])


def test_create_loaders_wires_p_centerline_3d(tmp_path, rng):
    fold = make_dataset(tmp_path, rng, n_per_label=1)
    loaders = create_loaders(
        fold, PATCH, {0: 1, -1: 1, 1: 1}, rng, num_threads=1,
        to_device=False, p_centerline_3d=0.75,
    )
    try:
        for l in loaders.values():
            assert l.sampler.p_centerline_3d == 0.75
        assert next(loaders[0])["data"].shape == (1, *PATCH)
    finally:
        for l in loaders.values():
            l.stop()


def test_finite_unshuffled_pass_preserves_list_order(tmp_path, rng):
    """shuffle=False + infinite=False (eval-style) must visit patients in
    the given list order, not reversed (the epoch order is served by
    pop-from-end internally)."""
    fold = make_dataset(tmp_path, rng, n_per_label=1)  # 3 patients
    paths = [p for p, _ in fold]
    sampler = CCTAPatchSampler(
        paths, PATCH, batch_size=1, rng=rng, infinite=False, shuffle=False
    )
    served = [sampler.next_batch()["path"][0] for _ in range(len(paths))]
    assert served == paths


def test_stop_start_cycle_does_not_skip_batches(tmp_path, rng):
    """stop() discards queued batches the sampler already drew past; a
    subsequent start() must rewind to the last batch actually served so the
    live stream matches the exact-replay (get_state) semantics."""
    fold = make_dataset(tmp_path, rng, n_per_label=1)
    paths = [p for p, _ in fold]

    def stream(n, cycle_after=None):
        s = CCTAPatchSampler(
            paths, PATCH, batch_size=2, rng=np.random.default_rng(7)
        )
        loader = PrefetchLoader(s, num_threads=1, prefetch=3, to_device=False)
        out = []
        try:
            for i in range(n):
                if cycle_after is not None and i == cycle_after:
                    # let the worker fill the queue beyond the consumer
                    time.sleep(0.3)
                    loader.stop()
                    loader.start()
                out.append(next(loader))
        finally:
            loader.stop()
        return out

    plain = stream(6)
    cycled = stream(6, cycle_after=3)
    for a, b in zip(plain, cycled):
        assert a["path"] == b["path"]
        np.testing.assert_array_equal(a["data"], b["data"])

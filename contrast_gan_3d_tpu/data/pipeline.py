"""Async host->device input pipeline.

TPU-native replacement for batchgenerators' ``NonDetMultiThreadedAugmenter``
worker-process stack (reference ``trainer/utils.py:44-107``): the heavy
augmentation moved onto the TPU (``data/augment.py``), so the host only has to
mmap-read int16 patches and ship them to HBM. A small thread pool keeps a
bounded queue of ready batches (mmap page-in releases the GIL) and each batch
is ``jax.device_put`` ahead of time so the H2D DMA overlaps with the previous
step's compute — the JAX analogue of pinned-memory non_blocking copies
(reference Trainer.py:165-167).
"""

import queue
import threading
from typing import Dict, Iterator, Optional

import jax

from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


class PrefetchLoader:
    """Wrap a sampler with background prefetch + eager device transfer."""

    def __init__(
        self,
        sampler: CCTAPatchSampler,
        num_threads: int = 2,
        prefetch: int = 3,
        device: Optional[jax.Device] = None,
        to_device: bool = True,
    ):
        self.sampler = sampler
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.device = device
        self.to_device = to_device
        self._queue: Optional[queue.Queue] = None
        self._threads = []
        self._stop = threading.Event()
        # finite samplers (infinite=False) raise StopIteration in the
        # workers; each exhausted worker posts one sentinel so __next__ can
        # terminate instead of spinning on an empty queue forever
        self._sentinel = object()
        self._done_box = {"n": 0}
        self._err_box = {"e": None}
        self._done_lock = threading.Lock()
        self._zombies = []
        # exact-replay resume (num_threads == 1): every queue item carries
        # the sampler state captured right AFTER its draw; get_state returns
        # the state of the last batch actually SERVED, so queued-but-unseen
        # batches are re-produced after a restore
        self._last_state: Optional[Dict] = None

    # -- lifecycle (reference augmenters use restart/_finish) -------------
    def start(self):
        if self._threads:
            return
        # a zombie from a previous generation still holds the SHARED
        # sampler: letting it finish an in-flight draw AFTER the new
        # worker's (batch, state_after) snapshots would silently desync the
        # exact-replay pairing — same hazard set_state guards against
        self._await_zombies()
        if self._last_state is None:
            self._last_state = self.sampler.get_state()
        elif self.num_threads == 1:
            # a previous stop() drained queued batches the sampler had
            # already drawn past; rewind to the last batch actually SERVED
            # so a stop()/start() cycle neither skips batches nor diverges
            # from what get_state() (exact-replay resume) claims
            self.sampler.set_state(self._last_state)
        # fresh per-generation stop/queue/counter: a worker that outlived a
        # stop() (join timeout — e.g. stuck in a slow mmap page-in) holds
        # the OLD objects, so its event stays set forever and it can never
        # produce into (or count toward) the new generation
        self._stop = threading.Event()
        self._done_box = {"n": 0}
        self._err_box = {"e": None}
        self._queue = queue.Queue(maxsize=self.prefetch + self.num_threads)
        for i in range(self.num_threads):
            t = threading.Thread(
                target=self._worker,
                args=(self._stop, self._queue, self._done_box, self._err_box),
                name=f"prefetch-{i}", daemon=True,
            )
            t.start()
            self._threads.append(t)

    def stop(self):
        self._stop.set()
        if self._queue is not None:
            # drain so workers blocked on put() can observe the stop flag
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
        for t in self._threads:
            t.join(timeout=5)
            if t.is_alive():
                # its generation's stop event is set, so it exits at its next
                # check and cannot produce into the next start() — but its
                # in-flight next_batch() still holds the SHARED sampler, so
                # set_state() must wait for it (tracked in _zombies)
                logger.warning("prefetch worker %s did not stop in 5 s", t.name)
                self._zombies.append(t)
        self._threads = []

    def _worker(
        self, stop: threading.Event, q: queue.Queue, done_box: Dict, err_box: Dict
    ):
        track = self.num_threads == 1  # draw order is only defined then
        while not stop.is_set():
            try:
                batch = self.sampler.next_batch()
                state_after = self.sampler.get_state() if track else None
            except StopIteration:
                with self._done_lock:
                    done_box["n"] += 1
                q.put(self._sentinel)  # space reserved in maxsize
                return
            except Exception as e:  # surface in the consumer, don't hang it
                with self._done_lock:
                    done_box["n"] += 1
                    if err_box["e"] is None:
                        err_box["e"] = e
                q.put(self._sentinel)
                return
            try:
                if self.to_device:
                    batch = dict(batch)
                    put = (
                        (lambda x: jax.device_put(x, self.device))
                        if self.device is not None
                        else jax.device_put
                    )
                    batch["data"] = put(batch["data"])
                    batch["seg"] = put(batch["seg"])
            except Exception as e:  # device_put can fail too (e.g. HBM OOM)
                with self._done_lock:
                    done_box["n"] += 1
                    if err_box["e"] is None:
                        err_box["e"] = e
                q.put(self._sentinel)
                return
            while not stop.is_set():
                try:
                    q.put((state_after, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue

    # -- resumable stream --------------------------------------------------
    def get_state(self) -> Dict:
        """Snapshot the stream at the CONSUMER's position: with one prefetch
        thread this is the sampler state right after the last batch served,
        so a restore replays exactly the batches not yet consumed (batches
        sitting in the queue at save time are re-produced, none skipped).
        With multiple threads the draw order is nondeterministic anyway and
        the raw sampler state is returned (approximate resume)."""
        if self.num_threads == 1 and self._last_state is not None:
            return self._last_state
        return self.sampler.get_state()

    def _await_zombies(self):
        """Wait out workers that outlived a stop(): their in-flight
        next_batch() still holds the SHARED sampler; proceeding would
        silently corrupt the stream state — refuse instead."""
        for t in self._zombies:
            t.join(timeout=10)
        if any(t.is_alive() for t in self._zombies):
            raise RuntimeError(
                "a prefetch worker from a previous generation is still "
                "running and shares this loader's sampler; proceeding now "
                "would silently corrupt the data stream"
            )
        self._zombies = []

    def set_state(self, state: Dict):
        assert not self._threads, "stop() the loader before set_state()"
        self._await_zombies()
        self.sampler.set_state(state)
        self._last_state = state

    def _maybe_raise_worker_error(self):
        with self._done_lock:
            e = self._err_box["e"]
        if e is not None:
            raise RuntimeError("prefetch worker failed") from e

    # -- iteration ---------------------------------------------------------
    def __next__(self) -> Dict:
        if not self._threads:
            self.start()
        while True:
            self._maybe_raise_worker_error()
            try:
                item = self._queue.get(timeout=1.0)
            except queue.Empty:
                if self._stop.is_set():
                    raise StopIteration
                with self._done_lock:
                    all_done = self._done_box["n"] >= len(self._threads)
                if not all_done:
                    continue
                try:
                    # a worker may have posted its FINAL batch between the
                    # get() timeout and the done check — drain before
                    # declaring the pass exhausted (the one-full-pass
                    # semantics must not drop the trailing batch)
                    item = self._queue.get_nowait()
                except queue.Empty:
                    # same race window for FAILURES: a worker sets err_box +
                    # done count under the lock before its sentinel lands —
                    # a truncated pass must raise, not report clean
                    # exhaustion
                    self._maybe_raise_worker_error()
                    raise StopIteration  # all finite workers exhausted
            if item is self._sentinel:
                self._maybe_raise_worker_error()
                with self._done_lock:
                    all_done = self._done_box["n"] >= len(self._threads)
                if all_done and self._queue.empty():
                    raise StopIteration
                continue
            state_after, batch = item
            if state_after is not None:
                self._last_state = state_after
            return batch

    def __iter__(self) -> Iterator[Dict]:
        return self


def create_loaders(
    fold,
    patch_shape,
    batch_sizes: Dict[int, int],
    rng,
    num_threads: int = 2,
    prefetch: int = 3,
    to_device: bool = True,
    augmenter=None,
    p_centerline_3d: float = 0.0,
) -> Dict[int, PrefetchLoader]:
    """One prefetching loader per ScanType label in the fold (reference
    ``create_dataloaders``, trainer/utils.py:44-107). ``augmenter`` is a
    per-sample host transform (``host_augment.HostAugmenter``) applied in
    the prefetch workers; ``p_centerline_3d`` turns on centerline-guided 3D
    crops with that probability (``CCTAPatchSampler``)."""
    import dataclasses

    from contrast_gan_3d_tpu.data.labeling import divide_scans_in_fold

    by_label = divide_scans_in_fold(fold)
    loaders = {}
    for label, paths in by_label.items():
        # np.random.Generator is NOT thread-safe and loaders sample from
        # worker threads concurrently: every sampler (and its augmenter)
        # gets an independent child generator
        child_rng, aug_rng = rng.spawn(2)
        loader_augmenter = (
            dataclasses.replace(augmenter, rng=aug_rng)
            if augmenter is not None
            else None
        )
        sampler = CCTAPatchSampler(
            paths, patch_shape, batch_sizes[label], rng=child_rng,
            augmenter=loader_augmenter, p_centerline_3d=p_centerline_3d,
        )
        loaders[label] = PrefetchLoader(
            sampler, num_threads=num_threads, prefetch=prefetch, to_device=to_device
        )
    return loaders

"""The GAN training runtime (host loop around the jitted steps).

Capability parity with reference ``trainer/Trainer.py:34-363``: alternating
critic/generator updates on an iteration schedule (critic every
``train_critic_every``, generator every ``train_generator_every``), periodic
validation, checkpointing and scalar/image logging, auto-resume from the
latest checkpoint. TPU-native re-design: the per-iteration work is entirely
inside pre-compiled XLA programs (``steps.build_train_steps`` — one program
per schedule branch, no lax.cond over dead branches); the host only pulls
int16 patches from the async prefetchers, dispatches the right program and
(rarely) fetches scalars. Losses are NOT fetched every step — device scalars
accumulate and only cross to host at log points, keeping dispatch fully
asynchronous.
"""

import itertools
import signal
import threading
import time
from dataclasses import dataclass, replace as dc_replace
from typing import Any, Dict, Iterable, List, Optional

import jax
import numpy as np
import optax
from flax import linen as nn

from contrast_gan_3d_tpu.alias import ScanType
from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
from contrast_gan_3d_tpu.trainer.logger import LoggerInterface, NoopLogger
from contrast_gan_3d_tpu.trainer.steps import (
    GANTrainState,
    StepConfig,
    build_preview_step,
    build_train_steps,
    build_val_steps,
    init_state,
)
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)


@dataclass
class TrainerConfig:
    """Schedule / cadence configuration (reference ``basic_conf.py:22-30``)."""

    train_iterations: int = 10_000
    train_critic_every: int = 1
    train_generator_every: int = 5
    val_every: Optional[int] = 400
    val_iterations: int = 2
    log_every: Optional[int] = 100
    log_images_every: Optional[int] = 500
    checkpoint_every: Optional[int] = 1000
    checkpoint_keep: Optional[int] = None
    checkpoint_dir: Optional[str] = None
    # multi-process runs agree on graceful stops every N iterations (hosts
    # receive preemption signals at different wall times; see _stop_due)
    stop_sync_every: int = 10
    # fused schedule cycles: compile K consecutive schedule iterations as
    # ONE program (steps.build_cycle_step) — K host round-trips become 1.
    # Identical math (the per-iteration programs inline); log/image/val/
    # checkpoint/stop cadences round to cycle boundaries, so they should be
    # multiples of K (warned otherwise). 1 = per-iteration dispatch.
    cycle_length: int = 1


def _due(iteration: int, every: Optional[int], skip_zero: bool = True) -> bool:
    if every is None:
        return False
    if skip_zero and iteration == 0:
        return False
    return iteration % every == 0


class TimeBudget:
    """Per-phase wall-clock attribution for the train loop.

    The reference's stall point is known (``next(loader)`` in its hot loop,
    reference trainer/Trainer.py:218-241); under async XLA dispatch ours is
    not observable from one number — wall time accrues at whichever phase
    blocks first (host data wait, the log-boundary scalar sync that drains
    the device queue, preview rendering, validation, checkpoint I/O, or raw
    Python dispatch). Each phase is timed with ``perf_counter`` deltas
    (~100 ns each — noise at 100+ ms steps); fractions are logged as
    ``tb/<phase>_s`` scalars at every log boundary and summarized at the
    end of fit, so a sustained-throughput shortfall names its line item
    instead of hiding in the average (PERF.md round-3 gap study).
    """

    PHASES = ("data_wait", "dispatch", "sync_log", "images", "validation",
              "checkpoint", "other")

    def __init__(self):
        self.total: Dict[str, float] = {p: 0.0 for p in self.PHASES}
        self._window: Dict[str, float] = {p: 0.0 for p in self.PHASES}
        self._t = time.perf_counter()

    def mark(self, phase: str):
        """Charge the time since the previous mark to ``phase``."""
        now = time.perf_counter()
        dt = now - self._t
        self._t = now
        self.total[phase] += dt
        self._window[phase] += dt

    def window_scalars(self) -> Dict[str, float]:
        """Per-phase seconds since the previous log boundary (resets)."""
        out = {f"tb/{k}_s": round(v, 4) for k, v in self._window.items() if v}
        self._window = {p: 0.0 for p in self.PHASES}
        return out

    def summary(self) -> str:
        tot = sum(self.total.values()) or 1e-9
        parts = [
            f"{k} {v:.1f}s ({100 * v / tot:.1f}%)"
            for k, v in sorted(self.total.items(), key=lambda kv: -kv[1])
            if v > 0.005
        ]
        return f"time budget over {tot:.1f}s: " + ", ".join(parts)


class Trainer:
    """Orchestrates jitted WGAN training with validation + checkpointing."""

    def __init__(
        self,
        generator: nn.Module,
        critic: nn.Module,
        gen_tx: optax.GradientTransformation,
        critic_tx: optax.GradientTransformation,
        step_config: StepConfig,
        trainer_config: TrainerConfig,
        key: jax.Array,
        patch_shape,
        logger_interface: Optional[LoggerInterface] = None,
        state: Optional[GANTrainState] = None,
        auto_resume: bool = True,
        mesh=None,
        split_combined: bool = False,
    ):
        self.generator = generator
        self.critic = critic
        if split_combined and trainer_config.cycle_length > 1:
            # the cycle program inlines the FUSED combined step
            # (steps.build_cycle_step) — exactly the high-peak-HBM program
            # split_combined exists to avoid. Fall back to per-iteration
            # dispatch (which honors the split phases) instead of silently
            # compiling the fused graph and risking the OOM.
            logger.warning(
                "split_combined=True: cycle_length=%d ignored — fused "
                "schedule cycles inline the combined step the split mode "
                "avoids; dispatching per-iteration",
                trainer_config.cycle_length,
            )
            trainer_config = dc_replace(trainer_config, cycle_length=1)
        self.cfg = trainer_config
        self.step_cfg = step_config
        self.logger_interface = logger_interface or NoopLogger()
        self.mesh = mesh
        self.split_combined = split_combined

        # checkpoint meta sidecar: module semantics the param tree cannot
        # encode — lets inference rebuild the exact generator (a checkpoint
        # from tconv_placement='torch' training corrected under the default
        # 'same' placement would be silently one voxel off)
        self._ckpt_meta = {
            "generator": {
                k: getattr(generator, k)
                for k in ("tconv_placement", "norm")
                if hasattr(generator, k)
            }
        }
        self._warned_multiproc_images = False
        self._stop_event = threading.Event()
        self.state = state if state is not None else init_state(
            generator, critic, gen_tx, critic_tx, key, tuple(patch_shape)
        )
        if auto_resume and self.cfg.checkpoint_dir:
            self.state = ckpt_lib.maybe_restore(self.state, self.cfg.checkpoint_dir)
        if mesh is not None:
            from contrast_gan_3d_tpu.parallel.mesh import put_replicated

            self.state = put_replicated(self.state, mesh)

        self.steps = build_train_steps(
            generator, critic, gen_tx, critic_tx, step_config, mesh=mesh
        )
        # fused schedule cycles (cycle_length > 1): one compiled program per
        # branch pattern, built lazily and cached (the tail cycle of a run
        # whose horizon K doesn't divide gets its own shorter pattern)
        self._cycle_cache: Dict[tuple, Any] = {}
        if trainer_config.cycle_length > 1:
            k = trainer_config.cycle_length
            off = [
                n for n, every in (
                    ("log_every", trainer_config.log_every),
                    ("log_images_every", trainer_config.log_images_every),
                    ("val_every", trainer_config.val_every),
                    ("checkpoint_every", trainer_config.checkpoint_every),
                    ("stop_sync_every", trainer_config.stop_sync_every),
                ) if every is not None and every % k
            ]
            if off:
                logger.warning(
                    "cycle_length=%d: cadence(s) %s are not multiples of the "
                    "cycle — they fire only at cycle boundaries that happen "
                    "to divide them", k, ", ".join(off),
                )
        self.val_opt_step, self.val_subopt_step = build_val_steps(
            generator, critic, step_config, mesh=mesh
        )
        # device-augmented batches: image logging re-derives the step's
        # augmentation so the logged batch is what the step trained on
        self._preview_step = (
            build_preview_step(generator, step_config, mesh=mesh)
            if step_config.augment is not None
            else None
        )

    # ------------------------------------------------------------------
    @property
    def iteration(self) -> int:
        return int(jax.device_get(self.state.step))

    def _can_log_images(self) -> bool:
        """Whether image logging should run at all this fit: skipped when the
        logger drops images (a preview dispatch + D2H for nothing), and on
        multi-process meshes, where the train/val batches are global arrays
        whose shards span processes — ``np.asarray`` on one would raise
        'spans non-addressable devices' at the first image-log iteration."""
        if not getattr(self.logger_interface, "logs_images", True):
            return False
        if self.mesh is not None and jax.process_count() > 1:
            if not self._warned_multiproc_images:
                self._warned_multiproc_images = True
                logger.warning(
                    "image logging is disabled under multi-process meshes "
                    "(batches span hosts); set log_images_every=None to "
                    "silence this"
                )
            return False
        return True

    def _assemble(self, patches: Dict[int, Dict]) -> tuple:
        """3-stream batches -> (opt, subopt, subopt_mask) device arrays.
        Sub-optimal streams concatenate in ScanType order LOW, HIGH
        (reference Trainer.py:165-167). Under a mesh, batches are padded to
        the device count and placed batch-sharded."""
        import jax.numpy as jnp
        import numpy as np

        opt = patches[ScanType.OPT.value]["data"]
        low = patches[ScanType.LOW.value]
        high = patches[ScanType.HIGH.value]
        names = list(low.get("name", [])) + list(high.get("name", []))
        if self.mesh is None:
            # single-chip: PrefetchLoader already device_put the streams —
            # concatenate ON DEVICE (np.concatenate here would round-trip
            # the LOW/HIGH batches host<->device every iteration)
            opt = jnp.asarray(opt)
            subopt = jnp.concatenate(
                [jnp.asarray(low["data"]), jnp.asarray(high["data"])]
            )
            mask = jnp.concatenate([jnp.asarray(low["seg"]), jnp.asarray(high["seg"])])
            return opt, subopt, mask, names
        # mesh path: put_batch assembles the global array from process-local
        # numpy shards (to_device=False under a mesh, so these are host
        # arrays already — np.asarray is a no-op, not a device fetch)
        subopt = np.concatenate([np.asarray(low["data"]), np.asarray(high["data"])])
        mask = np.concatenate([np.asarray(low["seg"]), np.asarray(high["seg"])])
        from contrast_gan_3d_tpu.parallel.mesh import (
            DATA_AXIS, SPACE_AXIS, mesh_axis_size, put_batch,
        )

        # multi-host: each process feeds its HOST-LOCAL shard (put_batch
        # assembles the global array), so the local batch must divide
        # this host's share of the data axis
        n = max(1, mesh_axis_size(self.mesh, DATA_AXIS) // jax.process_count())
        if opt.shape[0] % n or subopt.shape[0] % n:
            # padding a TRAIN batch with repeated samples would bias
            # every unmasked loss mean AND the BatchNorm batch statistics
            # toward the duplicated patient — refuse instead of training
            # silently wrong (validation pads exactly: eval mode +
            # masked reductions). train.py auto-rounds configured batch
            # sizes to device multiples before building loaders.
            raise ValueError(
                f"host-local train batch sizes (opt {opt.shape[0]}, subopt "
                f"{subopt.shape[0]}) must be divisible by the mesh's "
                f"{n} data-parallel devices on this host; round them up "
                f"to multiples of {n} (train.py does this automatically) "
                "or pick dp_devices that divides them"
            )
        sp = mesh_axis_size(self.mesh, SPACE_AXIS)
        if subopt.shape[1] % sp:
            raise ValueError(
                f"first patch dim ({subopt.shape[1]}) must be divisible "
                f"by the mesh's {sp} spatial-partitioning devices"
            )
        opt = put_batch(np.asarray(opt), self.mesh)
        subopt = put_batch(subopt, self.mesh)
        mask = put_batch(mask, self.mesh)
        return opt, subopt, mask, names

    def train_step(self, patches: Dict[int, Dict], iteration: int):
        """One schedule-aware step; returns the device metrics dict."""
        opt, subopt, mask, names = self._assemble(patches)
        critic_due = _due(iteration, self.cfg.train_critic_every, skip_zero=False)
        gen_due = _due(iteration, self.cfg.train_generator_every, skip_zero=False)
        if critic_due and gen_due:
            if self.split_combined:
                # fallback: two sequential programs (peak HBM = max(phase));
                # the default fused combined_step does ONE generator forward
                # via saved vjp and fits 16 GB at the reference batch
                self.state, m1, subopt_s, mask_s = self.steps.critic_phase(
                    self.state, opt, subopt, mask
                )
                self.state, m2 = self.steps.generator_phase(self.state, subopt_s, mask_s)
                metrics = {**m1, **m2}
            else:
                self.state, metrics = self.steps.combined_step(self.state, opt, subopt, mask)
        elif critic_due:
            self.state, metrics = self.steps.critic_step(self.state, opt, subopt, mask)
        elif gen_due:
            self.state, metrics = self.steps.generator_only_step(self.state, opt, subopt, mask)
        else:
            # schedules like (critic every 2, generator every 4) have
            # iterations that train NEITHER net; still advance the step
            # counter so checkpoints/resume stay aligned with the python
            # iteration count (and the data stream position)
            self.state = self.state.replace(step=self.state.step + 1)
            metrics = {}
        return metrics, (subopt, mask, names)

    def _cycle_pattern(self, iteration: int, length: int) -> tuple:
        """Branch pattern for iterations [iteration, iteration+length)."""
        from contrast_gan_3d_tpu.trainer.steps import schedule_branches

        return schedule_branches(
            self.cfg.train_critic_every, self.cfg.train_generator_every,
            iteration, length,
        )

    def train_step_cycle(
        self,
        patches_list: List[Dict[int, Dict]],
        iteration: int,
        pattern: Optional[tuple] = None,
    ):
        """``len(patches_list)`` schedule iterations as ONE dispatch
        (``steps.build_cycle_step``): the per-iteration batches stack on a
        leading cycle axis and the branch pattern for iterations
        ``[iteration, iteration+K)`` selects a cached compiled cycle.
        Returns the cycle's metrics and the FIRST iteration's batch (whose
        pre-cycle rng is exactly what the image preview re-derives)."""
        from contrast_gan_3d_tpu.trainer.steps import build_cycle_step
        import jax.numpy as jnp

        assembled = [self._assemble(p) for p in patches_list]
        opt_c = jnp.stack([a[0] for a in assembled])
        subopt_c = jnp.stack([a[1] for a in assembled])
        mask_c = jnp.stack([a[2] for a in assembled])
        if pattern is None:
            pattern = self._cycle_pattern(iteration, len(patches_list))
        cycle = self._cycle_cache.get(pattern)
        if cycle is None:
            # no compiler_options for the cycle program even when the steps
            # carry them — the scoped-VMEM step win inverts on the fused
            # cycle (measured, PERF.md round-5 A/B)
            cycle = self._cycle_cache[pattern] = build_cycle_step(
                self.steps, pattern, mesh=self.mesh
            )
        self.state, metrics = cycle(self.state, opt_c, subopt_c, mask_c)
        return dict(metrics), (assembled[0][1], assembled[0][2], assembled[0][3])

    # ------------------------------------------------------------------
    def request_stop(self, reason: str = "") -> None:
        """Ask :meth:`fit` to exit at the next iteration boundary.

        Signal-/thread-safe (sets an Event; no device work). The loop then
        breaks and falls through to the normal end-of-fit path, which writes
        the final checkpoint + per-host data sidecars — so a preempted run
        resumes exactly where it stopped (TPU pods are routinely preempted;
        the reference has no analogue: a killed run loses everything since
        its last periodic checkpoint, reference ``trainer/Trainer.py:230``).
        With checkpointing disabled (``checkpoint_every=None`` or no
        ``checkpoint_dir``) the loop still exits at the boundary — Ctrl-C
        must stop an ad-hoc run — but nothing is persisted; the break path
        warns loudly so an orchestrator log shows the progress was
        discarded."""
        if not self._stop_event.is_set():
            # the first line an operator sees must match what will actually
            # happen: with checkpointing disabled nothing is persisted
            will_checkpoint = (
                self.cfg.checkpoint_dir and self.cfg.checkpoint_every is not None
            )
            logger.warning(
                "Graceful stop requested%s — finishing current iteration, "
                "then %s",
                f" ({reason})" if reason else "",
                "checkpointing and exiting" if will_checkpoint
                else "exiting WITHOUT a checkpoint (checkpointing disabled; "
                     "progress since the last save is discarded)",
            )
            self._stop_event.set()

    @property
    def stop_requested(self) -> bool:
        return self._stop_event.is_set()

    def _stop_due(self, iteration: int) -> bool:
        """Whether :meth:`fit` should break at this iteration boundary.

        Single-process: the local flag, checked every iteration. Multi-
        process: the decision must be COLLECTIVE — schedulers deliver
        preemption signals to each host at different wall times, and one
        host breaking alone would leave its peers blocked in the next
        step's collectives. Local flags are all-gathered every
        ``stop_sync_every`` iterations (identical iteration sequence on
        every host, so the sync points line up), and everyone breaks at
        the same boundary. The cadence bounds the extra per-iteration
        host<->device sync to 1/N iterations; at default N=10 and
        production step times the added stop latency is seconds — well
        inside preemption grace windows."""
        if jax.process_count() == 1:
            return self._stop_event.is_set()
        if iteration % max(1, self.cfg.stop_sync_every) != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self._stop_event.is_set()], np.int32)
        )
        if flags.any():
            self._stop_event.set()  # align hosts that never saw the signal
            return True
        return False

    # ------------------------------------------------------------------
    def _flush_oldest_log(self):
        """Fetch + emit the oldest enqueued log boundary (lagged logging —
        see the enqueue site in fit). ``patches_per_sec`` is measured
        between fetch COMPLETIONS: the fetch of boundary j only waits for
        step j to finish, so consecutive completion times bracket exactly
        one window of finished device work — a device-truth sustained
        number with no pipeline stall."""
        e = self._pending_logs.pop(0)
        host = {k: float(jax.device_get(v)) for k, v in e["metrics"].items()}
        now = time.perf_counter()
        last_it, last_t = self._last_fetch
        if e["iteration"] > last_it and last_t is not None:
            # last_t None = no prior FETCH COMPLETION to bracket against
            # (first flush after a (re)start): the elapsed time would span
            # from fit() entry to this flush — one lag window longer than
            # the patch window — understating throughput severalfold
            host["patches_per_sec"] = (
                (e["iteration"] - last_it) * e["n_patches"]
                / max(now - last_t, 1e-9)
            )
        self._last_fetch = (e["iteration"], now)
        host.update(e["tb"])
        self.logger_interface.log_scalars(host, e["iteration"], "train")

    def fit(
        self,
        train_loaders: Dict[int, Iterable],
        val_loaders: Optional[Dict[int, Iterable]] = None,
        profiler=None,
    ) -> GANTrainState:
        start = self.iteration
        if start and self.cfg.checkpoint_dir:
            # resumed run: restore the host data-stream (sampler rngs) so
            # the batch sequence continues where the checkpoint left off
            self._data_state(train_loaders, "restore", start)
        self._manage_loaders(train_loaders, "start")
        if val_loaders and self.cfg.val_every:
            self._manage_loaders(val_loaders, "start")
        logger.info("Training from iteration %d to %d", start, self.cfg.train_iterations)
        if profiler is not None and hasattr(profiler, "begin"):
            profiler.begin()  # covers a schedule whose iteration 0 is active
        self._pending_logs = []
        self._last_fetch = (start, None)  # None: no fetch completed yet
        budget = self.time_budget = TimeBudget()
        K = max(1, int(self.cfg.cycle_length))
        if K > 1 and profiler is not None:
            logger.warning(
                "cycle_length=%d: the profiler schedule counts CYCLES — "
                "each skip/wait/warmup/active unit covers %d iterations",
                K, K,
            )
        iteration = start
        while iteration < self.cfg.train_iterations:
            # cycle boundaries stay on multiples of K regardless of the
            # resume point: a run resumed mid-cycle gets one short first
            # cycle (else every later boundary would miss the %-based
            # log/val/checkpoint cadences); the horizon tail is short too
            k_len = min(
                K - (iteration % K), self.cfg.train_iterations - iteration
            )
            budget.mark("other")  # loop bookkeeping + stop sync
            if self._stop_due(iteration):
                if self.cfg.checkpoint_dir and self.cfg.checkpoint_every is not None:
                    logger.warning(
                        "Stopping at iteration %d (graceful stop); the final "
                        "checkpoint + data sidecars follow", iteration,
                    )
                else:
                    logger.warning(
                        "Stopping at iteration %d (graceful stop) with "
                        "checkpointing DISABLED — progress since iteration %d "
                        "is discarded", iteration, start,
                    )
                break
            if K == 1:
                patches = {st.value: next(train_loaders[st.value]) for st in ScanType}
                pattern = None
            else:
                pattern = self._cycle_pattern(iteration, k_len)
                patches_list = [
                    {st.value: next(train_loaders[st.value]) for st in ScanType}
                    for _ in range(k_len)
                ]
                patches = patches_list[0]  # per-iteration batch size source
            budget.mark("data_wait")
            images_due = (
                _due(iteration, self.cfg.log_images_every, skip_zero=False)
                and self._can_log_images()
            )
            if images_due and pattern is not None:
                # the preview pairs the cycle's FIRST batch with the
                # pre-cycle rng; a "none" first branch never consumes that
                # rng, so the pairing would show augmentation the displayed
                # batch never got — skip this cycle's preview instead
                images_due = pattern[0] != "none"
            rng_before = None
            if images_due and self._preview_step is not None:
                # the step donates (and advances) state.rng — keep a copy so
                # the preview can re-derive this step's augmentation (in
                # cycle mode the preview batch IS the cycle's first, whose
                # augmentation this pre-cycle rng derives)
                rng_before = jax.random.wrap_key_data(
                    jax.device_get(jax.random.key_data(self.state.rng)),
                    impl=jax.random.key_impl(self.state.rng),
                )
            if K == 1:
                metrics, (subopt, mask, names) = self.train_step(patches, iteration)
            else:
                metrics, (subopt, mask, names) = self.train_step_cycle(
                    patches_list, iteration, pattern
                )
            budget.mark("dispatch")

            if metrics and _due(iteration, self.cfg.log_every, skip_zero=False):
                # LAGGED scalar logging: a device_get of THIS iteration's
                # metrics would drain the whole async dispatch queue (the
                # round-3 gap study measured that drain at up to half the
                # wall clock per log window, PERF.md). Instead this
                # boundary's metric refs are enqueued and the PREVIOUS
                # boundary's are fetched — that work is a full log window
                # old, so the fetch returns without stalling the pipeline
                # unless the device is genuinely >1 window behind (in which
                # case the wait is the true throughput signal).
                self._pending_logs.append({
                    "iteration": iteration,
                    "metrics": metrics,
                    "n_patches": sum(
                        p["data"].shape[0] for p in patches.values()
                    ),
                    "tb": budget.window_scalars(),
                })
                while len(self._pending_logs) > 1:
                    self._flush_oldest_log()
                budget.mark("sync_log")
            if images_due and metrics:
                # metrics empty = no program ran this iteration; there is no
                # "batch the step trained on" to render (and rng_before was
                # never consumed, so a preview would show the NEXT step's
                # augmentation)
                self._log_train_images(subopt, mask, names, iteration, rng_before)
                budget.mark("images")

            if val_loaders and _due(iteration, self.cfg.val_every):
                self.validate(val_loaders, iteration)
                budget.mark("validation")
            if self.cfg.checkpoint_dir and _due(iteration, self.cfg.checkpoint_every):
                # the model state is replicated -> process 0 writes it once;
                # the data-stream sidecar is PER-HOST (disjoint fold shards)
                if jax.process_index() == 0:
                    ckpt_lib.save_checkpoint(
                        self.state, self.cfg.checkpoint_dir,
                        keep=self.cfg.checkpoint_keep, async_=True,
                        meta=self._ckpt_meta,
                    )
                self._data_state(train_loaders, "save", self.iteration)
                budget.mark("checkpoint")
            if profiler is not None:
                profiler.step()
            iteration += k_len

        budget.mark("other")
        while self._pending_logs:  # drain the lagged log queue
            self._flush_oldest_log()
        budget.mark("sync_log")
        logger.info(budget.summary())
        if profiler is not None:
            profiler.stop()
        if self.cfg.checkpoint_dir and self.cfg.checkpoint_every is not None:
            if jax.process_index() == 0:
                ckpt_lib.save_checkpoint(
                    self.state, self.cfg.checkpoint_dir,
                    keep=self.cfg.checkpoint_keep, meta=self._ckpt_meta,
                )
            self._data_state(train_loaders, "save", self.iteration)
        self._manage_loaders(train_loaders, "end")
        if val_loaders:
            self._manage_loaders(val_loaders, "end")
        self.logger_interface.end_hook()
        return self.state

    def _put_val(self, data):
        """(data, validity) for the sharded val steps: under a mesh the batch
        pads to the device count and shards (each chip computes its shard
        only); the 0/1 weights make the masked losses padding-exact."""
        import jax.numpy as jnp

        if self.mesh is None:  # no host round-trip for on-device batches
            data = jnp.asarray(data)
            return data, jnp.ones((data.shape[0],), jnp.float32)
        data = np.asarray(data)
        n = data.shape[0]
        from contrast_gan_3d_tpu.parallel.mesh import (
            DATA_AXIS,
            mesh_axis_size,
            pad_batch_to_multiple,
            put_batch,
        )

        padded = pad_batch_to_multiple(
            data, max(1, mesh_axis_size(self.mesh, DATA_AXIS) // jax.process_count())
        )
        w = np.zeros((padded.shape[0],), np.float32)
        w[:n] = 1.0
        return put_batch(padded, self.mesh), put_batch(w, self.mesh)

    # ------------------------------------------------------------------
    def validate(self, val_loaders: Dict[int, Iterable], train_iteration: int):
        """Eval-mode validation sweep (reference Trainer.py:247-308): OPT
        batches score critic realism; sub-optimal batches run the generator
        and accumulate adversarial + similarity losses; the first sub-optimal
        batches are logged as images."""
        loss_sim = loss_G = loss_real_C = loss_fake_C = 0.0
        loggable = []
        collect_images = (
            self.cfg.log_images_every is not None and self._can_log_images()
        )
        n_subopt = self.cfg.val_iterations * (len(ScanType) - 1)
        for i, st in itertools.product(range(self.cfg.val_iterations), ScanType):
            batch = next(val_loaders[st.value])
            data, w = self._put_val(batch["data"])
            if st == ScanType.OPT:
                loss_real_C -= float(jax.device_get(self.val_opt_step(self.state, data, w)))
            else:
                loss_fake, l_sim, sample_hat, atten = self.val_subopt_step(
                    self.state, data, w
                )
                loss_fake = float(jax.device_get(loss_fake))
                loss_fake_C += loss_fake
                loss_G -= loss_fake
                loss_sim += float(jax.device_get(l_sim))
                if i == 0 and collect_images:
                    n = batch["data"].shape[0]  # unpadded size, no host copy
                    loggable.append((batch, sample_hat[:n], atten[:n]))

        if loggable:
            samples = np.concatenate(
                [np.asarray(self.step_cfg.scaler(b["data"].astype(np.float32))) for b, _, _ in loggable]
            )
            recons = np.concatenate([np.asarray(r)[..., 0] for _, r, _ in loggable])
            attens = np.concatenate([np.asarray(a)[..., 0] for _, _, a in loggable])
            masks = np.concatenate([np.asarray(b["seg"]) for b, _, _ in loggable])
            names = sum((list(b.get("name", [])) for b, _, _ in loggable), [])
            self.logger_interface.log_images(
                samples, recons, attens, masks, names, train_iteration, "validation"
            )

        val_loss = {
            # reference normalization kept verbatim (Trainer.py:303-308):
            # D divides the 1-real + 2-subopt sum by val_iterations only, so
            # fake logits weigh 2x the reals in the reported scalar; G/sim
            # divide by the subopt batch count
            "D": (loss_real_C + loss_fake_C) / self.cfg.val_iterations,
            "G": loss_G / n_subopt,
            "sim": loss_sim / n_subopt,
        }
        self.logger_interface.log_scalars(val_loss, train_iteration, "validation")

    # ------------------------------------------------------------------
    def _log_train_images(self, subopt, mask, names, iteration: int, rng_before=None):
        """Render the batch the step actually trained on (reference
        Trainer.py:187-203). Host-augmented batches arrive pre-augmented;
        with on-device augmentation the preview step re-derives the step's
        augmentation from ``rng_before`` (the PRNG key the step consumed).

        Cycle-mode drift (cycle_length K > 1): the caller passes the
        cycle's FIRST batch and pre-cycle rng but renders with POST-cycle
        params, so the reconstruction comes from a generator up to K-1
        updates newer than the one that trained on that batch. The
        per-iteration path has the same params/batch skew of exactly one
        update (the reference logs pre-update activations mid-step instead);
        K merely widens it — preview images are a qualitative monitor, not
        a training artifact, so the cycle keeps its single fused program
        rather than returning an extra pre-update forward per boundary."""
        n = len(names) if names else np.asarray(mask).shape[0]
        if self._preview_step is not None and rng_before is not None:
            sample_s, sample_hat, atten, mask_s = self._preview_step(
                self.state, rng_before, subopt, mask
            )
            sample = np.asarray(sample_s)[:n, ..., 0]
            mask = np.asarray(mask_s)[:n]
        else:
            import jax.numpy as jnp

            w = jnp.ones((subopt.shape[0],), jnp.float32)
            if self.mesh is not None:
                from contrast_gan_3d_tpu.parallel.mesh import put_batch

                w = put_batch(np.ones((subopt.shape[0],), np.float32), self.mesh)
            _, _, sample_hat, atten = self.val_subopt_step(self.state, subopt, w)
            sample = np.asarray(
                self.step_cfg.scaler(np.asarray(subopt, dtype=np.float32))
            )[:n]
            mask = np.asarray(mask)[:n]
        self.logger_interface.log_images(
            sample,
            np.asarray(sample_hat)[:n, ..., 0],
            np.asarray(atten)[:n, ..., 0],
            mask,
            names,
            iteration,
            "train",
        )

    def _data_state(self, loaders: Dict[int, Iterable], action: str, step: int):
        """Save/restore the host data-stream state next to the model
        checkpoint (only for loaders that support it)."""
        stateful = {
            k: l for k, l in loaders.items()
            if hasattr(l, "get_state") and hasattr(l, "set_state")
        }
        if not stateful:
            return
        if len(stateful) != len(loaders):
            logger.warning(
                "data-stream checkpointing covers loaders %s only (the "
                "others have no get_state/set_state)", sorted(stateful),
            )
        if action == "save":
            ckpt_lib.save_data_state(stateful, self.cfg.checkpoint_dir, step)
        else:
            ckpt_lib.maybe_restore_data_state(stateful, self.cfg.checkpoint_dir, step)

    @staticmethod
    def _manage_loaders(loaders: Dict[int, Iterable], event: str):
        for loader in loaders.values():
            fn = getattr(loader, "start" if event == "start" else "stop", None)
            if fn is not None:
                fn()


def install_preemption_handler(trainer: Trainer, signums=(signal.SIGTERM, signal.SIGINT)):
    """Wire OS preemption signals to :meth:`Trainer.request_stop`.

    TPU VMs and pod schedulers deliver SIGTERM ahead of eviction; the first
    signal requests a graceful stop (finish the current iteration, write the
    final checkpoint + data sidecars, exit 0), a second delivery of the same
    signal escalates to the previous handler (default: terminate / raise
    KeyboardInterrupt) for runs wedged inside a device call. Multi-host note:
    handlers are per-process — schedulers signal every worker on preemption;
    a host stopping alone would leave peers blocked in collectives.

    Returns ``{signum: previous_handler}`` so callers can restore (tests,
    nested runs), or ``None`` when called off the main thread (where
    ``signal.signal`` is unavailable and nothing is installed)."""
    from contrast_gan_3d_tpu.utils.signals import install_graceful_stop

    return install_graceful_stop(
        lambda name: trainer.request_stop(reason=name),
        lambda: trainer.stop_requested,
        signums,
    )

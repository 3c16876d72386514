#!/usr/bin/env python
"""CLI training entry point (reference ``train.py:212-265``).

Orchestrates: config resolution (preset name or override file) -> seeding ->
per-fold loaders -> Trainer -> fit, with optional wandb tracking, XProf
profiling and data-parallel meshes. Cross-val splits come from a pickle of
``{"train": [fold...], "test": [fold...]}`` (reference ``cross_val_splits``)
or are built on the fly from labeled dataset sheets.
"""

import argparse
import pickle
import signal
import sys
import threading
import time
from dataclasses import dataclass, field, replace
from pathlib import Path
from typing import List, Optional

import jax

from contrast_gan_3d_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()  # scoped per platform+CPU features (utils/cache.py)

from contrast_gan_3d_tpu import config as paths
from contrast_gan_3d_tpu.alias import FoldType, ScanType
from contrast_gan_3d_tpu.data.pipeline import create_loaders
from contrast_gan_3d_tpu.experiments import ExperimentConfig, asdict_flat, load_config
from contrast_gan_3d_tpu.experiments.builder import build
from contrast_gan_3d_tpu.models.utils import count_parameters
from contrast_gan_3d_tpu.trainer.trainer import Trainer, install_preemption_handler
from contrast_gan_3d_tpu.utils import seed_everything
from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name="train")


class JaxProfiler:
    """XProf/TensorBoard trace with a torch.profiler-style schedule
    (TPU-native analogue of the reference's wiring, reference train.py:33-55:
    schedule(skip_first=11, wait=3, warmup=4, active=3)).

    After ``skip_first`` steps, cycles of ``wait + warmup + active`` steps
    repeat ``repeat`` times (0 = forever); each cycle traces exactly its last
    ``active`` steps. jax traces have no discard-phase, so ``warmup`` steps
    simply extend the untraced lead-in — steady-state sections (e.g. steps
    500-510 of a long run) are traceable by setting ``skip_first``.

    ``step()`` is a post-dispatch BOUNDARY callback: a trace starts when the
    *next* iteration is a cycle's first active step and stops right after
    its last active step was dispatched — so the trace covers exactly the
    active iterations (``active=1`` traces one full step, not an empty
    window). ``begin()`` (called by Trainer.fit before the loop) covers the
    case where iteration 0 itself is active."""

    def __init__(
        self,
        logdir: str,
        active: int = 20,
        skip_first: int = 0,
        wait: int = 0,
        warmup: int = 0,
        repeat: int = 1,
        memory: bool = True,
    ):
        assert active > 0
        self.logdir = str(logdir)
        self.active = active
        self.skip_first = skip_first
        self.wait = wait
        self.warmup = warmup
        self.repeat = repeat
        self.memory = memory
        self._count = 0
        self._cycles_done = 0
        self._active = False

    @classmethod
    def from_spec(cls, logdir: str, spec: str) -> "JaxProfiler":
        """Build from 'skip_first=500,active=10[,wait=..,warmup=..,repeat=..]'."""
        kwargs = {}
        for part in spec.split(","):
            if part.strip():
                k, v = part.split("=")
                kwargs[k.strip()] = int(v)
        return cls(logdir, **kwargs)

    def _is_first_active(self, i: int) -> bool:
        """Is iteration ``i`` the first active step of a (budgeted) cycle?"""
        if i < self.skip_first:
            return False
        if self.repeat and self._cycles_done >= self.repeat:
            return False
        cycle = self.wait + self.warmup + self.active
        return (i - self.skip_first) % cycle == self.wait + self.warmup

    def _start_trace(self, i: int):
        jax.profiler.start_trace(self.logdir)
        self._active = True
        logger.info("Profiler tracing from step %d -> %s", i, self.logdir)

    def begin(self):
        """Call once before the first iteration (Trainer.fit does)."""
        if not self._active and self._is_first_active(self._count):
            self._start_trace(self._count)

    def step(self):
        """Call once per train iteration (after the step dispatch)."""
        i = self._count
        self._count += 1
        cycle = self.wait + self.warmup + self.active
        if self._active:
            pos = (i - self.skip_first) % cycle
            if pos == self.wait + self.warmup + self.active - 1:
                self._stop_trace()
                self._cycles_done += 1
        if not self._active and self._is_first_active(i + 1):
            self._start_trace(i + 1)

    def _stop_trace(self):
        jax.profiler.stop_trace()
        self._active = False
        logger.info("Profiler trace written to %s", self.logdir)
        if self.memory:
            # memory view of each trace cycle (the reference profiler's
            # profile_memory/record_shapes analogue, reference train.py:44-47):
            # live-buffer shape table always; the pprof heap profile needs
            # MEMPROF_HEAP=1 (this PJRT plugin aborts on it — utils/memory)
            from contrast_gan_3d_tpu.utils.memory import write_memory_snapshot

            try:
                paths_written = write_memory_snapshot(
                    self.logdir, f"step{self._count}"
                )
                logger.info("Memory snapshot: %s", ", ".join(paths_written))
            except Exception as e:  # never let reporting kill a train run
                logger.warning("Memory snapshot failed: %s", e)

    def stop(self):
        if self._active:
            self._stop_trace()


def effective_logger(logger_kind: str, process_index: int, process_count: int) -> str:
    """Multi-host runs keep ONE experiment logger (host 0): the train state is
    replicated, so every host computes identical metrics — N wandb runs / N
    file sinks would be N copies of the same curves (and per-host FileLogger
    dirs under a shared checkpoint root would collide). Console/noop loggers
    are per-host by design and pass through."""
    if process_count > 1 and process_index != 0 and logger_kind in (
        "wandb", "tensorboard", "file",
    ):
        return "none"
    return logger_kind


def round_train_batches(bs: dict, n: int) -> dict:
    """MINIMAL batch-size rounding for an ``n``-device mesh: the Trainer
    needs only ``opt % n == 0`` and ``(LOW + HIGH) % n == 0`` — per-stream
    rounding would inflate the batch (and the reference's opt:subopt
    balance) far beyond that. The sub-optimal pad splits as evenly as
    possible over LOW and HIGH."""
    subopt = bs.get(ScanType.LOW.value, 0) + bs.get(ScanType.HIGH.value, 0)
    opt_b = bs.get(ScanType.OPT.value, 0)
    if not (opt_b % n or subopt % n):
        return dict(bs)
    new_bs = dict(bs)
    if opt_b % n:
        new_bs[ScanType.OPT.value] = -(-opt_b // n) * n
    extra = (-subopt) % n
    new_bs[ScanType.LOW.value] = bs.get(ScanType.LOW.value, 0) + (extra - extra // 2)
    new_bs[ScanType.HIGH.value] = bs.get(ScanType.HIGH.value, 0) + extra // 2
    return new_bs


@dataclass
class TrainManager:
    """Per-fold experiment orchestration (reference train.py:58-209)."""

    config: ExperimentConfig
    train_folds: List[FoldType]
    val_folds: List[FoldType]
    checkpoint_root: Path = field(default_factory=lambda: paths.CHECKPOINTS_DIR)
    run_id: Optional[str] = None
    starting_fold: int = 0
    max_folds: int = 1  # the reference breaks after fold 0 (train.py:209)
    profiler: Optional[JaxProfiler] = None
    wandb_project: Optional[str] = None
    wandb_entity: Optional[str] = None
    group: Optional[str] = None
    # wall-clock budget (hours) across the whole run: when it expires the
    # trainer checkpoints gracefully and exits 0 — for bounded TPU
    # reservations where a hard eviction would otherwise land mid-iteration
    max_hours: Optional[float] = None
    _t0: float = field(default_factory=time.monotonic)

    def maybe_restore_wandb_run(self):
        """Resuming an existing wandb run restores its experiment group and
        starting fold from the wandb API (reference train.py:80-92)."""
        if self.run_id is None or self.config.logger != "wandb":
            return
        try:
            import wandb

            path = "/".join(
                p for p in (self.wandb_entity, self.wandb_project, self.run_id) if p
            )
            run = wandb.Api().run(path)
        except Exception as e:
            logger.warning("wandb resume lookup failed (%s); fresh run state", e)
            return
        self.group = getattr(run, "group", None) or self.group
        fold = (getattr(run, "config", None) or {}).get("fold")
        if fold is not None:
            self.starting_fold = int(fold)
        logger.info(
            "Resumed wandb run '%s': group=%s starting_fold=%d",
            self.run_id, self.group, self.starting_fold,
        )

    def __call__(self):
        self.maybe_restore_wandb_run()
        if len(self.train_folds) != len(self.val_folds):
            # zip would silently truncate to the shorter list — a misaligned
            # splits pickle must not turn training into a no-op
            raise SystemExit(
                f"cval splits misaligned: {len(self.train_folds)} train vs "
                f"{len(self.val_folds)} val folds"
            )
        ran = 0
        for fold_idx, (train_fold, val_fold) in enumerate(
            zip(self.train_folds, self.val_folds)
        ):
            if fold_idx < self.starting_fold:
                continue
            if fold_idx >= self.starting_fold + self.max_folds:
                break
            self.run_fold(fold_idx, train_fold, val_fold)
            ran += 1
        if ran == 0:
            raise SystemExit(
                f"no fold ran: starting_fold={self.starting_fold} with "
                f"{len(self.train_folds)} folds available"
            )

    def _budget_exhausted(self, fold_idx: int) -> bool:
        """True when the --max-hours wall-clock budget has already run out.

        Checked at the very top of run_fold, BEFORE any fold state exists
        (wandb run, signal handlers, loaders), so skipping is side-effect
        free. Under multi-process runs the decision is host 0's, broadcast
        to everyone: per-host clocks are skewed by seconds, and hosts
        disagreeing near the boundary would leave the ones that entered
        fit() deadlocked in the first iteration's collectives.
        """
        remaining = self.max_hours * 3600.0 - (time.monotonic() - self._t0)
        import jax as _jax

        if _jax.process_count() > 1:
            import numpy as _np
            from jax.experimental import multihost_utils

            remaining = float(
                multihost_utils.broadcast_one_to_all(_np.float32(remaining))
            )
        if remaining <= 0:
            logger.warning(
                "--max-hours budget exhausted before fold %d — skipping",
                fold_idx,
            )
            return True
        return False

    def run_fold(self, fold_idx: int, train_fold: FoldType, val_fold: FoldType):
        cfg = self.config
        if self.max_hours is not None and self._budget_exhausted(fold_idx):
            return
        # an explicit run id names one run; with several folds the fold index
        # must still distinguish them, or every fold resumes/overwrites the
        # same checkpoint dir and wandb run
        run_name = self.run_id or f"{cfg.name}-fold{fold_idx}"
        if self.run_id and self.max_folds > 1:
            run_name = f"{self.run_id}-fold{fold_idx}"
        ckpt_dir = Path(self.checkpoint_root) / run_name

        mesh = None
        import jax as _jax

        if _jax.process_count() > 1 and cfg.dp_devices is None and not cfg.sp_devices:
            # without a mesh every host would train the FULL fold
            # independently, all writing the same checkpoint dir and each
            # spawning its own experiment logger — never what --multihost
            # means (main() defaults dp_devices for --multihost; this guards
            # programmatic TrainManager use)
            raise SystemExit(
                "multi-process runs need a mesh: set dp_devices (0 = all "
                "devices) and/or sp_devices"
            )
        if cfg.dp_devices is not None or cfg.sp_devices:
            from contrast_gan_3d_tpu.parallel import data_mesh, dp_sp_mesh

            if cfg.sp_devices:
                import jax as _jax

                # dp_devices None (sp set via config file) or 0 both mean
                # "derive from the device count"
                dp = cfg.dp_devices or len(_jax.devices()) // cfg.sp_devices
                if dp < 1:
                    raise SystemExit(
                        f"sp_devices={cfg.sp_devices} needs at least that many "
                        f"devices; have {len(_jax.devices())}"
                    )
                if not cfg.dp_devices and dp * cfg.sp_devices < len(_jax.devices()):
                    logger.warning(
                        "dp x sp mesh uses %d of %d devices (device count is "
                        "not a multiple of sp_devices=%d)",
                        dp * cfg.sp_devices, len(_jax.devices()), cfg.sp_devices,
                    )
                mesh = dp_sp_mesh(dp, cfg.sp_devices)
                for size_field in ("train_patch_size", "val_patch_size"):
                    first_dim = getattr(cfg, size_field)[0]
                    if first_dim % cfg.sp_devices:
                        raise SystemExit(
                            f"{size_field}[0]={first_dim} must be divisible by "
                            f"sp_devices={cfg.sp_devices}"
                        )
            else:
                mesh = data_mesh(cfg.dp_devices or None)
            logger.info("Mesh: %s", mesh)
            # train batches must be divisible by the mesh's data axis (the Trainer
            # refuses to pad them — repeated samples would bias losses and
            # BatchNorm stats); round each stream up to a multiple when needed
            from contrast_gan_3d_tpu.parallel.mesh import DATA_AXIS, mesh_axis_size

            n = mesh_axis_size(mesh, DATA_AXIS)
            bs = dict(cfg.train_batch_size)
            new_bs = round_train_batches(bs, n)
            if new_bs != bs:
                logger.warning(
                    "Rounding train batch sizes %s -> %s to divide the "
                    "%d-device mesh", bs, new_bs, n,
                )
                cfg = replace(cfg, train_batch_size=new_bs)

        # multi-host: this process samples only ITS fold shard and loads
        # 1/process_count of every stream — mesh.put_batch assembles the
        # global arrays from the per-host shards (sharded-corpus layout)
        loader_train_bs = dict(cfg.train_batch_size)
        loader_val_bs = dict(cfg.val_batch_size)
        if mesh is not None:
            import jax as _jax

            pc = _jax.process_count()
            if pc > 1:
                from contrast_gan_3d_tpu.parallel.multihost import host_fold_shard

                bad = {k: v for k, v in loader_train_bs.items() if v % pc}
                if bad:
                    raise SystemExit(
                        f"train batch sizes {bad} must be divisible by the "
                        f"{pc} hosts (each host loads its share)"
                    )
                train_fold = host_fold_shard(train_fold)
                if val_fold:
                    val_fold = host_fold_shard(val_fold)
                loader_train_bs = {k: v // pc for k, v in loader_train_bs.items()}
                loader_val_bs = {k: max(1, v // pc) for k, v in loader_val_bs.items()}
                downgraded = effective_logger(cfg.logger, _jax.process_index(), pc)
                if downgraded != cfg.logger:
                    logger.info(
                        "Host %d: experiment logging (%s) delegated to host 0",
                        _jax.process_index(), cfg.logger,
                    )
                    cfg = replace(cfg, logger=downgraded)
                logger.info(
                    "Host %d/%d: %d-patient fold shard, per-host train "
                    "batches %s", _jax.process_index(), pc, len(train_fold),
                    loader_train_bs,
                )

        if cfg.logger == "wandb":
            # init BEFORE build(): builder constructs WandbLogger, whose
            # define_metric calls need the active run
            try:
                import wandb

                wandb.init(
                    # an explicit run id names the run (per-fold suffixed when
                    # several folds run — one shared id would merge them);
                    # without one, let wandb generate a unique id (a
                    # deterministic name-derived id + resume='allow' would
                    # silently append unrelated re-runs to each other)
                    id=(
                        (run_name if self.max_folds > 1 else self.run_id)
                        if self.run_id
                        else None
                    ),
                    resume="allow" if self.run_id else None,
                    name=run_name,
                    project=self.wandb_project, entity=self.wandb_entity,
                    group=self.group,
                    config=asdict_flat(cfg) | {"fold": fold_idx},
                )
            except Exception as e:  # pragma: no cover
                logger.warning("wandb init failed (%s); continuing", e)

        built = build(cfg, checkpoint_dir=str(ckpt_dir))
        host_rng, key = seed_everything(built.seed)
        if mesh is not None:
            import jax as _jax

            if _jax.process_count() > 1:
                # decorrelate crop/augment streams across hosts (patients are
                # already disjoint via host_fold_shard; identical rng streams
                # would still correlate crop positions)
                host_rng = host_rng.spawn(_jax.process_count())[_jax.process_index()]

        # under a mesh the trainer pads + shards batches itself; eager
        # single-device put would only force a host round-trip
        to_device = mesh is None
        train_loaders = create_loaders(
            train_fold, cfg.train_patch_size, loader_train_bs, host_rng,
            num_threads=cfg.num_workers[0], prefetch=cfg.prefetch_depth,
            augmenter=built.host_augmenter, to_device=to_device,
            p_centerline_3d=0.0 if cfg.is_2d else cfg.p_centerline_3d,
        )
        val_loaders = None
        if cfg.validate_every is not None and val_fold:
            val_loaders = create_loaders(
                val_fold, cfg.val_patch_size, loader_val_bs, host_rng,
                num_threads=cfg.num_workers[1], prefetch=1, to_device=to_device,
            )

        trainer = Trainer(
            built.generator, built.critic, built.gen_tx, built.critic_tx,
            built.step_config, built.trainer_config, key,
            cfg.train_patch_size, logger_interface=built.logger_interface,
            mesh=mesh,
        )
        n_gen = count_parameters(trainer.state.gen_params)
        n_critic = count_parameters(trainer.state.critic_params)
        logger.info(
            "Fold %d | G params %s | D params %s | config %s",
            fold_idx, f"{n_gen:,}", f"{n_critic:,}", asdict_flat(cfg),
        )

        # preemption tolerance: SIGTERM/SIGINT -> finish the iteration,
        # checkpoint, exit 0 (no-op off the main thread — tests/notebooks
        # driving main() off-thread get None back and nothing to restore)
        prev_handlers = install_preemption_handler(trainer)
        budget_timer = None
        if self.max_hours is not None:
            # wall-clock budget: measured from process start (self._t0), so
            # later folds inherit the remaining budget, not a fresh one.
            # Exhaustion BEFORE the fold was decided collectively at the top
            # of run_fold; if the budget ran out since (negative remaining),
            # the timer fires immediately. Timer skew across hosts is fine:
            # request_stop feeds the all-gathered _stop_due decision, so
            # every host still breaks at the same iteration boundary.
            remaining = self.max_hours * 3600.0 - (time.monotonic() - self._t0)
            budget_timer = threading.Timer(
                remaining,
                lambda: trainer.request_stop(
                    f"--max-hours {self.max_hours} budget reached"
                ),
            )
            budget_timer.daemon = True
            budget_timer.start()
        try:
            trainer.fit(train_loaders, val_loaders, profiler=self.profiler)
        finally:
            if budget_timer is not None:
                budget_timer.cancel()
            if prev_handlers:
                for signum, handler in prev_handlers.items():
                    signal.signal(signum, handler)
            if cfg.logger == "wandb":
                # close the fold's run: the next fold's wandb.init would
                # otherwise attach to (and merge into) this one
                try:
                    import wandb

                    if wandb.run is not None:
                        wandb.finish()
                except Exception:  # pragma: no cover
                    pass


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--conf", default=None,
                   help="preset name or python override file (see experiments/)")
    p.add_argument("--cval-splits", default=None,
                   help="pickle of {'train': [fold..], 'test': [fold..]}")
    p.add_argument("--checkpoint-root", default=None)
    p.add_argument("--run-id", default=None, help="resume/track under this id")
    p.add_argument("--starting-fold", type=int, default=0)
    p.add_argument("--max-folds", type=int, default=1)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--max-hours", type=float, default=None,
                   help="wall-clock budget: when it expires the trainer "
                        "finishes the iteration, checkpoints and exits 0 "
                        "(graceful stop) — resume later with the same "
                        "command; for bounded TPU reservations")
    p.add_argument("--checkpoint-keep", type=int, default=None,
                   help="keep only the newest N checkpoints (+ data "
                        "sidecars); default: keep all, like the reference")
    p.add_argument("--cycle-length", type=int, default=None,
                   help="schedule iterations fused per compiled program. "
                        "Omitted = AUTO (the production default): the "
                        "schedule period (5 for every preset) whenever all "
                        "log/val/checkpoint cadences divide it — the "
                        "4-critic+1-combined cycle dispatches as ONE "
                        "program (same math; K host round-trips -> 1). "
                        "1 forces per-iteration dispatch; K>1 forces K")
    p.add_argument(
        "--logger",
        choices=["wandb", "tensorboard", "file", "console", "none"],
        default=None,
    )
    p.add_argument("--dp-devices", type=int, default=None,
                   help="data-parallel over N devices (0 = all)")
    p.add_argument("--sp-devices", type=int, default=None,
                   help="additionally spatially partition each patch's first "
                        "dim over N devices (dp x sp mesh; oversized patches "
                        "train across chips via GSPMD conv halo exchange)")
    p.add_argument("--multihost", action="store_true",
                   help="join the multi-process JAX runtime before building "
                        "the mesh (run one train.py per TPU host; cluster "
                        "auto-detection on Cloud TPU pods). Each host then "
                        "samples only its fold shard and loads its share of "
                        "every batch (parallel/multihost.py)")
    p.add_argument("--wandb-project", default=None)
    p.add_argument("--wandb-entity", default=None)
    p.add_argument("--profiler-dir", default=None)
    p.add_argument("--profiler-steps", type=int, default=20,
                   help="trace the first N steps (shorthand schedule)")
    p.add_argument("--profiler-schedule", default=None,
                   help="'skip_first=500,active=10[,wait=..,warmup=..,repeat=..]' "
                        "— steady-state tracing past the pipeline warm-up "
                        "(reference train.py:39-47 schedule semantics)")
    p.add_argument("--debug", action="store_true",
                   help="enable jax_debug_nans (reference --debug anomaly mode; "
                        "see utils/debug.checkify_step for located errors)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.debug:
        jax.config.update("jax_debug_nans", True)
    if args.multihost:
        from contrast_gan_3d_tpu.parallel import multihost

        multihost.initialize()  # before any device query builds a backend

    cfg = load_config(args.conf)
    if (
        args.multihost
        and args.dp_devices is None
        and args.sp_devices is None
        and cfg.dp_devices is None
        and not cfg.sp_devices
    ):
        # --multihost implies a global mesh; default to data-parallel over
        # every device rather than N independent full-fold trainings
        logger.info("--multihost without a mesh config: defaulting --dp-devices 0")
        args.dp_devices = 0
    overrides = {}
    if args.iterations is not None:
        overrides["train_iterations"] = args.iterations
    if args.checkpoint_keep is not None:
        overrides["checkpoint_keep"] = args.checkpoint_keep
    if args.cycle_length is not None:
        overrides["cycle_length"] = args.cycle_length
    if args.logger is not None:
        overrides["logger"] = args.logger
    if args.dp_devices is not None:
        overrides["dp_devices"] = args.dp_devices
    if args.sp_devices is not None:
        overrides["sp_devices"] = args.sp_devices
        if args.dp_devices is None and cfg.dp_devices is None:
            overrides["dp_devices"] = 1  # pure spatial partitioning
    if overrides:
        cfg = replace(cfg, **overrides)

    if args.cval_splits:
        with open(args.cval_splits, "rb") as fd:
            splits = pickle.load(fd)
        train_folds, val_folds = splits["train"], splits["test"]
    elif cfg.dataset_paths:
        from contrast_gan_3d_tpu.data.labeling import cross_val_splits

        train_folds, val_folds = cross_val_splits(1, *cfg.dataset_paths, seed=cfg.seed)
    else:
        raise SystemExit("Provide --cval-splits or config dataset_paths")

    profiler = None
    if args.profiler_dir:
        profiler = (
            JaxProfiler.from_spec(args.profiler_dir, args.profiler_schedule)
            if args.profiler_schedule
            else JaxProfiler(args.profiler_dir, active=args.profiler_steps)
        )
    manager = TrainManager(
        cfg, train_folds, val_folds,
        checkpoint_root=Path(args.checkpoint_root) if args.checkpoint_root else paths.CHECKPOINTS_DIR,
        run_id=args.run_id,
        starting_fold=args.starting_fold,
        max_folds=args.max_folds,
        profiler=profiler,
        wandb_project=args.wandb_project,
        wandb_entity=args.wandb_entity,
        max_hours=args.max_hours,
    )
    manager()


if __name__ == "__main__":
    sys.exit(main())

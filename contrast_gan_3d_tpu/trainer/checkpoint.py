"""Checkpoint / resume for the full GAN train state.

Replaces the reference's ``torch.save`` state-dict checkpointing
(``trainer/Trainer.py:310-339``, ``trainer/utils.py:26-34``) with msgpack
serialization of the complete :class:`GANTrainState` pytree — generator AND
critic params/BatchNorm stats, both optimizer states, the PRNG key and the
iteration counter. The reference has a bug where the critic is silently never
checkpointed (it saves the attr ``discriminator`` but the field is named
``critic`` — Trainer.py:312-319 vs :89); here resume is exact by
construction. Writes are atomic (tmp + rename) and optionally asynchronous
(host thread — the device never blocks on disk).
"""

import json
import pickle
import re
import threading
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from contrast_gan_3d_tpu.utils.logging_utils import create_logger

logger = create_logger(name=__name__)

_CKPT_RE = re.compile(r"^(\d+)\.msgpack$")

# one in-flight async write per checkpoint directory: serializes writes (a
# periodic async save and the final synchronous save of the SAME step used
# to race on the tmp file), bounds memory to one pending blob, and gives a
# place to surface a failed background write instead of swallowing it
_inflight_lock = threading.Lock()
_inflight: Dict[str, threading.Thread] = {}
_inflight_errors: Dict[str, BaseException] = {}


def flush_async_saves(ckpt_dir) -> None:
    """Join any in-flight async checkpoint write for ``ckpt_dir`` and raise
    its error if it failed — call before relying on the checkpoint being on
    disk. ``save_checkpoint`` itself calls this first, so a failed periodic
    async write fails the run at the NEXT save instead of never."""
    key = str(Path(ckpt_dir))
    with _inflight_lock:
        t = _inflight.pop(key, None)
    if t is not None:
        t.join()
    with _inflight_lock:
        err = _inflight_errors.pop(key, None)
    if err is not None:
        raise RuntimeError(f"async checkpoint write under '{ckpt_dir}' failed") from err


def _unkey(state):
    """Typed PRNG keys are not msgpack-serializable; store the raw key data."""
    if jax.dtypes.issubdtype(state.rng.dtype, jax.dtypes.prng_key):
        return state.replace(rng=jax.random.key_data(state.rng))
    return state


def _rekey(state, template_rng):
    if jax.dtypes.issubdtype(template_rng.dtype, jax.dtypes.prng_key) and not jax.dtypes.issubdtype(state.rng.dtype, jax.dtypes.prng_key):
        impl = jax.random.key_impl(template_rng)
        return state.replace(rng=jax.random.wrap_key_data(state.rng, impl=impl))
    return state


def checkpoint_path(ckpt_dir, step: int) -> Path:
    return Path(ckpt_dir) / f"{int(step)}.msgpack"


def find_latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Highest-iteration ``<step>.msgpack`` in ``ckpt_dir`` (reference
    ``find_latest_checkpoint``, trainer/utils.py:26-34)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    best, best_step = None, -1
    for p in ckpt_dir.iterdir():
        m = _CKPT_RE.match(p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best


def meta_path(ckpt_dir, step: int) -> Path:
    return Path(ckpt_dir) / f"{int(step)}.meta.json"


def save_checkpoint(
    state,
    ckpt_dir,
    step: Optional[int] = None,
    keep: Optional[int] = None,
    async_: bool = False,
    meta: Optional[Dict] = None,
) -> Path:
    """Serialize ``state`` to ``<ckpt_dir>/<step>.msgpack`` atomically.

    ``keep``: retain only the newest N checkpoints. ``async_``: fetch to host
    synchronously (cheap) but write on a daemon thread. ``meta``: a small
    JSON-able dict written to ``<step>.meta.json`` — records model semantics
    the param tree cannot encode (e.g. the generator's ``tconv_placement``)
    so inference entry points rebuild the right module.
    """
    if keep is not None and keep <= 0:
        # ckpts[:-0] is an EMPTY slice — keep=0 would silently disable
        # pruning, the exact opposite of "retain only the newest 0"
        raise ValueError(f"keep must be a positive count, got {keep}")
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if step is None:
        step = int(jax.device_get(state.step))
    path = checkpoint_path(ckpt_dir, step)
    host_state = jax.device_get(_unkey(state))
    blob = serialization.to_bytes(host_state)
    # serialize against any previous in-flight write to this dir, and RAISE
    # its failure here: a run that cannot persist checkpoints (disk full,
    # permissions) must die at the next save, not train 10k iterations
    # believing its newest checkpoint exists (torch.save fails loudly too)
    flush_async_saves(ckpt_dir)
    dir_key = str(ckpt_dir)

    def _write():
        # unique tmp name: two writers of the same step must never share it
        tmp = path.with_name(f".{path.name}.{threading.get_ident()}.tmp")
        tmp.write_bytes(blob)
        tmp.rename(path)
        if meta is not None:  # atomic like the msgpack: never a torn sidecar
            mp = meta_path(ckpt_dir, step)
            mp_tmp = mp.with_suffix(".json.tmp")
            mp_tmp.write_text(json.dumps(meta, indent=1))
            mp_tmp.rename(mp)
        logger.info("Saved checkpoint '%s' (%.1f MB)", path, len(blob) / 2**20)
        if keep is not None:
            ckpts = sorted(
                (p for p in ckpt_dir.iterdir() if _CKPT_RE.match(p.name)),
                key=lambda p: int(p.stem),
            )
            for old in ckpts[:-keep]:
                old.unlink(missing_ok=True)
                # the sidecars of a pruned step are useless; the glob also
                # catches multi-host per-process files (<step>.data.hostN.pkl)
                for sidecar in old.parent.glob(f"{old.stem}.data*.pkl"):
                    sidecar.unlink(missing_ok=True)
                (old.parent / f"{old.stem}.meta.json").unlink(missing_ok=True)

    if async_:
        def _tracked_write():
            try:
                _write()
            except BaseException as e:  # surfaced at the next save/flush
                with _inflight_lock:
                    _inflight_errors[dir_key] = e
                logger.exception("async checkpoint write failed: %s", path)

        t = threading.Thread(target=_tracked_write, name=f"ckpt-{step}", daemon=True)
        with _inflight_lock:
            _inflight[dir_key] = t
        t.start()
    else:
        _write()
    return path


def load_checkpoint(path_or_dir, target=None) -> Any:
    """Restore a checkpoint. With ``target`` (a template GANTrainState of the
    right structure, e.g. from ``init_state``), returns the same type;
    without, returns the raw nested-dict payload."""
    path = Path(path_or_dir)
    if path.is_dir():
        latest = find_latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"No checkpoint found in {path}")
        path = latest
    blob = path.read_bytes()
    if target is not None:
        try:
            state = serialization.from_bytes(_unkey(target), blob)
        except Exception as e:
            diffs = _diff_structures(
                serialization.msgpack_restore(blob),
                serialization.to_state_dict(_unkey(target)),
            )
            detail = "\n  ".join(diffs[:25]) or f"(no structural diff found: {e})"
            raise CheckpointStructureError(
                f"Checkpoint '{path}' does not match the current model/optimizer "
                f"structure. Diverging subtrees:\n  {detail}\n"
                f"(total {len(diffs)} divergences; did the architecture, optimizer "
                f"or config change since the checkpoint was written?)"
            ) from e
        state = _rekey(state, target.rng)
        logger.info("Restored checkpoint '%s' @ step %d", path, int(state.step))
        return state
    return serialization.msgpack_restore(blob)


class CheckpointStructureError(RuntimeError):
    """A checkpoint's pytree structure diverges from the restore target."""


def _diff_structures(saved, target, path: str = "") -> list:
    """Name every subtree where a saved checkpoint dict and the target state
    dict diverge (missing/extra keys, mismatched shapes)."""
    out = []
    saved_is_dict = isinstance(saved, dict)
    target_is_dict = isinstance(target, dict)
    if saved_is_dict != target_is_dict:
        out.append(
            f"{path or '<root>'}: saved is "
            f"{'a subtree' if saved_is_dict else 'a leaf'}, target is "
            f"{'a subtree' if target_is_dict else 'a leaf'}"
        )
        return out
    if not saved_is_dict:
        s_shape = getattr(saved, "shape", None)
        t_shape = getattr(target, "shape", None)
        if s_shape != t_shape:
            out.append(f"{path}: saved shape {s_shape} != target shape {t_shape}")
        return out
    for k in sorted(set(saved) | set(target)):
        sub = f"{path}/{k}" if path else str(k)
        if k not in saved:
            out.append(f"{sub}: missing from checkpoint (new in target)")
        elif k not in target:
            out.append(f"{sub}: present in checkpoint but not in target")
        else:
            out.extend(_diff_structures(saved[k], target[k], sub))
    return out


def maybe_restore(state, ckpt_dir) -> Any:
    """Auto-resume from the latest checkpoint if one exists (reference
    Trainer.py:103-106), else return ``state`` unchanged."""
    latest = find_latest_checkpoint(ckpt_dir)
    if latest is None:
        return state
    return load_checkpoint(latest, target=state)


def data_state_path(ckpt_dir, step: int) -> Path:
    """Multi-host runs write one sidecar PER PROCESS (each host's sampler
    rngs/epoch order differ — host_fold_shard gives disjoint patients); the
    single-host name stays ``<step>.data.pkl`` for compatibility."""
    host = "" if jax.process_count() == 1 else f".host{jax.process_index()}"
    return Path(ckpt_dir) / f"{int(step)}.data{host}.pkl"


def save_data_state(loaders: Dict, ckpt_dir, step: int) -> Path:
    """Checkpoint the host data-stream state (per-loader sampler rngs +
    epoch order) alongside ``<step>.msgpack`` so a resumed run reproduces
    the batch sequence — the reference loses its augmenter-worker rngs on
    restart (non-resumable data stream). The payload records the process
    topology so an ELASTIC resume (different host count) is detected and
    starts fresh streams instead of replaying another shard's state."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "format": 2,
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "loaders": {label: loader.get_state() for label, loader in loaders.items()},
    }
    path = data_state_path(ckpt_dir, step)
    tmp = path.with_suffix(".pkl.tmp")
    tmp.write_bytes(pickle.dumps(payload))
    tmp.rename(path)
    return path


def maybe_restore_data_state(loaders: Dict, ckpt_dir, step: int) -> bool:
    """Restore loader states saved by :func:`save_data_state`; loaders must
    not be started yet. Returns True only when every loader's stream was
    restored exactly. Elastic resumes (the run topology or a loader's patient
    shard changed since the sidecar was written) log a warning and leave the
    affected streams fresh — the model state restores exactly either way;
    only the data-stream replay is necessarily different on a new shard."""
    path = data_state_path(ckpt_dir, step)
    if not path.exists():
        # a sidecar for this step written under a different process topology
        # (e.g. 2-host run resumed single-host) deserves an explicit note
        others = sorted(Path(ckpt_dir).glob(f"{int(step)}.data*.pkl"))
        if others:
            logger.warning(
                "No data-stream sidecar for this process at step %d, but %s "
                "exist — the run topology likely changed (or this process's "
                "sidecar write was lost); starting fresh data streams "
                "(model state still restores exactly)",
                int(step), [p.name for p in others],
            )
        return False
    payload = pickle.loads(path.read_bytes())
    if isinstance(payload, dict) and payload.get("format") == 2:
        saved_pc = payload["process_count"]
        if saved_pc != jax.process_count():
            logger.warning(
                "Data-stream sidecar '%s' was written by a %d-process run; "
                "this run has %d processes — fold shards differ, starting "
                "fresh data streams (model state still restores exactly)",
                path, saved_pc, jax.process_count(),
            )
            return False
        states = payload["loaders"]
    else:  # pre-format-2 sidecar: bare {label: state}
        states = payload
    missing = sorted(set(loaders) - set(states))
    if missing:
        # the reverse of the label check below: a loader present NOW with no
        # saved stream (e.g. a stream added since the sidecar was written)
        # must not be silently left fresh under a "Restored" claim
        logger.warning(
            "Data-stream sidecar '%s' has no saved state for loaders %s — "
            "those streams start fresh (the others restore exactly)",
            path, missing,
        )
    stale = []
    for label, state in states.items():
        if label not in loaders:
            continue
        try:
            loaders[label].set_state(state)
        except ValueError as e:  # saved for a different patient shard
            stale.append((label, str(e)))
    if stale:
        logger.warning(
            "Data-stream sidecar '%s' does not match the current patient "
            "shards — streams %s start fresh: %s",
            path, [label for label, _ in stale], stale[0][1],
        )
        return False
    if missing:
        return False
    logger.info("Restored data-stream state '%s'", path)
    return True


def load_generator(ckpt_dir_or_file, iteration: Optional[int] = None) -> Dict:
    """Extract only what inference needs (reference eval loads
    ``ckpt["generator"]`` — CCTAContrastCorrector.py:55-56): generator params,
    BatchNorm stats, the step, and the meta sidecar (model semantics such as
    ``tconv_placement``) when one was written."""
    path = Path(ckpt_dir_or_file)
    if path.is_dir():
        path = (
            checkpoint_path(path, iteration)
            if iteration is not None
            else find_latest_checkpoint(path)
        )
        if path is None or not path.exists():
            raise FileNotFoundError(f"No checkpoint in {ckpt_dir_or_file}")
    raw = serialization.msgpack_restore(path.read_bytes())
    meta_file = path.parent / f"{path.stem}.meta.json"
    return {
        "params": raw["gen_params"],
        "stats": raw.get("gen_stats") or None,
        "step": int(np.asarray(raw["step"])),
        "meta": json.loads(meta_file.read_text()) if meta_file.is_file() else {},
    }

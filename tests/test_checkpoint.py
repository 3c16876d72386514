"""Checkpoint / resume round-trip tests (reference capability:
trainer/Trainer.py:310-339 + trainer/utils.py:26-34 — including the critic,
which the reference silently failed to checkpoint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
from contrast_gan_3d_tpu.models.generator import ResnetGenerator
from contrast_gan_3d_tpu.trainer import checkpoint as ckpt_lib
from contrast_gan_3d_tpu.trainer.optim import make_optimizer
from contrast_gan_3d_tpu.trainer.steps import init_state

PATCH = (8, 8, 8)


@pytest.fixture(scope="module")
def tiny_state():
    gen = ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2)
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer(lr=1e-3)
    return init_state(gen, critic, tx, tx, jax.random.key(0), PATCH)


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_load_roundtrip(tiny_state, tmp_path):
    state = tiny_state.replace(step=jnp.int32(123))
    path = ckpt_lib.save_checkpoint(state, tmp_path)
    assert path.name == "123.msgpack"
    restored = ckpt_lib.load_checkpoint(tmp_path, target=tiny_state)
    assert int(restored.step) == 123
    _tree_equal(restored.gen_params, state.gen_params)
    _tree_equal(restored.critic_params, state.critic_params)  # critic saved!
    _tree_equal(restored.gen_opt, state.gen_opt)


def test_find_latest(tiny_state, tmp_path):
    for step in [100, 2000, 900]:
        ckpt_lib.save_checkpoint(tiny_state.replace(step=jnp.int32(step)), tmp_path)
    assert ckpt_lib.find_latest_checkpoint(tmp_path).name == "2000.msgpack"
    assert ckpt_lib.find_latest_checkpoint(tmp_path / "nope") is None


def test_keep_limit(tiny_state, tmp_path):
    for step in [1, 2, 3, 4]:
        ckpt_lib.save_checkpoint(
            tiny_state.replace(step=jnp.int32(step)), tmp_path, keep=2
        )
    names = sorted(p.name for p in tmp_path.glob("*.msgpack"))
    assert names == ["3.msgpack", "4.msgpack"]


def test_maybe_restore_no_checkpoint(tiny_state, tmp_path):
    out = ckpt_lib.maybe_restore(tiny_state, tmp_path / "empty")
    assert out is tiny_state


def test_load_generator_payload(tiny_state, tmp_path):
    ckpt_lib.save_checkpoint(tiny_state.replace(step=jnp.int32(7)), tmp_path)
    payload = ckpt_lib.load_generator(tmp_path)
    assert payload["step"] == 7
    _tree_equal(payload["params"], tiny_state.gen_params)


def test_structure_mismatch_names_diverging_subtree(tmp_path):
    """Restoring into a different architecture raises an actionable error
    naming the diverging subtrees, not an opaque flax deserialization one."""
    import pytest

    from contrast_gan_3d_tpu.models.discriminator import PatchGANDiscriminator
    from contrast_gan_3d_tpu.models.generator import ResnetGenerator
    from contrast_gan_3d_tpu.trainer.optim import make_optimizer
    from contrast_gan_3d_tpu.trainer.steps import init_state

    tx = make_optimizer()
    small = init_state(
        ResnetGenerator(n_resnet_blocks=1, n_updownsample_blocks=1, init_channels_out=2),
        PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1),
        tx, tx, jax.random.key(0), (8, 8, 8),
    )
    big = init_state(
        ResnetGenerator(n_resnet_blocks=2, n_updownsample_blocks=1, init_channels_out=4),
        PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1),
        tx, tx, jax.random.key(0), (8, 8, 8),
    )
    path = ckpt_lib.save_checkpoint(small, tmp_path, step=7)
    with pytest.raises(ckpt_lib.CheckpointStructureError) as exc:
        ckpt_lib.load_checkpoint(path, target=big)
    msg = str(exc.value)
    assert "resnet_1" in msg  # the new block is named
    assert "shape" in msg or "missing" in msg


def test_data_state_sidecar_roundtrip(tmp_path, rng):
    """save_data_state/maybe_restore_data_state reproduce the loader's batch
    sequence bitwise across a save/restore boundary."""
    from tests.synth import make_dataset

    from contrast_gan_3d_tpu.data.pipeline import PrefetchLoader
    from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler

    fold = make_dataset(tmp_path, rng, n_per_label=1)
    paths = [p for p, _ in fold]

    def mk(seed):
        s = CCTAPatchSampler(
            paths, (8, 8, 8), 2, rng=np.random.default_rng(seed)
        )
        return PrefetchLoader(s, num_threads=1, prefetch=1, to_device=False)

    a = mk(3)
    for _ in range(3):
        a.sampler.next_batch()  # advance the stream (quiescent: no threads)
    ckpt_lib.save_data_state({0: a}, tmp_path / "ck", step=5)
    expected = [a.sampler.next_batch() for _ in range(4)]

    b = mk(999)  # totally different rng
    assert ckpt_lib.maybe_restore_data_state({0: b}, tmp_path / "ck", step=5)
    got = [b.sampler.next_batch() for _ in range(4)]
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e["data"], g["data"])
        np.testing.assert_array_equal(e["seg"], g["seg"])
        assert e["path"] == g["path"]
    assert not ckpt_lib.maybe_restore_data_state({0: b}, tmp_path / "ck", step=6)


def test_data_state_elastic_resume(tmp_path, rng):
    """Elastic resumes are detected, warned about, and start fresh streams
    instead of silently replaying another shard's state."""
    import pickle

    from tests.synth import make_dataset

    from contrast_gan_3d_tpu.data.pipeline import PrefetchLoader
    from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler

    fold = make_dataset(tmp_path, rng, n_per_label=2)
    paths = [p for p, _ in fold]

    def mk(subset, seed=3):
        s = CCTAPatchSampler(subset, (8, 8, 8), 2, rng=np.random.default_rng(seed))
        return PrefetchLoader(s, num_threads=1, prefetch=1, to_device=False)

    ck = tmp_path / "ck"
    a = mk(paths)
    a.sampler.next_batch()
    ckpt_lib.save_data_state({0: a}, ck, step=5)

    # the sampler itself refuses a state saved for a different patient list
    other = CCTAPatchSampler(paths[:3], (8, 8, 8), 2)
    with pytest.raises(ValueError, match="different patient list"):
        other.set_state(a.sampler.get_state())

    # checkpoint layer: shard changed (e.g. resharded fold) -> fresh stream,
    # restore reports False, loader rng untouched
    b = mk(paths[:3], seed=999)
    before = b.sampler.rng.bit_generator.state
    assert not ckpt_lib.maybe_restore_data_state({0: b}, ck, step=5)
    assert b.sampler.rng.bit_generator.state == before

    # process-count change recorded in the payload -> fresh stream
    sidecar = ckpt_lib.data_state_path(ck, 5)
    payload = pickle.loads(sidecar.read_bytes())
    assert payload["format"] == 2 and payload["process_count"] == 1
    payload["process_count"] = 4
    sidecar.write_bytes(pickle.dumps(payload))
    c = mk(paths)
    assert not ckpt_lib.maybe_restore_data_state({0: c}, ck, step=5)

    # pre-format-2 sidecars (bare {label: state}) still restore
    flat = {0: a.sampler.get_state()}
    sidecar.write_bytes(pickle.dumps(flat))
    d = mk(paths, seed=999)
    assert ckpt_lib.maybe_restore_data_state({0: d}, ck, step=5)
    np.testing.assert_array_equal(
        a.sampler.next_batch()["data"], d.sampler.next_batch()["data"]
    )


def test_keep_prunes_multihost_data_sidecars(tiny_state, tmp_path):
    """checkpoint_keep pruning removes per-host data sidecars too (a long
    multi-host run must not accumulate <step>.data.hostN.pkl files)."""
    state = tiny_state
    for step in (1, 2):
        for name in (f"{step}.data.pkl", f"{step}.data.host0.pkl", f"{step}.data.host1.pkl"):
            (tmp_path / name).parent.mkdir(parents=True, exist_ok=True)
            (tmp_path / name).write_bytes(b"x")
        ckpt_lib.save_checkpoint(state, tmp_path, step=step, keep=1)
    names = {p.name for p in tmp_path.iterdir()}
    assert "2.msgpack" in names and "1.msgpack" not in names
    assert not any(n.startswith("1.data") for n in names), names
    assert {"2.data.pkl", "2.data.host0.pkl", "2.data.host1.pkl"} <= names


def test_sampler_state_with_augmenter_roundtrip(tmp_path, rng):
    """The augmenter rng is part of the stream state: identical augmented
    batches after restore."""
    from tests.synth import make_dataset

    from contrast_gan_3d_tpu import native
    from contrast_gan_3d_tpu.data.augment import AugmentConfig
    from contrast_gan_3d_tpu.data.host_augment import HostAugmenter
    from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler

    if not native.has_native():
        import pytest

        pytest.skip("no native lib")
    fold = make_dataset(tmp_path, rng, n_per_label=1)
    paths = [p for p, _ in fold]
    aug = HostAugmenter(
        AugmentConfig(p_elastic=1.0, p_scale=1.0, p_rotation=1.0, elastic_grid=4),
        np.random.default_rng(7),
    )
    s = CCTAPatchSampler(
        paths, (8, 8, 8), 2, rng=np.random.default_rng(3), augmenter=aug
    )
    s.next_batch()
    state = s.get_state()
    want = s.next_batch()
    s.set_state(state)
    got = s.next_batch()
    np.testing.assert_array_equal(want["data"], got["data"])
    np.testing.assert_array_equal(want["seg"], got["seg"])


def test_meta_sidecar_and_auto_derived_corrector(tmp_path):
    """from_checkpoint with no explicit module rebuilds a NON-default
    generator: architecture from the param tree, tconv_placement/norm from
    the <step>.meta.json sidecar — a torch-imported or custom-arch checkpoint
    corrects without the caller reciting construction flags."""
    gen = ResnetGenerator(
        n_resnet_blocks=2, n_updownsample_blocks=1, init_channels_out=4,
        tconv_placement="torch",
    )
    critic = PatchGANDiscriminator(init_channels_out=2, discriminator_depth=1)
    tx = make_optimizer()
    state = init_state(gen, critic, tx, tx, jax.random.key(1), PATCH)
    ckpt_lib.save_checkpoint(
        state, tmp_path, step=5,
        meta={"generator": {"tconv_placement": "torch", "norm": "batch"}},
    )
    payload = ckpt_lib.load_generator(tmp_path)
    assert payload["meta"]["generator"]["tconv_placement"] == "torch"

    from contrast_gan_3d_tpu.eval.corrector import CCTAContrastCorrector

    corr = CCTAContrastCorrector.from_checkpoint(
        tmp_path, inference_patch_size=PATCH, batch_size=2
    )
    g = corr.generator
    assert (g.n_resnet_blocks, g.n_updownsample_blocks, g.init_channels_out,
            g.ndim, g.tconv_placement) == (2, 1, 4, 3, "torch")
    # the derived module accepts the checkpoint's params end-to-end
    out = np.asarray(corr(np.zeros((8, 8, 10), np.int16)))
    assert out.shape == (8, 8, 10) and np.isfinite(out).all()


def test_keep_limit_prunes_meta_sidecars(tiny_state, tmp_path):
    for step in [1, 2, 3]:
        ckpt_lib.save_checkpoint(
            tiny_state.replace(step=jnp.int32(step)), tmp_path, keep=1,
            meta={"generator": {"tconv_placement": "same"}},
        )
    assert sorted(p.name for p in tmp_path.glob("*.meta.json")) == ["3.meta.json"]


def test_keep_zero_rejected(tiny_state, tmp_path):
    """keep=0 would evaluate ckpts[:-0] == [] and silently disable pruning —
    the opposite of the requested retention; it must be a loud error."""
    import pytest

    with pytest.raises(ValueError, match="keep"):
        ckpt_lib.save_checkpoint(tiny_state, tmp_path, step=1, keep=0)


def test_async_then_sync_same_step(tiny_state, tmp_path):
    """The last periodic ASYNC save and the final SYNC save can target the
    same step (trainer.fit does exactly this when the schedule aligns): the
    writes serialize on unique tmp files and the checkpoint loads."""
    ckpt_lib.save_checkpoint(tiny_state, tmp_path, step=7, async_=True)
    ckpt_lib.save_checkpoint(tiny_state, tmp_path, step=7)  # joins the async
    restored = ckpt_lib.load_checkpoint(tmp_path, target=tiny_state)
    assert int(restored.step) == int(tiny_state.step)
    ckpt_lib.flush_async_saves(tmp_path)  # nothing pending, no raise


def test_async_write_failure_surfaces(tiny_state, tmp_path, monkeypatch):
    """A failed background checkpoint write must surface (flush raises, and
    the NEXT save raises too) instead of training on believing checkpoints
    exist."""
    import pytest

    from pathlib import Path

    target = tmp_path / "ck"
    target.mkdir()

    real_write_bytes = Path.write_bytes

    def boom(self, data):
        if self.name.endswith(".tmp") and "ck" in str(self.parent):
            raise OSError(28, "No space left on device")
        return real_write_bytes(self, data)

    monkeypatch.setattr(Path, "write_bytes", boom)
    ckpt_lib.save_checkpoint(tiny_state, target, step=3, async_=True)
    with pytest.raises(RuntimeError, match="async checkpoint write"):
        ckpt_lib.flush_async_saves(target)
    monkeypatch.undo()
    # the error was surfaced (popped): a later save works
    ckpt_lib.save_checkpoint(tiny_state, target, step=4)
    assert (target / "4.msgpack").exists()

    # un-flushed variant: the failure must surface AT the next save call
    # (save's internal flush joins the failed writer, so no undo race)
    monkeypatch.setattr(Path, "write_bytes", boom)
    ckpt_lib.save_checkpoint(tiny_state, target, step=5, async_=True)
    with pytest.raises(RuntimeError, match="async checkpoint write"):
        ckpt_lib.save_checkpoint(tiny_state, target, step=6)
    monkeypatch.undo()
    # surfaced once; saving again proceeds
    ckpt_lib.save_checkpoint(tiny_state, target, step=7)
    assert (target / "7.msgpack").exists()


def test_restore_warns_on_loader_without_saved_state(tmp_path, rng):
    """A loader present NOW with no stream in the sidecar must not be
    silently left fresh under a True/'Restored' claim."""
    from tests.synth import make_dataset
    from contrast_gan_3d_tpu.data.sampler import CCTAPatchSampler

    fold = make_dataset(tmp_path, rng, n_per_label=1, labels=(0,))
    paths = [p for p, _ in fold]

    def mk():
        return CCTAPatchSampler(paths, (8, 8, 8), 1, rng=np.random.default_rng(0))

    ckpt_lib.save_data_state({0: mk()}, tmp_path / "ck", step=2)
    loaders = {0: mk(), 1: mk()}  # loader 1 has no saved stream
    ok = ckpt_lib.maybe_restore_data_state(loaders, tmp_path / "ck", step=2)
    assert ok is False

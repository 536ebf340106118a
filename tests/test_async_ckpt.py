"""Background checkpoint writes (sisr_tpu/utils/async_ckpt.py).

The reference saves the full state synchronously every epoch (ref:
Code/SISR/models/__init__.py:349-380 driven by train_model.py's loop); our default is
the same every-epoch contract with the fetch+write moved off the epoch loop.  These
tests pin the correctness edges: ordering, fence-time error propagation, bit-exactness
vs the synchronous path, and survival of the next step's buffer donation.
"""
import os
import time

import numpy as np
import pytest

from sisr_tpu.utils.async_ckpt import AsyncCheckpointWriter, atomic_write_bytes


def test_writer_orders_same_path_writes(tmp_path):
    w = AsyncCheckpointWriter()
    path = str(tmp_path / 'ckpt')

    def job(i):
        def _run():
            time.sleep(0.02)
            atomic_write_bytes(path, b'payload-%d' % i)
        return _run

    for i in range(4):
        w.submit(path, job(i))
    assert path in w.pending_paths
    w.wait()
    assert w.pending_paths == []
    with open(path, 'rb') as f:
        assert f.read() == b'payload-3'  # last submission wins, never reordered


def test_writer_backpressure_bounds_the_queue(tmp_path):
    """submit() blocks while max_pending saves are in flight: every queued save pins
    its device snapshot in HBM, so unbounded backlog (epochs outpacing the tunnel
    drain) would OOM the chip on a long run."""
    w = AsyncCheckpointWriter(max_pending=2)
    path = str(tmp_path / 'ckpt')
    high_water = []

    def job(i):
        def _run():
            with w._lock:
                high_water.append(len([1 for _, f in w._pending if not f.done()]))
            time.sleep(0.05)
            atomic_write_bytes(path, b'p%d' % i)
        return _run

    for i in range(6):
        w.submit(path, job(i))
    w.wait()
    assert max(high_water) <= 2
    with open(path, 'rb') as f:
        assert f.read() == b'p5'


def test_writer_raises_failure_at_fence(tmp_path):
    w = AsyncCheckpointWriter()

    def boom():
        raise OSError('disk full')

    w.submit(str(tmp_path / 'x'), boom)
    with pytest.raises(RuntimeError, match='background checkpoint write'):
        w.wait()
    w.wait()  # error is consumed; the writer stays usable


def test_writer_reports_every_failure_at_fence(tmp_path, capsys):
    """Two queued writes both fail: the fence raises the FIRST and prints the
    rest — the operator must learn that more than one epoch is missing."""
    w = AsyncCheckpointWriter()

    def boom(msg):
        def _run():
            time.sleep(0.1)  # keep 'a' in flight while 'b' is submitted
            raise OSError(msg)
        return _run

    w.submit(str(tmp_path / 'a'), boom('disk full'))
    w.submit(str(tmp_path / 'b'), boom('permission denied'))
    with pytest.raises(RuntimeError, match="write of .*a.* failed"):
        w.wait()
    assert 'also failed' in capsys.readouterr().err
    w.wait()  # all failures consumed; the writer stays usable


def test_crash_leftover_tmp_does_not_break_cleanup(tmp_path):
    """A tmp file left by a killed mid-write process must not match the
    train_model_* glob (dot-prefixed name), and cleanup must skip any stray
    unparsable file rather than crash on int()."""
    import pandas as pd
    from sisr_tpu.tools.helper_cli import clean_models
    from sisr_tpu.utils import async_ckpt

    (tmp_path / 'saved_models').mkdir()
    (tmp_path / 'result_outputs').mkdir()
    for i in range(4):
        (tmp_path / 'saved_models' / ('train_model_%d' % i)).write_bytes(b'x')
    pd.DataFrame({'epoch': range(4), 'val-PSNR': [1.0, 4.0, 2.0, 3.0]}).to_csv(
        tmp_path / 'result_outputs' / 'summary.csv', index=False)

    # the writer's own tmp naming is dot-prefixed (glob-invisible)
    target = str(tmp_path / 'saved_models' / 'train_model_9')
    seen = {}
    orig_replace = os.replace

    def spy(src, dst):
        seen['tmp'] = os.path.basename(src)
        orig_replace(src, dst)
    async_ckpt.os.replace, _saved = spy, async_ckpt.os.replace
    try:
        async_ckpt.atomic_write_bytes(target, b'payload')
    finally:
        async_ckpt.os.replace = _saved
    assert seen['tmp'].startswith('.tmp-')
    os.remove(target)

    # a stray unparsable file in the glob is skipped, not int()-crashed on
    stray = tmp_path / 'saved_models' / 'train_model_5.tmp-old'
    stray.write_bytes(b'partial')
    clean_models(str(tmp_path))
    assert stray.exists()  # left alone
    assert (tmp_path / 'saved_models' / 'train_model_1').exists()  # best kept


def test_best_epoch_resolution_skips_missing_checkpoints(tmp_path, capsys):
    """summary.csv rows are written before the background write is durable: if
    the best epoch's checkpoint never landed, 'best' resolution falls back to
    the best epoch that exists on disk (with a warning) instead of crashing."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.models.interface import ModelInterface
    import pandas as pd
    from sisr_tpu.utils import toml_io

    exp = tmp_path / 'exp'
    (exp / 'saved_models').mkdir(parents=True)
    (exp / 'result_outputs').mkdir()
    with open(exp / 'config.toml', 'w') as f:
        toml_io.dump({'model': {'name': 'edsr', 'internal_params':
                                {'scale': 4, 'net_features': 8, 'num_blocks': 1}}}, f)
    h = define_model('edsr', scale=4, net_features=8, num_blocks=1)
    h.init_state()
    for i in range(3):
        h.set_epoch(i)
        h.save_model('train_model', i, str(exp / 'saved_models'))
    h.wait_pending_checkpoints()
    pd.DataFrame({'epoch': [0, 1, 2], 'val-PSNR': [1.0, 9.0, 5.0]}).to_csv(
        exp / 'result_outputs' / 'summary.csv', index=False)
    os.remove(exp / 'saved_models' / 'train_model_1')  # the "best" never landed

    iface = ModelInterface(str(tmp_path), 'exp', mode='eval', load_epoch='best')
    assert iface.model_epoch == 2  # next-best existing epoch
    assert 'no checkpoint on disk' in capsys.readouterr().out


def test_wait_timeout_bounds_the_drain(tmp_path):
    """wait(timeout=...) raises TimeoutError instead of hanging on a wedged
    write (the failure-path drain must never bury the root-cause traceback)."""
    import threading
    w = AsyncCheckpointWriter()
    release = threading.Event()
    w.submit(str(tmp_path / 'slow'), release.wait)
    with pytest.raises(TimeoutError, match='still pending'):
        w.wait(timeout=0.2)
    release.set()
    w.wait()  # unbounded drain completes once the write finishes


def test_sweep_reclaims_stale_tmp_only(tmp_path):
    """atomic_write_bytes sweeps crash-leftover '.tmp-<pid>-<base>' siblings
    older than the age bound; fresh ones (live writers) survive."""
    from sisr_tpu.utils.async_ckpt import atomic_write_bytes

    stale = tmp_path / '.tmp-111-train_model_3'
    stale.write_bytes(b'orphan')
    old = time.time() - 7200
    os.utime(stale, (old, old))
    fresh = tmp_path / '.tmp-222-train_model_3'
    fresh.write_bytes(b'inflight')
    other = tmp_path / '.tmp-111-train_model_4'  # different checkpoint: untouched
    other.write_bytes(b'orphan')
    os.utime(other, (old, old))

    atomic_write_bytes(str(tmp_path / 'train_model_3'), b'payload')
    assert not stale.exists()
    assert fresh.exists()
    assert other.exists()
    with open(tmp_path / 'train_model_3', 'rb') as f:
        assert f.read() == b'payload'


def test_best_resolution_fences_pending_writes(tmp_path, monkeypatch):
    """ModelInterface(load_epoch='best') must fence BEFORE walking the disk for
    checkpoints: a still-in-flight write of the best epoch would otherwise make
    it silently resolve to a worse epoch."""
    import pandas as pd
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.models.interface import ModelInterface
    from sisr_tpu.utils import async_ckpt, toml_io

    exp = tmp_path / 'exp'
    (exp / 'saved_models').mkdir(parents=True)
    (exp / 'result_outputs').mkdir()
    with open(exp / 'config.toml', 'w') as f:
        toml_io.dump({'model': {'name': 'edsr', 'internal_params':
                                {'scale': 4, 'net_features': 8, 'num_blocks': 1}}}, f)
    h = define_model('edsr', scale=4, net_features=8, num_blocks=1)
    h.init_state()
    h.save_model('train_model', 0, str(exp / 'saved_models'))
    h.wait_pending_checkpoints()

    orig = async_ckpt.atomic_write_bytes

    def slow_write(path, payload):
        time.sleep(0.4)
        orig(path, payload)
    monkeypatch.setattr(async_ckpt, 'atomic_write_bytes', slow_write)
    h.set_epoch(1)
    h.save_model('train_model', 1, str(exp / 'saved_models'))  # the best, in flight
    pd.DataFrame({'epoch': [0, 1], 'val-PSNR': [1.0, 9.0]}).to_csv(
        exp / 'result_outputs' / 'summary.csv', index=False)

    iface = ModelInterface(str(tmp_path), 'exp', mode='eval', load_epoch='best')
    assert iface.model_epoch == 1  # waited for the in-flight write, not epoch 0


def test_async_save_bitexact_vs_sync(tmp_path):
    from sisr_tpu.models.handlers import define_model

    batch = {'lr': np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32),
             'hr': np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)}
    h = define_model('edsr', scale=4, net_features=8, num_blocks=1)  # async default
    assert h.async_checkpoint
    h.run_train(**batch)
    (tmp_path / 'a').mkdir()
    (tmp_path / 'b').mkdir()
    h.save_model('train_model', 0, str(tmp_path / 'a'))
    h.wait_pending_checkpoints()

    h.async_checkpoint = False
    h.save_model('train_model', 0, str(tmp_path / 'b'))

    with open(tmp_path / 'a' / 'train_model_0', 'rb') as f:
        async_bytes = f.read()
    with open(tmp_path / 'b' / 'train_model_0', 'rb') as f:
        assert async_bytes == f.read()


def test_async_save_survives_donated_train_steps(tmp_path):
    """The train step donates its state buffers; a background save racing the next
    epoch's first step must still write the state AS OF the save call (save_model
    snapshots into fresh on-device buffers before the donated arrays are deleted)."""
    from sisr_tpu.models.handlers import define_model
    import jax

    h = define_model('edsr', scale=4, net_features=8, num_blocks=1)
    rng = np.random.RandomState(2)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 32, 32, 3).astype(np.float32)}
    h.run_train(**batch)
    expect = [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(h.state.params)]

    h.save_model('train_model', 0, str(tmp_path))
    for _ in range(3):  # donated steps delete the previous state's buffers
        h.run_train(**batch)
    h.wait_pending_checkpoints()

    h2 = define_model('edsr', scale=4, net_features=8, num_blocks=1, eval_mode=True)
    h2.load_model('train_model', 0, str(tmp_path))
    got = [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(h2.state.params)]
    for a, b in zip(expect, got):
        np.testing.assert_array_equal(a, b)


def test_pending_path_trips_the_overwrite_guard(tmp_path, monkeypatch):
    """ModelInterface.save refuses override=False while a write to the same path is
    still in flight (disk-existence alone would miss it)."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.models.interface import ModelInterface
    from sisr_tpu.utils import async_ckpt

    h = define_model('edsr', scale=4, net_features=8, num_blocks=1)
    h.init_state()
    orig = async_ckpt.atomic_write_bytes

    def slow_write(path, payload):
        time.sleep(0.3)
        orig(path, payload)
    monkeypatch.setattr(async_ckpt, 'atomic_write_bytes', slow_write)

    iface = ModelInterface.__new__(ModelInterface)  # bypass dir/experiment plumbing
    iface.model = h
    iface.saved_models = str(tmp_path)
    iface.model_epoch = 0
    h.save_model('train_model', 0, str(tmp_path))
    assert os.path.join(str(tmp_path), 'train_model_0') in h.pending_checkpoint_paths()
    with pytest.raises(RuntimeError, match='overwriting existing'):
        iface.save('train_model', override=False)
    h.wait_pending_checkpoints()


def test_bf16_moments_checkpoint_roundtrip(tmp_path):
    """checkpoint_dtype='bf16_moments': Adam moments land on disk as bfloat16 (2/3
    of the state bytes halved — the device->host transfer is what a remote tunnel
    charges for), params stay exact, and load casts the moments back to the
    optimizer template's dtypes so training resumes at full precision."""
    import jax
    import jax.numpy as jnp
    from sisr_tpu.models.handlers import define_model
    from flax import serialization

    h = define_model('edsr', scale=4, net_features=8, num_blocks=1,
                     checkpoint_dtype='bf16_moments')
    rng = np.random.RandomState(3)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 32, 32, 3).astype(np.float32)}
    h.run_train(**batch)
    h.save_model('train_model', 0, str(tmp_path))
    h.wait_pending_checkpoints()

    with open(tmp_path / 'train_model_0', 'rb') as f:
        on_disk = serialization.msgpack_restore(f.read())
    disk_dtypes = {np.dtype(leaf.dtype).name
                   for leaf in jax.tree_util.tree_leaves(on_disk['optimizer'])
                   if hasattr(leaf, 'dtype') and jnp.issubdtype(leaf.dtype, jnp.inexact)}
    assert disk_dtypes == {'bfloat16'}
    net_dtypes = {np.dtype(leaf.dtype).name
                  for leaf in jax.tree_util.tree_leaves(on_disk['network'])}
    assert 'bfloat16' not in net_dtypes  # params are never narrowed

    h2 = define_model('edsr', scale=4, net_features=8, num_blocks=1)
    h2.load_model('train_model', 0, str(tmp_path))
    for tmpl, got in zip(jax.tree_util.tree_leaves(h.state.opt_state),
                         jax.tree_util.tree_leaves(h2.state.opt_state)):
        assert got.dtype == tmpl.dtype  # cast back to the live template's dtypes
        np.testing.assert_allclose(np.asarray(tmpl, np.float32),
                                   np.asarray(got, np.float32),
                                   rtol=1 / 128, atol=1e-6)  # bf16 rounding only
    for a, b in zip(jax.tree_util.tree_leaves(h.state.params),
                    jax.tree_util.tree_leaves(h2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    h2.run_train(**batch)  # resumed training steps at the template dtypes


def test_bf16_moments_roundtrip_orbax_backend(tmp_path):
    """The narrow-moments cast happens before the backend split, so orbax
    directory checkpoints carry bf16 moments too and restore to template dtypes."""
    import jax
    from sisr_tpu.models.handlers import define_model

    h = define_model('edsr', scale=4, net_features=8, num_blocks=1,
                     checkpoint_dtype='bf16_moments', checkpoint_backend='orbax')
    rng = np.random.RandomState(4)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 32, 32, 3).astype(np.float32)}
    h.run_train(**batch)
    h.save_model('train_model', 0, str(tmp_path))
    h.wait_pending_checkpoints()
    assert os.path.isdir(tmp_path / 'train_model_0')

    h2 = define_model('edsr', scale=4, net_features=8, num_blocks=1)
    h2.load_model('train_model', 0, str(tmp_path))
    for tmpl, got in zip(jax.tree_util.tree_leaves(h.state.opt_state),
                         jax.tree_util.tree_leaves(h2.state.opt_state)):
        assert got.dtype == tmpl.dtype
        np.testing.assert_allclose(np.asarray(tmpl, np.float32),
                                   np.asarray(got, np.float32),
                                   rtol=1 / 128, atol=1e-6)


def test_checkpoint_dtype_validation():
    from sisr_tpu.models.handlers import define_model
    with pytest.raises(ValueError, match='checkpoint_dtype'):
        define_model('edsr', scale=4, net_features=8, num_blocks=1,
                     checkpoint_dtype='fp8')


def test_sync_mode_writes_before_returning(tmp_path):
    from sisr_tpu.models.handlers import define_model

    h = define_model('edsr', scale=4, net_features=8, num_blocks=1,
                     async_checkpoint=False)
    h.init_state()
    h.save_model('train_model', 0, str(tmp_path))
    assert os.path.isfile(tmp_path / 'train_model_0')
    h.wait_pending_checkpoints()  # no-op without a writer

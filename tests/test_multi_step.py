"""Fused multi-step training (lax.scan over K optimizer steps in one dispatch)."""
import numpy as np
import pytest

import jax

from sisr_tpu.models.handlers import define_model

pytestmark = pytest.mark.slow


def _batches(rng, k=4, b=2):
    return [{'lr': rng.rand(b, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(b, 16, 16, 3).astype(np.float32)} for _ in range(k)]


def test_multi_step_matches_sequential_single_steps():
    rng = np.random.RandomState(0)
    batches = _batches(rng)

    h1 = define_model('edsr', num_features=8, num_blocks=1, scale=2, lr=1e-3)
    h1.set_metadata_keys([])
    losses_single = [float(h1.run_train(**b)[0]) for b in batches]

    h2 = define_model('edsr', num_features=8, num_blocks=1, scale=2, lr=1e-3)
    h2.set_metadata_keys([])
    losses_multi = h2.run_train_multi(batches)

    np.testing.assert_allclose(losses_multi, losses_single, rtol=2e-5)
    assert int(h2.state.step) == 4
    for a, b in zip(jax.tree.leaves(h1.state.params), jax.tree.leaves(h2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multi_step_with_metadata():
    rng = np.random.RandomState(1)
    h = define_model('qrcan', scale=2, n_feats=16, n_resblocks=1, n_resgroups=1,
                     style='max_concat', include_q_layer=True,
                     metadata=['blur_kernel'], lr=1e-4)
    h.set_metadata_keys(['blur_kernel'] * 10)
    batches = [{'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
                'hr': rng.rand(2, 16, 16, 3).astype(np.float32),
                'metadata': rng.rand(2, 10).astype(np.float32)} for _ in range(3)]
    losses = h.run_train_multi(batches)
    assert losses.shape == (3,)
    assert np.all(np.isfinite(losses))


def test_multi_step_data_parallel():
    from sisr_tpu.parallel import MeshContext
    rng = np.random.RandomState(2)
    h = define_model('edsr', num_features=8, num_blocks=1, scale=2, lr=1e-3)
    h.set_metadata_keys([])
    h.set_mesh(MeshContext())
    batches = [{'lr': rng.rand(8, 8, 8, 3).astype(np.float32),
                'hr': rng.rand(8, 16, 16, 3).astype(np.float32)} for _ in range(2)]
    losses = h.run_train_multi(batches)
    assert losses.shape == (2,) and np.all(np.isfinite(losses))


def test_bf16_training():
    """dtype='bf16' internal param: bf16 compute, f32 params, finite decreasing loss."""
    import jax.numpy as jnp
    rng = np.random.RandomState(4)
    h = define_model('edsr', num_features=16, num_blocks=2, scale=2, lr=1e-3,
                     dtype='bf16')
    h.set_metadata_keys([])
    batch = {'lr': rng.rand(4, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(4, 16, 16, 3).astype(np.float32)}
    losses = [float(h.run_train(**batch)[0]) for _ in range(8)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # params stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(h.state.params))
    out, _, _ = h.run_eval(batch['lr'])
    assert out.dtype == np.float32 and np.all(np.isfinite(out))


def test_sparnet_batch_stats_checkpoint_roundtrip(tmp_path):
    """BatchNorm running stats must survive save/load and affect eval outputs."""
    rng = np.random.RandomState(6)
    h = define_model('sparnet', scale=4, lr=1e-3, in_size=32, out_size=32,
                     res_depth=1, min_feat_size=16)
    h.set_metadata_keys([])
    batch = {'lr': rng.rand(2, 32, 32, 3).astype(np.float32),
             'hr': rng.rand(2, 32, 32, 3).astype(np.float32)}
    for _ in range(3):
        h.run_train(**batch)
    assert h.has_batch_stats and h.state.batch_stats is not None
    # running stats must have moved away from init (mean 0)
    stats_leaves = jax.tree.leaves(h.state.batch_stats)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in stats_leaves)
    out_before, _, _ = h.run_eval(batch['lr'])

    h.set_epoch(3)
    h.save_model('train_model', 3, str(tmp_path))
    h2 = define_model('sparnet', scale=4, lr=1e-3, in_size=32, out_size=32,
                      res_depth=1, min_feat_size=16, eval_mode=True)
    h2.set_metadata_keys([])
    h2.load_model('train_model', 3, str(tmp_path))
    out_after, _, _ = h2.run_eval(batch['lr'])
    np.testing.assert_allclose(out_after, out_before, atol=1e-6)


def test_metadata_key_change_invalidates_cached_steps():
    """Re-pointing a handler at differently-ordered metadata keys must retrace."""
    rng = np.random.RandomState(8)
    h = define_model('qedsr', scale=2, num_features=8, num_blocks=1,
                     metadata=['qpi'], lr=1e-4, eval_mode=True)
    h.set_metadata_keys(['age', 'qpi'])
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    meta = np.array([[99.0, 0.5]], np.float32)  # age=99, qpi=0.5
    out1, _, _ = h.run_eval(x, metadata=meta)
    # swap key order: qpi now column 0
    h.set_metadata_keys(['qpi', 'age'])
    meta2 = np.array([[0.5, 99.0]], np.float32)
    out2, _, _ = h.run_eval(x, metadata=meta2)
    np.testing.assert_allclose(out2, out1, atol=1e-6)  # same semantic input


def test_stack_group_only_ships_train_step_keys():
    """The staged (K,B,...) uploader must not stack/upload batch entries the train
    step discards (host-degradation blur_kernels would otherwise ride the tunnel
    every dispatch just to be filtered out on device)."""
    from sisr_tpu.training.handler import TrainingHandler
    th = TrainingHandler.__new__(TrainingHandler)

    class FakeHandler:
        device_degrade = False

        def _train_batch_keys(self):
            return ('lr', 'hr', 'metadata')

    class FakeInterface:
        model = FakeHandler()

    th.model = FakeInterface()
    batch = {'lr': np.zeros((2, 4, 4, 3), np.float32),
             'hr': np.zeros((2, 8, 8, 3), np.float32),
             'blur_kernels': np.zeros((2, 5, 5), np.float32),
             'tag': ['a', 'b'], 'metadata_keys': ['qpi']}
    out = th._stack_group([batch, dict(batch)])
    assert out['lr'].shape == (2, 2, 4, 4, 3)
    assert out['hr'].shape == (2, 2, 8, 8, 3)
    assert 'blur_kernels' not in out          # filtered, never uploaded
    assert out['metadata_keys'] == ['qpi']    # non-arrays pass through
    assert out['_multi'] and out['_count'] == 2

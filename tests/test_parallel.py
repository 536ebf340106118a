"""Multi-device data parallelism on the 8-way virtual CPU mesh."""
import numpy as np
import pytest

import jax

from sisr_tpu.parallel import MeshContext, make_mesh


@pytest.fixture(scope='module')
def mesh_ctx():
    if len(jax.devices()) < 2:
        pytest.skip('needs multiple (virtual) devices')
    return MeshContext()


def test_mesh_has_8_devices(mesh_ctx):
    assert mesh_ctx.n_devices == 8


def test_batch_sharding(mesh_ctx):
    batch = {'lr': np.random.rand(8, 8, 8, 3).astype(np.float32),
             'tag': ['a'] * 8}
    sharded = mesh_ctx.shard_batch(batch)
    assert sharded['lr'].sharding.spec == jax.sharding.PartitionSpec('data')
    assert sharded['tag'] == batch['tag']


def test_data_parallel_train_matches_single_device():
    """A DP step over 8 shards must produce the same update as one big batch."""
    from sisr_tpu.models.handlers import define_model

    def make(seed=8):
        return define_model('edsr', num_features=8, num_blocks=1, scale=2, lr=1e-3,
                            seed=seed)

    rng = np.random.RandomState(0)
    batch = {'lr': rng.rand(8, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(8, 16, 16, 3).astype(np.float32)}

    single = make()
    single.set_metadata_keys([])
    loss_single, _ = single.run_train(**batch)

    multi = make()
    multi.set_metadata_keys([])
    multi.set_mesh(MeshContext())
    loss_multi, _ = multi.run_train(**batch)

    assert abs(float(loss_single) - float(loss_multi)) < 1e-6
    p1 = jax.tree.leaves(single.state.params)
    p2 = jax.tree.leaves(multi.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pad_batch_to_devices(mesh_ctx):
    batch = {'lr': np.random.rand(5, 4, 4, 3).astype(np.float32)}
    padded = mesh_ctx.pad_batch_to_devices(batch, keys=('lr',))
    assert padded['lr'].shape[0] == 8
    np.testing.assert_array_equal(padded['lr'][5], batch['lr'][4])


def test_dryrun_multichip_entry():
    """The driver-facing multichip dry run must compile and execute."""
    import importlib.util
    spec = importlib.util.spec_from_file_location('graft_entry',
                                                  '/root/repo/__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_tiled_eval_sharded_over_mesh(mesh_ctx):
    """Context-parallel analog: tile batch sharded across the 8-device mesh."""
    from sisr_tpu.models.handlers import define_model
    rng = np.random.RandomState(3)
    x = rng.rand(1, 40, 48, 3).astype(np.float32)

    full = define_model('edsr', num_features=8, num_blocks=2, scale=4, lr=1e-4,
                        eval_mode=True)
    full.set_metadata_keys([])
    out_full, _, _ = full.run_eval(x)

    tiled = define_model('edsr', num_features=8, num_blocks=2, scale=4, lr=1e-4,
                         eval_mode=True, max_combined_im_size=900)
    tiled.set_metadata_keys([])
    tiled.tiled_eval = True
    tiled.state = full.state
    tiled.set_mesh(mesh_ctx)
    out_sharded, _, _ = tiled.run_eval(x)
    assert out_sharded.shape == out_full.shape
    s = 4
    for (cy, cx) in [(10, 12), (30, 36)]:
        region = np.s_[:, cy * s - 8:cy * s + 8, cx * s - 8:cx * s + 8, :]
        np.testing.assert_allclose(out_sharded[region], out_full[region], atol=1e-4)


def test_multihost_mesh_layout():
    """2-D (dcn, data) mesh seam: batch sharded over both axes, DP still exact."""
    from sisr_tpu.parallel import make_multihost_mesh
    from sisr_tpu.models.handlers import define_model
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    ctx = make_multihost_mesh(devices_per_host=4)  # simulate 2 hosts x 4 chips
    assert ctx.mesh.devices.shape == (2, 4)
    assert ctx.n_devices == 8

    rng = np.random.RandomState(5)
    batch = {'lr': rng.rand(8, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(8, 16, 16, 3).astype(np.float32)}
    single = define_model('edsr', num_features=8, num_blocks=1, scale=2, lr=1e-3)
    single.set_metadata_keys([])
    loss_single, _ = single.run_train(**batch)

    multi = define_model('edsr', num_features=8, num_blocks=1, scale=2, lr=1e-3)
    multi.set_metadata_keys([])
    multi.set_mesh(ctx)
    loss_multi, _ = multi.run_train(**batch)
    assert abs(float(loss_single) - float(loss_multi)) < 1e-6


def test_maybe_init_distributed_single_process(monkeypatch):
    """SISR_TPU_MULTIHOST=1 with an explicit 1-process coordinator initializes the
    distributed runtime on a single process (the pod path, degenerately)."""
    from sisr_tpu.parallel import distributed as dist
    monkeypatch.delenv('SISR_TPU_MULTIHOST', raising=False)
    monkeypatch.delenv('SISR_TPU_COORDINATOR', raising=False)
    assert dist.maybe_init_distributed() is False  # no launcher env -> no-op

    monkeypatch.setenv('SISR_TPU_COORDINATOR', 'localhost:12421')
    monkeypatch.setenv('SISR_TPU_NUM_PROCESSES', '1')
    monkeypatch.setenv('SISR_TPU_PROCESS_ID', '0')
    # True when this is the first jax touch in the process (how the CLI calls it);
    # graceful False + warning when the XLA backend is already up (late call)
    first = dist.maybe_init_distributed()
    assert first in (True, False)
    import jax
    assert jax.process_count() == 1
    assert dist.maybe_init_distributed() is first  # stable on repeat calls


def test_sp_gpu_pins_default_device():
    """gpu='single' + sp_gpu must pin the model's default device to the requested
    chip (previously accepted and silently ignored)."""
    import jax
    from sisr_tpu.models.interface import ModelInterface
    try:
        ModelInterface('/tmp', 'pin_exp', mode='train', gpu='single', sp_gpu=2,
                       new_params={'name': 'edsr',
                                   'internal_params': {'scale': 4,
                                                       'num_features': 8,
                                                       'num_blocks': 1}})
        assert jax.config.jax_default_device == jax.devices()[2]
        # out-of-range degrades to device 0 with a warning, never raises
        ModelInterface('/tmp', 'pin_exp2', mode='train', gpu='single', sp_gpu=99,
                       new_params={'name': 'edsr',
                                   'internal_params': {'scale': 4,
                                                       'num_features': 8,
                                                       'num_blocks': 1}})
    finally:
        jax.config.update('jax_default_device', None)

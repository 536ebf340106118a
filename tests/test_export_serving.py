"""AOT serving export (tools/export_serving.py): the serialized StableHLO artifact
must reproduce the live handler's eval outputs through jax.export round-trips."""
import os

import numpy as np
import pytest
from click.testing import CliRunner

from sisr_tpu.models.handlers import define_model
from sisr_tpu.tools.export_serving import (build_serving_fn, export_handler,
                                           export_experiment, load_serving,
                                           export_serving_cli)
from jax import export as jax_export

pytestmark = pytest.mark.slow


def _roundtrip(blob):
    return jax_export.deserialize(bytearray(bytes(blob))).call


def test_export_edsr_float_and_uint8():
    import jax.numpy as jnp
    h = define_model('edsr', eval_mode=True, scale=2, num_features=8, num_blocks=2)
    h.init_state(spatial=(10, 12))
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, size=(2, 10, 12, 3)).astype(np.uint8)
    x = u8.astype(np.float32) / 255.0
    ref, _, _ = h.run_eval(x)

    fn = _roundtrip(export_handler(h, 2, 10, 12))
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)

    # uint8 serving contract: /255 is baked into the artifact (same prep as the
    # jitted eval step) — feeding raw u8 matches the float path bit-for-bit-ish
    fn8 = _roundtrip(export_handler(h, 2, 10, 12, input_dtype=jnp.uint8))
    np.testing.assert_allclose(np.asarray(fn8(u8)), ref, atol=2e-5)


def test_export_qrcan_metadata():
    h = define_model('qrcan', eval_mode=True, scale=2, n_feats=16, n_resgroups=1,
                     n_resblocks=1, style='max_concat', include_q_layer=True,
                     metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.init_state(spatial=(8, 8))
    rng = np.random.RandomState(5)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    meta = rng.rand(1, 10).astype(np.float32)
    ref, _, _ = h.run_eval(x, metadata=meta)
    fn = _roundtrip(export_handler(h, 1, 8, 8))
    np.testing.assert_allclose(np.asarray(fn(x, meta)), ref, atol=2e-5)
    # metadata actually reaches the attention layers
    other = np.asarray(fn(x, meta * 0.1))
    assert np.abs(other - ref).max() > 1e-6


def test_export_srmd_channel_concat():
    h = define_model('srmd', eval_mode=True, scale=2, nc=8, nb=2,
                     metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.init_state(spatial=(8, 8))
    rng = np.random.RandomState(7)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    meta = rng.rand(1, 10).astype(np.float32)
    ref, _, _ = h.run_eval(x, metadata=meta)
    fn = _roundtrip(export_handler(h, 1, 8, 8))
    np.testing.assert_allclose(np.asarray(fn(x, meta)), ref, atol=2e-5)


def test_export_requires_state_and_metadata_keys():
    h = define_model('edsr', eval_mode=True, scale=2, num_features=8, num_blocks=1)
    with pytest.raises(RuntimeError, match='state'):
        build_serving_fn(h)
    hq = define_model('qrcan', eval_mode=True, scale=2, n_feats=16, n_resgroups=1,
                      n_resblocks=1, metadata=['blur_kernel'])
    hq.init_state(spatial=(8, 8))
    with pytest.raises(RuntimeError, match='set_metadata_keys'):
        export_handler(hq, 1, 8, 8)


def test_export_cli_roundtrip(tmp_path):
    from sisr_tpu.tools.e2e_bench import build_experiment
    model_loc = build_experiment(str(tmp_path), 'exp_srv', 'edsr',
                                 dict(scale=2, num_features=8, num_blocks=1),
                                 spatial=(8, 8))
    out = str(tmp_path / 'edsr.sisr-hlo')
    result = CliRunner().invoke(
        export_serving_cli,
        ['--model_loc', model_loc, '--experiment', 'exp_srv', '--epoch', '0',
         '--batch_size', '1', '--height', '8', '--width', '8', '--out', out],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert os.path.getsize(out) > 0

    fn = load_serving(out)
    from sisr_tpu.models.interface import ModelInterface
    iface = ModelInterface(model_loc, 'exp_srv', mode='eval', load_epoch=0)
    x = np.random.RandomState(11).rand(1, 8, 8, 3).astype(np.float32)
    ref, _, _ = iface.model.run_eval(x)
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)


def test_export_experiment_metadata_layout(tmp_path):
    """Default export of a multi-key q-model must reproduce the training-time
    metadata column layout (scalar CSV keys first, blur-kernel columns LAST, the
    dataset's online-degradation append order — data/datasets.py:270-273), and a
    pre-expanded or wrong --metadata list must fail loudly, not trace a Dense of
    the wrong width."""
    from sisr_tpu.models.interface import ModelInterface
    from sisr_tpu.utils import toml_io
    internal = dict(scale=2, n_feats=16, n_resgroups=1, n_resblocks=1,
                    metadata=['qpi', 'blur_kernel'], style='modulate')
    base = tmp_path / 'Results' / 'exp_meta'
    (base / 'saved_models').mkdir(parents=True)
    with open(base / 'config.toml', 'w') as f:
        toml_io.dump({'model': {'name': 'qrcan', 'internal_params': internal}}, f)
    h = define_model('qrcan', eval_mode=False, **internal)
    assert h.num_metadata == 11  # qpi + blur_kernel x10
    h.set_metadata_keys(['qpi'] + ['blur_kernel'] * 10)
    h.init_state(spatial=(8, 8))
    h.save_model('train_model', 0, str(base / 'saved_models'))
    model_loc = str(tmp_path / 'Results')

    out = export_experiment(model_loc, 'exp_meta', 0, 1, 8, 8,
                            out_path=str(tmp_path / 'qrcan.sisr-hlo'))
    fn = load_serving(out)
    x = np.random.RandomState(3).rand(1, 8, 8, 3).astype(np.float32)
    meta = np.random.RandomState(4).rand(1, 11).astype(np.float32)
    iface = ModelInterface(model_loc, 'exp_meta', mode='eval', load_epoch=0)
    iface.model.set_metadata_keys(['qpi'] + ['blur_kernel'] * 10)
    ref, _, _ = iface.model.run_eval(x, metadata=meta)
    np.testing.assert_allclose(np.asarray(fn(x, meta)), ref, atol=2e-5)
    # column order matters: permuting [qpi, bk x10] -> [bk x10, qpi] changes output
    permuted = np.concatenate([meta[:, 1:], meta[:, :1]], axis=1)
    assert np.abs(np.asarray(fn(x, permuted)) - ref).max() > 1e-6

    with pytest.raises(RuntimeError, match='mismatch'):
        export_experiment(model_loc, 'exp_meta', 0, 1, 8, 8,
                          metadata_keys=['blur_kernel'] * 10,
                          out_path=str(tmp_path / 'bad.sisr-hlo'))


def test_export_int8_edsr():
    """--int8 export: the frozen quantized program reproduces the live int8
    serving path, and the artifact is smaller than the f32 one (int8 weights)."""
    h = define_model('edsr', eval_mode=True, scale=2, num_features=8, num_blocks=2)
    h.init_state(spatial=(10, 12))
    rng = np.random.RandomState(21)
    x = rng.rand(2, 10, 12, 3).astype(np.float32)
    blob_f32 = export_handler(h, 2, 10, 12)
    h.set_int8(True)
    ref, _, _ = h.run_eval(x)  # calibrates the int8 ctx on this batch
    blob = export_handler(h, 2, 10, 12, int8=True)
    fn = _roundtrip(blob)
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=2e-5)
    assert len(bytes(blob)) < len(bytes(blob_f32))


def test_export_int8_qedsr_metadata():
    """--int8 export of a q-model: metadata reaches the f32 ParaCA gates inside
    the quantized artifact."""
    h = define_model('qedsr', eval_mode=True, scale=2, num_features=16,
                     num_blocks=2, metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.init_state(spatial=(8, 8))
    rng = np.random.RandomState(31)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    meta = rng.rand(1, 10).astype(np.float32)
    h.set_int8(True)
    ref, _, _ = h.run_eval(x, metadata=meta)
    fn = _roundtrip(export_handler(h, 1, 8, 8, int8=True))
    np.testing.assert_allclose(np.asarray(fn(x, meta)), ref, atol=2e-5)
    assert np.abs(np.asarray(fn(x, meta * 0.1)) - ref).max() > 1e-6


def test_export_int8_requires_calibration():
    h = define_model('edsr', eval_mode=True, scale=2, num_features=8, num_blocks=1)
    h.init_state(spatial=(8, 8))
    with pytest.raises(RuntimeError, match='calibrat'):
        export_handler(h, 1, 8, 8, int8=True)


def _write_calibration_dir(path, csv_text, n_images=2):
    from PIL import Image
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(9)
    names = ['a.png', 'b.png'][:n_images]
    for n in names:
        Image.fromarray(rng.randint(0, 256, (8, 8, 3), np.uint8)).save(
            os.path.join(path, n))
    with open(os.path.join(path, 'degradation_metadata.csv'), 'w') as f:
        f.write(csv_text)
    return names


def test_calibration_metadata_column_identity(tmp_path):
    """Calibration CSVs are validated by column IDENTITY and reordered into the
    model's serving layout — a permuted-but-matching CSV calibrates identically;
    a same-count different-identity CSV fails loudly; a missing row names the
    file instead of a bare KeyError."""
    from sisr_tpu.tools.export_serving import _load_calibration_batch
    h = define_model('qedsr', eval_mode=True, scale=2, num_features=16,
                     num_blocks=1, metadata=['qpi', 'blur_kernel'])
    h.set_metadata_keys(['qpi'] + ['blur_kernel'] * 10)

    import json
    bk = json.dumps(np.linspace(0.01, 0.1, 10).tolist())
    canonical = ('image,QPI,blur_kernel\na.png,25,"%s"\nb.png,35,"%s"\n'
                 % (bk, bk))
    permuted = ('image,blur_kernel,QPI\na.png,"%s",25\nb.png,"%s",35\n'
                % (bk, bk))
    _, meta_c = _load_calibration_batch(
        h, str(_write_calibration_dir(tmp_path / 'canon', canonical)
               and (tmp_path / 'canon')))
    _, meta_p = _load_calibration_batch(h, str(
        _write_calibration_dir(tmp_path / 'perm', permuted)
        and (tmp_path / 'perm')))
    np.testing.assert_array_equal(meta_c, meta_p)
    assert meta_c.shape == (2, 11)

    wrong = ('image,noise,blur_kernel\na.png,0.1,"%s"\nb.png,0.2,"%s"\n'
             % (bk, bk))
    _write_calibration_dir(tmp_path / 'wrong', wrong)
    with pytest.raises(RuntimeError, match='serving layout'):
        _load_calibration_batch(h, str(tmp_path / 'wrong'))

    missing = 'image,QPI,blur_kernel\na.png,25,"%s"\n' % bk
    _write_calibration_dir(tmp_path / 'missing', missing)
    with pytest.raises(RuntimeError, match='calibration image.*b.png'):
        _load_calibration_batch(h, str(tmp_path / 'missing'))


def test_export_cli_int8_with_real_calibration(tmp_path):
    """End-to-end --int8 export through the CLI, calibrating on the real Set5
    blurred-LR images + their degradation_metadata.csv."""
    from sisr_tpu.models.interface import ModelInterface
    from sisr_tpu.ops.metrics import psnr
    from sisr_tpu.utils import toml_io
    internal = dict(scale=4, num_features=16, num_blocks=2,
                    metadata=['blur_kernel'])
    base = tmp_path / 'Results' / 'exp_i8'
    (base / 'saved_models').mkdir(parents=True)
    with open(base / 'config.toml', 'w') as f:
        toml_io.dump({'model': {'name': 'qedsr', 'internal_params': internal}}, f)
    h = define_model('qedsr', eval_mode=False, **internal)
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.init_state(spatial=(8, 8))
    h.save_model('train_model', 0, str(base / 'saved_models'))

    out = str(tmp_path / 'qedsr_int8.sisr-hlo')
    result = CliRunner().invoke(export_serving_cli, [
        '--model_loc', str(tmp_path / 'Results'), '--experiment', 'exp_i8',
        '--epoch', '0', '--batch_size', '1', '--height', '8', '--width', '8',
        '--out', out, '--int8', '--calibration_images',
        '/root/reference/Data/example_data/Set5/lr_random_blur'],
        catch_exceptions=False)
    assert result.exit_code == 0, result.output

    fn = load_serving(out)
    rng = np.random.RandomState(41)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    meta = rng.rand(1, 10).astype(np.float32)
    iface = ModelInterface(str(tmp_path / 'Results'), 'exp_i8', mode='eval',
                           load_epoch=0)
    iface.model.set_metadata_keys(['blur_kernel'] * 10)
    ref, _, _ = iface.model.run_eval(x, metadata=meta)
    out_sr = np.asarray(fn(x, meta))
    assert out_sr.shape == ref.shape
    assert psnr(out_sr, ref, max_value=1.0) > 35

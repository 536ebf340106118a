"""Int8 quantized inference correctness."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.models.advanced import EDSR
from sisr_tpu.ops.quantization import (conv_int8, edsr_int8_forward,
                                       quantize_edsr_params, quantize_kernel_int8)
from sisr_tpu.ops.metrics import psnr

pytestmark = pytest.mark.slow


def test_kernel_quantization_roundtrip():
    rng = np.random.RandomState(0)
    k = rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1
    qk, scale = quantize_kernel_int8(k)
    recon = np.asarray(qk, np.float32) * np.asarray(scale)
    assert np.abs(recon - k).max() <= (np.abs(k).max(axis=(0, 1, 2)) / 127).max() + 1e-7


def test_conv_int8_close_to_f32():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 16, 8), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(8) * 0.01, jnp.float32)
    qk, s = quantize_kernel_int8(k)
    out_q = np.asarray(conv_int8(x, qk, s, b))
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ('NHWC', 'HWIO', 'NHWC'))
    out_f = np.asarray(jax.lax.conv_general_dilated(x, k, (1, 1), 'SAME',
                                                    dimension_numbers=dn) + b)
    rel = np.abs(out_q - out_f).max() / (np.abs(out_f).max() + 1e-9)
    assert rel < 0.03


def test_edsr_int8_output_quality():
    """Quantized EDSR must stay within ~1 uint8 LSB of the f32 forward."""
    rng = np.random.RandomState(2)
    model = EDSR(net_features=16, num_blocks=4, scale=4)
    x = jnp.asarray(rng.rand(1, 24, 24, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out_f32 = np.asarray(model.apply(variables, x))

    qparams = quantize_edsr_params(variables['params'])
    out_int8 = np.asarray(edsr_int8_forward(qparams, x, num_blocks=4, scale=4))

    assert out_int8.shape == out_f32.shape
    err = np.abs(out_int8 - out_f32)
    assert err.mean() < 2.0 / 255
    # treat the f32 output as reference signal: quantized output stays >35 dB close
    assert psnr(out_int8, out_f32, max_value=1.0) > 35


def test_static_calibration_matches_dynamic_quality():
    from sisr_tpu.ops.quantization import (calibrate_edsr_scales,
                                           edsr_int8_forward_static)
    rng = np.random.RandomState(3)
    model = EDSR(net_features=16, num_blocks=3, scale=2)
    x = jnp.asarray(rng.rand(1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    out_f32 = np.asarray(model.apply(variables, x))

    qparams = quantize_edsr_params(variables['params'])
    scales = calibrate_edsr_scales(variables['params'],
                                   [np.asarray(x), rng.rand(2, 12, 12, 3)],
                                   num_blocks=3, scale=2)
    # head, blocks, body_tail, up, tail + the int16 residual grid
    assert len(scales) == 1 + 3 * 2 + 1 + 1 + 1 + 1
    out_static = np.asarray(edsr_int8_forward_static(qparams, scales, x,
                                                     num_blocks=3, scale=2))
    assert psnr(out_static, out_f32, max_value=1.0) > 35


def test_narrow_residual_dtypes_keep_quality():
    """bf16 / int16 residual-carry datapaths stay close to the f32-residual output."""
    import pytest
    from sisr_tpu.ops.quantization import (calibrate_edsr_scales,
                                           edsr_int8_forward_static)
    rng = np.random.RandomState(4)
    model = EDSR(net_features=16, num_blocks=4, scale=4)
    x = jnp.asarray(rng.rand(1, 20, 20, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x)
    out_f32 = np.asarray(model.apply(variables, x))

    qparams = quantize_edsr_params(variables['params'])
    scales = calibrate_edsr_scales(variables['params'], [np.asarray(x)],
                                   num_blocks=4, scale=4)
    for dtype in ('bfloat16', 'int16'):
        out = np.asarray(edsr_int8_forward_static(qparams, scales, x, num_blocks=4,
                                                  scale=4, residual_dtype=dtype))
        assert out.shape == out_f32.shape
        assert psnr(out, out_f32, max_value=1.0) > 35, dtype
    with pytest.raises(ValueError):
        edsr_int8_forward_static(qparams, scales, x, residual_dtype='int4')


def test_rcan_int8_static_quality():
    """Quantized RCAN (int8 convs + f32 channel attention) stays >35 dB vs f32."""
    from sisr_tpu.models.advanced import RCAN
    from sisr_tpu.ops.quantization import (calibrate_rcan_scales,
                                           quantize_rcan_params,
                                           rcan_int8_forward_static,
                                           _rcan_float_forward)
    rng = np.random.RandomState(5)
    model = RCAN(n_resgroups=2, n_resblocks=2, n_feats=16, scale=4)
    x = jnp.asarray(rng.rand(1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x)
    out_f32 = np.asarray(model.apply(variables, x))

    # the calibration-path float mirror must match the flax model bit-for-bit
    mirror = np.asarray(_rcan_float_forward(variables['params'], x, 2, 2))
    assert np.array_equal(mirror, out_f32)

    qparams = quantize_rcan_params(variables['params'], 2, 2)
    scales = calibrate_rcan_scales(variables['params'], [np.asarray(x)], 2, 2)
    for dtype in ('float32', 'bfloat16'):
        out = np.asarray(rcan_int8_forward_static(qparams, scales, x, 2, 2,
                                                  residual_dtype=dtype))
        assert out.shape == out_f32.shape
        assert psnr(out, out_f32, max_value=1.0) > 35, dtype

    # ca_epilogue='pallas' (fused CA+residual block tail) must agree with 'xla'
    # to rounding-order tolerance — on CPU the op falls back to the reference
    # math, so this validates the plumbing (param trees, shapes, dtypes);
    # tools/bench_pallas_epilogue measures the kernel itself on the real chip
    out_xla = np.asarray(rcan_int8_forward_static(qparams, scales, x, 2, 2))
    out_pal = np.asarray(rcan_int8_forward_static(qparams, scales, x, 2, 2,
                                                  ca_epilogue='pallas'))
    assert psnr(out_pal, out_xla, max_value=1.0) > 50  # bf16 cast-order only


def test_han_int8_static_quality():
    """Quantized HAN (int8 convs incl. the wide LAM-fusion conv + f32 LAM/CSAM/CA)
    stays >35 dB vs f32, and the calibration mirror matches flax bit-for-bit."""
    from sisr_tpu.models.advanced import HAN
    from sisr_tpu.ops.quantization import (calibrate_han_scales,
                                           quantize_han_params,
                                           han_int8_forward_static,
                                           _han_float_forward)
    rng = np.random.RandomState(11)
    model = HAN(n_resgroups=2, n_resblocks=2, n_feats=16, scale=4)
    x = jnp.asarray(rng.rand(1, 12, 12, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(4), x)
    out_f32 = np.asarray(model.apply(variables, x))

    mirror = np.asarray(_han_float_forward(variables['params'], x, 2, 2))
    np.testing.assert_allclose(mirror, out_f32, atol=2e-6)

    qparams = quantize_han_params(variables['params'], 2, 2)
    scales = calibrate_han_scales(variables['params'], [np.asarray(x)], 2, 2)
    for dtype in ('float32', 'bfloat16'):
        out = np.asarray(han_int8_forward_static(qparams, scales, x, 2, 2,
                                                 residual_dtype=dtype))
        assert out.shape == out_f32.shape
        assert psnr(out, out_f32, max_value=1.0) > 35, dtype

    # pallas block-tail epilogue plumbing (CPU falls back to the reference math)
    out_pal = np.asarray(han_int8_forward_static(qparams, scales, x, 2, 2,
                                                 ca_epilogue='pallas'))
    out_xla = np.asarray(han_int8_forward_static(qparams, scales, x, 2, 2))
    assert psnr(out_pal, out_xla, max_value=1.0) > 50


def test_handler_int8_han_serving_path():
    """eval_sisr --int8 on HAN through the handler (lazy quantize+calibrate)."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.metrics import psnr
    rng = np.random.RandomState(13)
    h = define_model('han', eval_mode=True, scale=4, n_resgroups=2, n_resblocks=1,
                     n_feats=16)
    h.init_state(spatial=(12, 12))
    x = rng.rand(2, 12, 12, 3).astype(np.float32)
    ref, _, _ = h.run_eval(x)
    h.set_int8(True)
    out, _, _ = h.run_eval(x)
    assert out.shape == ref.shape
    assert psnr(out, ref, max_value=1.0) > 35


def test_vdsr_int8_static_quality_and_handler():
    """Quantized VDSR (whole conv chain int8 at full HR resolution) >35 dB vs
    f32, including the y-channel handler serving path."""
    from sisr_tpu.models.basic import VDSR
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.quantization import (calibrate_vdsr_scales,
                                           quantize_vdsr_params,
                                           vdsr_int8_forward_static,
                                           _vdsr_float_forward)
    rng = np.random.RandomState(37)
    model = VDSR(kernel_pattern=[3] * 6, channel_pattern=[1] + [32] * 5 + [1])
    x = jnp.asarray(rng.rand(2, 16, 16, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(8), x)
    out_f32 = np.asarray(model.apply(variables, x))

    mirror = np.asarray(_vdsr_float_forward(variables['params'], x))
    np.testing.assert_allclose(mirror, out_f32, atol=2e-6)

    qparams = quantize_vdsr_params(variables['params'])
    scales = calibrate_vdsr_scales(variables['params'], [np.asarray(x)])
    out = np.asarray(vdsr_int8_forward_static(qparams, scales, x))
    assert psnr(out, out_f32, max_value=1.0) > 35

    h = define_model('vdsr', eval_mode=True, scale=4, kernel_pattern=[3] * 6,
                     channel_pattern=[1] + [32] * 5 + [1])
    h.init_state(spatial=(16, 16))  # vdsr handler is 1-channel (ycbcr y-only)
    ref, _, _ = h.run_eval(x)
    h.set_int8(True)
    out, _, _ = h.run_eval(x)
    assert psnr(out, ref, max_value=1.0) > 35


@pytest.mark.parametrize('sft_type,q_injection', [('standard', False),
                                                  ('standard', True),
                                                  ('concat', False),
                                                  ('weak', False)])
def test_sftmd_int8_static_quality_and_handler(sft_type, q_injection):
    """Quantized SFTMD (int8 conv spine + f32 SFT modulation / q-injection)
    >35 dB vs f32, for the standard and concat SFT types."""
    from sisr_tpu.models.sftmd import SFTMD
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.quantization import (calibrate_sftmd_scales,
                                           quantize_sftmd_params,
                                           sftmd_int8_forward_static,
                                           _sftmd_float_forward)
    rng = np.random.RandomState(43)
    # 'weak' multiplies feature maps by the para maps directly: it needs
    # broadcastable metadata (1 channel), same constraint as the reference
    n_meta = 1 if sft_type == 'weak' else 10
    cfg = dict(num_features=16, num_blocks=2, scale=4, input_para=n_meta,
               sft_type=sft_type, q_injection=q_injection)
    model = SFTMD(**cfg)
    x = jnp.asarray(rng.rand(1, 10, 10, 3), jnp.float32)
    meta = jnp.asarray(rng.rand(1, n_meta), jnp.float32)
    variables = model.init(jax.random.PRNGKey(10), x, meta)
    out_f32 = np.asarray(model.apply(variables, x, meta))

    mirror = np.asarray(_sftmd_float_forward(variables['params'], x, meta,
                                             num_blocks=2, scale=4,
                                             sft_type=sft_type))
    np.testing.assert_allclose(mirror, out_f32, atol=2e-6)

    qparams = quantize_sftmd_params(variables['params'], 2, 4)
    scales = calibrate_sftmd_scales(variables['params'], [np.asarray(x)],
                                    [np.asarray(meta)], num_blocks=2, scale=4,
                                    sft_type=sft_type)
    out = np.asarray(sftmd_int8_forward_static(qparams, scales, x, meta,
                                               num_blocks=2, scale=4,
                                               sft_type=sft_type))
    assert psnr(out, out_f32, max_value=1.0) > 35

    keys = ['qpi'] if sft_type == 'weak' else ['blur_kernel'] * 10
    h = define_model('sftmd', eval_mode=True, scale=4, num_features=16,
                     num_blocks=2, SFT_type=sft_type, q_injection=q_injection,
                     metadata=['qpi'] if sft_type == 'weak' else ['blur_kernel'])
    h.set_metadata_keys(keys)
    h.init_state(spatial=(10, 10))
    xb = rng.rand(1, 10, 10, 3).astype(np.float32)
    mb = rng.rand(1, n_meta).astype(np.float32)
    ref, _, _ = h.run_eval(xb, metadata=mb)
    h.set_int8(True)
    out, _, _ = h.run_eval(xb, metadata=mb)
    assert psnr(out, ref, max_value=1.0) > 35


def test_vdsr_int8_fused_eval_calibrates_on_model_input():
    """--fused_eval --int8 on VDSR: calibration must see the pre-upscaled
    Y-channel input the int8 program consumes, not the raw LR RGB batch
    (which crashes on a conv channel mismatch and has the wrong statistics)."""
    from sisr_tpu.models.handlers import define_model
    rng = np.random.RandomState(47)
    h = define_model('vdsr', eval_mode=True, scale=2, kernel_pattern=[3] * 4,
                     channel_pattern=[1] + [16] * 3 + [1])
    h.init_state(spatial=(16, 16))
    h.set_int8(True)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 16, 16, 3).astype(np.float32)}
    (keys, vals), _ = h.run_eval_fused(batch, metrics=('PSNR',))
    vals = np.asarray(vals)
    assert vals.shape == (len(keys), 2) and np.isfinite(vals).all()


def test_tiled_int8_calibration_crops_to_tile_size():
    """Tiled families must calibrate on a tile-sized crop — an eager full-image
    f32 forward is exactly what the tile grid exists to avoid (OOM on large
    eval images)."""
    from sisr_tpu.models.handlers import define_model
    h = define_model('san', eval_mode=True, scale=4, n_feats=16, n_resgroups=1,
                     n_resblocks=1, reduction=8, max_combined_im_size=600)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    crop = h._int8_calibration_input(x)
    side = int(np.sqrt(600))
    assert crop.shape == (1, side, side, 3)
    # non-tiled handlers pass through unchanged
    h2 = define_model('edsr', eval_mode=True, scale=4, num_features=8,
                      num_blocks=1)
    assert h2._int8_calibration_input(x).shape == x.shape


def test_srmd_int8_static_quality_and_handler():
    """Quantized SRMD (whole chain int8 over the RGB+metadata-map concat input)
    >35 dB vs f32, incl. the channel-concat handler path."""
    from sisr_tpu.models.advanced import SRMD
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.quantization import (calibrate_srmd_scales,
                                           quantize_srmd_params,
                                           srmd_int8_forward_static,
                                           _srmd_float_forward)
    rng = np.random.RandomState(41)
    model = SRMD(in_nc=13, nc=16, nb=4, scale=4)
    x = jnp.asarray(rng.rand(2, 12, 12, 13), jnp.float32)
    variables = model.init(jax.random.PRNGKey(9), x)
    out_f32 = np.asarray(model.apply(variables, x))

    mirror = np.asarray(_srmd_float_forward(variables['params'], x, 4))
    np.testing.assert_allclose(mirror, out_f32, atol=2e-6)

    qparams = quantize_srmd_params(variables['params'])
    scales = calibrate_srmd_scales(variables['params'], [np.asarray(x)], 4)
    out = np.asarray(srmd_int8_forward_static(qparams, scales, x, 4))
    assert psnr(out, out_f32, max_value=1.0) > 35

    h = define_model('srmd', eval_mode=True, scale=4, nc=16, nb=4,
                     metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.init_state(spatial=(12, 12))
    xb = rng.rand(2, 12, 12, 3).astype(np.float32)
    mb = rng.rand(2, 10).astype(np.float32)
    ref, _, _ = h.run_eval(xb, metadata=mb)
    h.set_int8(True)
    out, _, _ = h.run_eval(xb, metadata=mb)
    assert psnr(out, ref, max_value=1.0) > 35


def test_san_int8_static_quality():
    """Quantized SAN (int8 RB conv body + f32 non-local/SOCA) stays >35 dB vs f32,
    and the calibration mirror (quadrant non-local, Newton-Schulz SOCA, gamma
    share-source skip) matches the flax model."""
    from sisr_tpu.models.san import SAN
    from sisr_tpu.ops.quantization import (calibrate_san_scales,
                                           quantize_san_params,
                                           san_int8_forward_static,
                                           _san_float_forward)
    rng = np.random.RandomState(23)
    cfg = dict(n_resgroups=2, n_resblocks=2, n_feats=16, reduction=8, scale=4)
    model = SAN(**cfg)
    x = jnp.asarray(rng.rand(1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(6), x)
    out_f32 = np.asarray(model.apply(variables, x))

    mirror = np.asarray(_san_float_forward(variables['params'], x, 2, 2))
    np.testing.assert_allclose(mirror, out_f32, atol=2e-5)

    qparams = quantize_san_params(variables['params'], 2, 2)
    scales = calibrate_san_scales(variables['params'], [np.asarray(x)], 2, 2)
    out = np.asarray(san_int8_forward_static(qparams, scales, x, 2, 2))
    assert out.shape == out_f32.shape
    assert psnr(out, out_f32, max_value=1.0) > 35


def test_handler_int8_san_tiled_serving_path():
    """eval_sisr --int8 on SAN: the quantized program composes with the static
    tile grid (run_eval AND the fused step route tiles through _tile_step)."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.metrics import psnr
    rng = np.random.RandomState(29)
    cfg = dict(scale=4, n_feats=16, n_resgroups=1, n_resblocks=1, reduction=8,
               max_combined_im_size=600)
    h = define_model('san', eval_mode=True, **cfg)
    h.init_state(spatial=(32, 32))
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    ref, _, _ = h.run_eval(x)  # tiled f32 (32+10)^2 > 600 forces the grid
    h.set_int8(True)
    out, _, _ = h.run_eval(x)
    assert out.shape == ref.shape
    assert psnr(out, ref, max_value=1.0) > 35
    # fused eval path with int8+tiled composed
    (keys, vals), _ = h.run_eval_fused(
        {'lr': x, 'hr': rng.rand(1, 128, 128, 3).astype(np.float32)},
        metrics=('PSNR',))
    vals = np.asarray(vals)
    assert vals.shape == (len(keys), 1) and np.isfinite(vals).all()


def test_qsan_int8_static_quality_and_tiled_handler():
    """Quantized QSAN (int8 conv body + f32 ParaCA/non-local/SOCA) >35 dB vs f32;
    the handler path composes int8 with the tile grid and threads metadata."""
    from sisr_tpu.models.qmodels import QSAN
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.quantization import (calibrate_qsan_scales,
                                           quantize_qsan_params,
                                           qsan_int8_forward_static,
                                           _qsan_float_forward)
    rng = np.random.RandomState(31)
    cfg = dict(n_resgroups=1, n_resblocks=2, n_feats=16, reduction=8, scale=4,
               input_para=10)
    model = QSAN(**cfg)
    x = jnp.asarray(rng.rand(1, 16, 16, 3), jnp.float32)
    meta = jnp.asarray(rng.rand(1, 10), jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), x, meta)
    out_f32 = np.asarray(model.apply(variables, x, meta))

    mirror = np.asarray(_qsan_float_forward(variables['params'], x, meta, 1, 2))
    np.testing.assert_allclose(mirror, out_f32, atol=2e-5)

    qparams = quantize_qsan_params(variables['params'], 1, 2)
    scales = calibrate_qsan_scales(variables['params'], [np.asarray(x)],
                                   [np.asarray(meta)], 1, 2)
    out = np.asarray(qsan_int8_forward_static(qparams, scales, x, meta, 1, 2))
    assert psnr(out, out_f32, max_value=1.0) > 35

    h = define_model('qsan', eval_mode=True, scale=4, n_feats=16, n_resgroups=1,
                     n_resblocks=1, reduction=8, max_combined_im_size=600,
                     metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.init_state(spatial=(32, 32))
    xb = rng.rand(1, 32, 32, 3).astype(np.float32)
    mb = rng.rand(1, 10).astype(np.float32)
    ref, _, _ = h.run_eval(xb, metadata=mb)
    h.set_int8(True)
    out, _, _ = h.run_eval(xb, metadata=mb)
    assert psnr(out, ref, max_value=1.0) > 35


def test_qhan_int8_static_quality():
    """Quantized QHAN (int8 convs + f32 QCA/ParaCA/LAM/CSAM) stays >35 dB vs f32."""
    from sisr_tpu.models.qmodels import QHAN
    from sisr_tpu.ops.quantization import (calibrate_qhan_scales,
                                           quantize_qhan_params,
                                           qhan_int8_forward_static,
                                           _qhan_float_forward)
    rng = np.random.RandomState(17)
    cfg = dict(n_resgroups=2, n_resblocks=2, n_feats=16, scale=4, num_metadata=10)
    model = QHAN(**cfg)
    x = jnp.asarray(rng.rand(1, 12, 12, 3), jnp.float32)
    meta = jnp.asarray(rng.rand(1, 10), jnp.float32)
    variables = model.init(jax.random.PRNGKey(5), x, meta)
    out_f32 = np.asarray(model.apply(variables, x, meta))

    mirror = np.asarray(_qhan_float_forward(variables['params'], x, meta, 2, 2))
    np.testing.assert_allclose(mirror, out_f32, atol=2e-6)

    qparams = quantize_qhan_params(variables['params'], 2, 2)
    scales = calibrate_qhan_scales(variables['params'], [np.asarray(x)],
                                   [np.asarray(meta)], 2, 2)
    out = np.asarray(qhan_int8_forward_static(qparams, scales, x, meta, 2, 2))
    assert out.shape == out_f32.shape
    assert psnr(out, out_f32, max_value=1.0) > 35


def test_handler_int8_qhan_serving_path():
    """eval_sisr --int8 on QHAN through the handler, metadata threaded through
    calibration and the quantized forward."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.metrics import psnr
    rng = np.random.RandomState(19)
    h = define_model('qhan', eval_mode=True, scale=4, n_resgroups=2, n_resblocks=1,
                     n_feats=16, metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.init_state(spatial=(12, 12))
    x = rng.rand(2, 12, 12, 3).astype(np.float32)
    meta = rng.rand(2, 10).astype(np.float32)
    ref, _, _ = h.run_eval(x, metadata=meta)
    h.set_int8(True)
    out, _, _ = h.run_eval(x, metadata=meta)
    assert out.shape == ref.shape
    assert psnr(out, ref, max_value=1.0) > 35


def test_handler_int8_serving_path():
    """set_int8 through the handler: quantize+calibrate lazily on the first eval
    batch, outputs stay close to the f32 eval (VERDICT r1 item 9)."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.metrics import psnr
    rng = np.random.RandomState(7)
    for name, cfg in (('edsr', dict(num_features=16, num_blocks=2)),
                      ('rcan', dict(n_resgroups=2, n_resblocks=1, n_feats=16))):
        h = define_model(name, eval_mode=True, scale=4, **cfg)
        x = rng.rand(1, 12, 14, 3).astype(np.float32)
        ref, _, _ = h.run_eval(x)
        h.set_int8(True)
        out, _, runtime = h.run_eval(x, timing=True)
        assert out.shape == ref.shape and runtime is not None
        assert psnr(out, ref, max_value=1.0) > 35, name
        # unsupported architectures refuse instead of silently running f32-as-int8
        srcnn = define_model('srcnn', eval_mode=True, scale=4,
                             kernel_pattern=[3, 3], channel_pattern=[1, 4, 1])
        srcnn.set_int8(True)
        assert not srcnn.int8_mode


def test_eval_cli_int8_flag(tmp_path):
    """--int8 through the full eval CLI: runs end-to-end and stays within 1 dB of
    the f32 metrics on Set5."""
    import os
    import pandas as pd
    from click.testing import CliRunner
    import pytest
    from sisr_tpu.net_eval import eval_run
    from helpers import SET5, train_tiny_experiment

    if not os.path.isdir(SET5):
        pytest.skip('Set5 example data unavailable')
    save_loc = train_tiny_experiment(tmp_path, 'int8_edsr')
    runner = CliRunner()
    means = {}
    for label, extra in (('f32', []), ('int8', ['--int8'])):
        out_loc = str(tmp_path / label)
        os.makedirs(out_loc, exist_ok=True)
        result = runner.invoke(eval_run, [
            '--hr_dir', os.path.join(SET5, 'hr'),
            '--lr_dir', os.path.join(SET5, 'lr_random_blur'),
            '-me', 'int8_edsr', 'best', '--results_name', 'r',
            '--metrics', 'PSNR', '--full_directory', '--no_image_comparison',
            '--no-time_models', '--model_loc', save_loc, '--out_loc', out_loc] + extra,
            catch_exceptions=False)
        assert result.exit_code == 0, result.output
        av = pd.read_csv(os.path.join(out_loc, 'r', 'standard_metrics',
                                      'average_metrics.csv'), index_col=0)
        means[label] = float(av.loc['int8_edsr'].iloc[-2])  # PSNR Mean column
    assert abs(means['int8'] - means['f32']) < 1.0, means


def test_int8_composes_with_fused_eval():
    """--int8 + --fused_eval: the calibrated int8 program inlines into the fused
    device step; metrics stay close to the f32 fused run."""
    import jax
    from sisr_tpu.models.handlers import define_model
    rng = np.random.RandomState(3)
    h = define_model('edsr', eval_mode=True, scale=4, num_features=16, num_blocks=2)
    batch = {'lr': rng.rand(2, 12, 14, 3).astype(np.float32),
             'hr': rng.rand(2, 48, 56, 3).astype(np.float32)}
    (keys, vals), _ = h.run_eval_fused(batch, metrics=('PSNR',))
    f32 = dict(zip(keys, np.asarray(vals)))
    h.set_int8(True)
    assert h.supports_fused_eval()
    (keys8, vals8), _ = h.run_eval_fused(batch, metrics=('PSNR',))
    q = dict(zip(keys8, np.asarray(vals8)))
    np.testing.assert_allclose(q['LR>PSNR'], f32['LR>PSNR'], atol=1e-5)
    # quantized forward output: within 1 dB of the f32 metrics on random data
    np.testing.assert_allclose(q['model>PSNR'], f32['model>PSNR'], atol=1.0)


def test_int8_ctx_refreshes_after_load(tmp_path):
    """load_model must drop the quantized-weight context (trace constants derived
    from the replaced params) so int8 eval reflects the loaded checkpoint."""
    from sisr_tpu.models.handlers import define_model
    rng = np.random.RandomState(5)
    src = define_model('edsr', scale=4, num_features=8, num_blocks=1)
    src.init_state()
    src.save_model('train_model', 0, str(tmp_path))

    h = define_model('edsr', eval_mode=True, scale=4, num_features=8, num_blocks=1,
                     seed=123)
    h.set_int8(True)
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    h.run_eval(x)  # builds _int8_ctx from the RANDOM-init params
    assert h._int8_ctx is not None
    h.load_model('train_model', 0, str(tmp_path))
    assert h._int8_ctx is None  # stale quantized weights dropped
    out_new, _, _ = h.run_eval(x)

    fresh = define_model('edsr', eval_mode=True, scale=4, num_features=8,
                         num_blocks=1)
    fresh.load_model('train_model', 0, str(tmp_path))
    fresh.set_int8(True)
    out_fresh, _, _ = fresh.run_eval(x)
    np.testing.assert_allclose(out_new, out_fresh, atol=1e-6)


@pytest.mark.parametrize('style', ['modulate', 'max_concat'])
def test_qrcan_int8_static_quality(style):
    """Quantized QRCAN (int8 convs + f32 meta-attention incl. PALayer/ParaCALayer)
    stays >35 dB vs the f32 module (VERDICT r2 item 3)."""
    from sisr_tpu.models.qmodels import QRCAN
    from sisr_tpu.ops.quantization import (calibrate_qrcan_scales,
                                           quantize_qrcan_params,
                                           qrcan_int8_forward_static,
                                           _qrcan_float_forward)
    rng = np.random.RandomState(11)
    n_meta = 16 if style == 'modulate' else 10  # modulate: meta width == n_feats
    model = QRCAN(n_resgroups=2, n_resblocks=2, n_feats=16, scale=4, style=style,
                  num_metadata=n_meta, include_q_layer=True,
                  include_pixel_attention=True)
    x = jnp.asarray(rng.rand(1, 16, 16, 3), jnp.float32)
    meta = jnp.asarray(rng.rand(1, n_meta), jnp.float32)
    variables = model.init(jax.random.PRNGKey(9), x, metadata=meta)
    out_f32 = np.asarray(model.apply(variables, x, metadata=meta))

    # the calibration-path float mirror must match the flax model bit-for-bit
    mirror = np.asarray(_qrcan_float_forward(variables['params'], x, meta, style,
                                             2, 2))
    assert np.array_equal(mirror, out_f32)

    qparams = quantize_qrcan_params(variables['params'], 2, 2)
    scales = calibrate_qrcan_scales(variables['params'], [np.asarray(x)],
                                    [np.asarray(meta)], style=style,
                                    n_resgroups=2, n_resblocks=2)
    for dtype in ('float32', 'bfloat16'):
        out = np.asarray(qrcan_int8_forward_static(qparams, scales, x, meta,
                                                   style=style, n_resgroups=2,
                                                   n_resblocks=2,
                                                   residual_dtype=dtype))
        assert out.shape == out_f32.shape
        assert psnr(out, out_f32, max_value=1.0) > 35, (style, dtype)


def test_handler_int8_qrcan_serving_path():
    """set_int8 on QRCAN (the paper's flagship family): metadata flows into the
    quantized program; output stays close to the f32 eval."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.metrics import psnr
    rng = np.random.RandomState(13)
    for style in ('modulate', 'max_concat'):
        h = define_model('qrcan', eval_mode=True, scale=4, n_feats=16,
                         n_resgroups=2, n_resblocks=1, style=style,
                         include_q_layer=True, metadata=['blur_kernel'])
        h.set_metadata_keys(['blur_kernel'] * 10)
        x = rng.rand(1, 12, 14, 3).astype(np.float32)
        meta = rng.rand(1, 10).astype(np.float32)
        ref, _, _ = h.run_eval(x, metadata=meta)
        h.set_int8(True)
        assert h.int8_mode  # qrcan now HAS a serving path (no silent refusal)
        out, _, runtime = h.run_eval(x, metadata=meta, timing=True)
        assert out.shape == ref.shape and runtime is not None
        assert psnr(out, ref, max_value=1.0) > 35, style


def test_qrcan_int8_fused_eval_matches_standard():
    """int8 QRCAN composes with the fused eval program (metadata threaded in)."""
    from sisr_tpu.models.handlers import define_model
    rng = np.random.RandomState(17)
    h = define_model('qrcan', eval_mode=True, scale=2, n_feats=16, n_resgroups=1,
                     n_resblocks=1, style='max_concat', include_q_layer=True,
                     metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.set_int8(True)
    batch = {'lr': rng.rand(2, 8, 8, 3).astype(np.float32),
             'hr': rng.rand(2, 16, 16, 3).astype(np.float32),
             'metadata': rng.rand(2, 10).astype(np.float32)}
    (keys, vals), _ = h.run_eval_fused(batch)
    vals = {k: np.asarray(v) for k, v in zip(keys, np.asarray(vals))}
    # standard (non-fused) int8 path on the same batch -> same PSNR
    out, _, _ = h.run_eval(batch['lr'], metadata=batch['metadata'])
    from sisr_tpu.ops.colorspace import rgb_to_ycbcr_nhwc
    sr_y = np.asarray(rgb_to_ycbcr_nhwc(np.clip(out, 0, 1), y_only=True,
                                        im_type='jpg'))[..., 0]
    hr_y = np.asarray(rgb_to_ycbcr_nhwc(batch['hr'], y_only=True,
                                        im_type='jpg'))[..., 0]
    want = [psnr(sr_y[i], hr_y[i], max_value=1.0) for i in range(2)]
    np.testing.assert_allclose(vals['model>PSNR'], want, atol=1e-3)


@pytest.mark.parametrize('nonlinearity', [False, True])
def test_qedsr_int8_static_quality(nonlinearity):
    """Quantized QEDSR (int8 EDSR spine + f32 per-block ParaCALayer gates) stays
    >35 dB vs the f32 module, for both q_layer_nonlinearity settings."""
    from sisr_tpu.models.qmodels import QEDSR
    from sisr_tpu.ops.quantization import (calibrate_qedsr_scales,
                                           quantize_qedsr_params,
                                           qedsr_int8_forward_static,
                                           _qedsr_float_forward)
    rng = np.random.RandomState(23)
    model = QEDSR(num_features=16, num_blocks=2, scale=4, res_scale=0.1,
                  input_para=10, q_layer_nonlinearity=nonlinearity)
    x = jnp.asarray(rng.rand(1, 12, 12, 3), jnp.float32)
    meta = jnp.asarray(rng.rand(1, 10), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, meta)
    out_f32 = np.asarray(model.apply(variables, x, meta))

    # the calibration-path float mirror must match the flax model bit-for-bit
    mirror = np.asarray(_qedsr_float_forward(variables['params'], x, meta, 2, 4,
                                             0.1, nonlinearity))
    assert np.array_equal(mirror, out_f32)

    qparams = quantize_qedsr_params(variables['params'], 2)
    scales = calibrate_qedsr_scales(variables['params'], [np.asarray(x)],
                                    [np.asarray(meta)], num_blocks=2, scale=4,
                                    res_scale=0.1, nonlinearity=nonlinearity)
    for dtype in ('float32', 'bfloat16'):
        out = np.asarray(qedsr_int8_forward_static(
            qparams, scales, x, meta, num_blocks=2, scale=4, res_scale=0.1,
            nonlinearity=nonlinearity, residual_dtype=dtype))
        assert out.shape == out_f32.shape
        assert psnr(out, out_f32, max_value=1.0) > 35, (nonlinearity, dtype)


def test_handler_int8_qedsr_serving_path():
    """eval_sisr --int8 on QEDSR through the handler: metadata threads through
    calibration and the quantized forward; output stays close to the f32 eval."""
    from sisr_tpu.models.handlers import define_model
    from sisr_tpu.ops.metrics import psnr
    rng = np.random.RandomState(29)
    h = define_model('qedsr', eval_mode=True, scale=4, num_features=16,
                     num_blocks=2, metadata=['blur_kernel'])
    h.set_metadata_keys(['blur_kernel'] * 10)
    h.init_state(spatial=(12, 12))
    x = rng.rand(2, 12, 12, 3).astype(np.float32)
    meta = rng.rand(2, 10).astype(np.float32)
    ref, _, _ = h.run_eval(x, metadata=meta)
    h.set_int8(True)
    out, _, runtime = h.run_eval(x, metadata=meta, timing=True)
    assert out.shape == ref.shape and runtime is not None
    assert psnr(out, ref, max_value=1.0) > 35


def test_int8_warns_for_measured_slower_families():
    """set_int8 warns at the point of use for families the README table measured
    slower than bf16 (sftmd/han/qhan) and stays silent for winners (VERDICT r4 #7)."""
    import warnings
    from sisr_tpu.models.handlers import define_model, INT8_MEASURED_SLOWER
    assert set(INT8_MEASURED_SLOWER) == {'sftmd', 'han', 'qhan'}
    h = define_model('han', eval_mode=True, scale=4, n_resgroups=2, n_resblocks=1,
                     n_feats=16)
    with pytest.warns(UserWarning, match='measured SLOWER.*han'):
        h.set_int8(True)
    assert h.int8_mode
    h2 = define_model('edsr', eval_mode=True, scale=4, num_features=16, num_blocks=2)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        h2.set_int8(True)
    assert h2.int8_mode

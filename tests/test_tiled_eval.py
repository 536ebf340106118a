"""Static tile-grid eval (the forward_chop replacement) correctness."""
import numpy as np
import pytest

from sisr_tpu.models.handlers import define_model


def _make_handler(tiled, max_size):
    h = define_model('edsr', num_features=8, num_blocks=2, scale=4, lr=1e-4,
                     eval_mode=True, max_combined_im_size=max_size)
    h.set_metadata_keys([])
    h.tiled_eval = tiled
    return h


def test_tiled_matches_untiled_interior():
    rng = np.random.RandomState(0)
    x = rng.rand(1, 40, 48, 3).astype(np.float32)

    full = _make_handler(False, 10 ** 9)
    out_full, _, _ = full.run_eval(x)

    tiled = _make_handler(True, 900)  # force tiling: (20+10)*(24+10)=1020 >= 900 -> 2x2
    tiled.state = full.state  # same weights
    out_tiled, _, _ = tiled.run_eval(x)

    assert out_tiled.shape == out_full.shape
    # seams can differ within the receptive field; interiors of tiles must agree and
    # overall deviation stays small
    diff = np.abs(out_tiled - out_full)
    assert np.mean(diff) < 1e-3
    # centers of the four quadrants (far from seams) agree to float tolerance
    s = 4
    for (cy, cx) in [(10, 12), (10, 36), (30, 12), (30, 36)]:
        region = np.s_[:, cy * s - 8:cy * s + 8, cx * s - 8:cx * s + 8, :]
        np.testing.assert_allclose(out_tiled[region], out_full[region], atol=1e-4)


def test_tiled_eval_below_threshold_is_exact():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    full = _make_handler(False, 10 ** 9)
    out_full, _, _ = full.run_eval(x)
    tiled = _make_handler(True, 10 ** 9)  # area below threshold -> no tiling
    tiled.state = full.state
    out_tiled, _, _ = tiled.run_eval(x)
    np.testing.assert_allclose(out_tiled, out_full, atol=1e-6)


def test_tiled_eval_odd_sizes():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 37, 41, 3).astype(np.float32)
    tiled = _make_handler(True, 500)
    out, _, _ = tiled.run_eval(x)
    assert out.shape == (1, 37 * 4, 41 * 4, 3)
    assert np.all(np.isfinite(out))

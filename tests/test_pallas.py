"""Pallas kernel tests (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sisr_tpu.ops.pallas.channel_attention import (
    _fused_ca_forward, _fused_ca_res_forward, _reference_ca, _reference_ca_res,
    fused_channel_attention, fused_channel_attention_residual)


def _params(rng, c=32, red=4):
    return (jnp.asarray(rng.randn(c, c // red) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c // red) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c // red, c) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(c) * 0.1, jnp.float32))


def test_fused_ca_matches_reference_interpret():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 8, 32), jnp.float32)
    w1, b1, w2, b2 = _params(rng)
    fused = _fused_ca_forward(x, w1, b1, w2, b2, interpret=True)
    ref = _reference_ca(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def _force_multi_tile(monkeypatch, rows_per_tile=4):
    """Force the two-phase tiled grid with SMALL tiles: shrink both the
    single-block budget (so the tiled path is taken) and _pick_tile's budget
    (so n_tiles > 1 — otherwise tile_h == h and the cross-step accumulator,
    rem() revisits and parked index maps are never exercised)."""
    from sisr_tpu.ops.pallas import channel_attention as ca_mod
    orig = ca_mod._pick_tile

    def small_tiles(h, w, c, itemsize):
        return orig(h, w, c, itemsize, budget=rows_per_tile * w * c * itemsize)

    monkeypatch.setattr(ca_mod, '_SINGLE_BLOCK_BUDGET', 1)
    monkeypatch.setattr(ca_mod, '_RES_SINGLE_BLOCK_BUDGET', 1)
    monkeypatch.setattr(ca_mod, '_pick_tile', small_tiles)


@pytest.mark.parametrize('shape', [(2, 16, 8, 32), (1, 13, 8, 32)])
def test_fused_ca_multi_tile_grid_interpret(shape, monkeypatch):
    """The two-phase tiled grid with n_tiles > 1 (4 tiles for H=16; H=13 prime
    degrades to tile_h=1, 13 tiles): cross-step accumulation + revisit phase."""
    _force_multi_tile(monkeypatch)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(*shape), jnp.float32)
    w1, b1, w2, b2 = _params(rng)
    fused = _fused_ca_forward(x, w1, b1, w2, b2, interpret=True)
    ref = _reference_ca(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize('shape', [(2, 16, 8, 32), (1, 13, 8, 32)])
@pytest.mark.parametrize('force_tiled', [False, True])
def test_fused_ca_residual_interpret(shape, force_tiled, monkeypatch):
    """CA + residual-add epilogue (the int8 RCAB block tail): f32 conv output,
    bf16 carry, output in the carry dtype — single-block and MULTI-tile grids
    (the parked-r index map must still align residual tiles with output tiles
    in phase B across several tiles)."""
    if force_tiled:
        _force_multi_tile(monkeypatch)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(*shape), jnp.float32)
    r = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
    w1, b1, w2, b2 = _params(rng)
    fused = _fused_ca_res_forward(x, r, w1, b1, w2, b2, interpret=True)
    ref = _reference_ca_res(x, r, w1, b1, w2, b2)
    assert fused.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(ref, np.float32), atol=1e-2)


def test_fused_ca_residual_gradients():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 8, 8, 32), jnp.float32)
    r = jnp.asarray(rng.rand(1, 8, 8, 32), jnp.float32)
    params = _params(rng)

    def loss_fused(x, r, *p):
        return jnp.sum(fused_channel_attention_residual(x, r, *p) ** 2)

    def loss_ref(x, r, *p):
        return jnp.sum(_reference_ca_res(x, r, *p) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, r, *params)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, r, *params)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_ca_gradients():
    """custom_vjp backward must equal autodiff through the reference impl."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 8, 8, 32), jnp.float32)
    params = _params(rng)

    def loss_fused(x, *p):
        return jnp.sum(fused_channel_attention(x, *p) ** 2)

    def loss_ref(x, *p):
        return jnp.sum(_reference_ca(x, *p) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, *params)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, *params)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

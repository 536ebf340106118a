"""Measure the Pallas CA+residual epilogue vs XLA in the int8 RCAN path.

VERDICT r3 item 7: the RCAB block tail in the int8 serving path — requant'd conv
output -> channel-attention scale -> residual add — is a memory-bound chain XLA
cannot fuse across the int8 dot.  This tool measures it both standalone (the
epilogue chain alone) and end-to-end (full ``rcan_int8_forward_static`` with
``ca_epilogue='xla'`` vs ``'pallas'``), and prints one JSON line per measurement.
The decision rule from the verdict: wire the Pallas epilogue only if the e2e win
is >= 1.05x; otherwise archive the kernel as a playbook.

Run on the real chip:  python -m sisr_tpu.tools.bench_pallas_epilogue
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

ITERS = 30


def _timed_loop(fn, args, iters=ITERS):
    """Median-of-3 steady-state latency of fn(*args), timed INSIDE one jitted
    program (fori_loop) with a host-transfer sync (remote tunnels can return from
    block_until_ready before execution completes)."""

    @jax.jit
    def loop(*a):
        def body(i, carry):
            out = fn(*a[:-1], carry)
            return (out * 0.999).astype(carry.dtype)
        return jnp.sum(jax.lax.fori_loop(0, iters, body, a[-1]).astype(jnp.float32))

    float(np.asarray(loop(*args)))  # compile + warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(*args)))
        samples.append((time.perf_counter() - t0) / iters)
    return sorted(samples)[1]


def bench_standalone(n=8, h=128, w=128, c=64):
    """The epilogue chain alone: f32 conv output, bf16 carry."""
    from ..ops.pallas.channel_attention import (_reference_ca_res,
                                                fused_channel_attention_residual)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, h, w, c), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, c // 16) * 0.1, jnp.float32)
    b1 = jnp.zeros(c // 16, jnp.float32)
    w2 = jnp.asarray(rng.randn(c // 16, c) * 0.1, jnp.float32)
    b2 = jnp.zeros(c, jnp.float32)
    r0 = jnp.asarray(rng.rand(n, h, w, c), jnp.bfloat16)

    def xla_fn(x, w1, b1, w2, b2, r):
        return _reference_ca_res(x, r, w1, b1, w2, b2)

    def pallas_fn(x, w1, b1, w2, b2, r):
        return fused_channel_attention_residual(x, r, w1, b1, w2, b2)

    t_xla = _timed_loop(xla_fn, (x, w1, b1, w2, b2, r0))
    t_pal = _timed_loop(pallas_fn, (x, w1, b1, w2, b2, r0))
    # correctness on device
    a = np.asarray(xla_fn(x, w1, b1, w2, b2, r0), np.float32)
    b = np.asarray(pallas_fn(x, w1, b1, w2, b2, r0), np.float32)
    err = float(np.abs(a - b).max())
    return {'bench': 'ca_res_epilogue_standalone', 'shape': [n, h, w, c],
            'xla_ms': round(t_xla * 1e3, 4), 'pallas_ms': round(t_pal * 1e3, 4),
            'speedup': round(t_xla / t_pal, 3), 'max_abs_err': err}


def bench_e2e_int8_rcan(n=8, hw=128, n_resgroups=10, n_resblocks=20):
    """Full int8 RCAN forward at the eval shape, XLA vs Pallas epilogue."""
    from ..models.advanced import RCAN
    from ..ops import quantization as qz
    model = RCAN(n_resgroups=n_resgroups, n_resblocks=n_resblocks, n_feats=64,
                 scale=4)
    x = jnp.asarray(np.random.RandomState(0).rand(n, hw, hw, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)['params']
    qp = qz.quantize_rcan_params(params, n_resgroups, n_resblocks)
    scales = qz.calibrate_rcan_scales(params, [x], n_resgroups, n_resblocks,
                                      margin=1.1)
    results = {}
    outs = {}
    for mode in ('xla', 'pallas'):
        def fwd(qp_, scales_, x_, mode=mode):
            return qz.rcan_int8_forward_static(
                qp_, scales_, x_, n_resgroups, n_resblocks, ca_epilogue=mode)
        results[mode] = _timed_loop(
            lambda qp_, scales_, x_, mode=mode: qz.rcan_int8_forward_static(
                qp_, scales_, x_, n_resgroups, n_resblocks,
                ca_epilogue=mode)[:, ::4, ::4, :],
            (qp, scales, x), iters=10)
        outs[mode] = np.asarray(jax.jit(fwd)(qp, scales, x), np.float32)
    err = float(np.abs(outs['xla'] - outs['pallas']).max())
    return {'bench': 'int8_rcan_e2e', 'shape': [n, hw, hw, 3],
            'layers': [n_resgroups, n_resblocks],
            'xla_ms': round(results['xla'] * 1e3, 3),
            'pallas_ms': round(results['pallas'] * 1e3, 3),
            'speedup': round(results['xla'] / results['pallas'], 3),
            'max_abs_err': err}


def main():
    if jax.default_backend() != 'tpu':
        print(json.dumps({'error': 'run on the real chip — pallas kernels are '
                                   'TPU-only (backend: %s)'
                                   % jax.default_backend()}))
        return
    for shape in ((8, 32, 32, 64), (8, 128, 128, 64), (1, 256, 256, 64)):
        print(json.dumps(bench_standalone(*shape)), flush=True)
    print(json.dumps(bench_e2e_int8_rcan()), flush=True)


if __name__ == '__main__':
    sys.exit(main())

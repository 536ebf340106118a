"""Headline benchmark: images/sec/chip for 4x SR eval (128 -> 512), EDSR 64f/16b.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference PyTorch implementation's CPU throughput for
the identical architecture/workload, measured on this machine (see measure_torch_baseline;
cached in the untracked .bench_baseline.json, so each machine measures its own;
re-measure with BENCH_MEASURE_BASELINE=1).
Driver target (BASELINE.md): >10x reference CPU throughput per v5e chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              '.bench_baseline.json')
BATCH = int(os.environ.get('BENCH_BATCH', '16'))
ITERS = int(os.environ.get('BENCH_ITERS', '20'))


def measure_torch_baseline():
    """Reference-equivalent torch-CPU EDSR (standard public architecture) throughput."""
    import torch
    import torch.nn as nn
    torch.set_num_threads(os.cpu_count())

    class ResBlock(nn.Module):
        def __init__(s, n):
            super().__init__()
            s.c1 = nn.Conv2d(n, n, 3, padding=1)
            s.c2 = nn.Conv2d(n, n, 3, padding=1)

        def forward(s, x):
            return x + 0.1 * s.c2(torch.relu(s.c1(x)))

    class EDSR(nn.Module):
        def __init__(s, n=64, blocks=16):
            super().__init__()
            s.head = nn.Conv2d(3, n, 3, padding=1)
            s.body = nn.Sequential(*[ResBlock(n) for _ in range(blocks)])
            s.bt = nn.Conv2d(n, n, 3, padding=1)
            ups = []
            for _ in range(2):
                ups += [nn.Conv2d(n, 4 * n, 3, padding=1), nn.PixelShuffle(2)]
            s.up = nn.Sequential(*ups)
            s.tail = nn.Conv2d(n, 3, 3, padding=1)

        def forward(s, x):
            x = s.head(x)
            r = s.bt(s.body(x)) + x
            return s.tail(s.up(r))

    model = EDSR().eval()
    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        for _ in range(3):
            model(x)
        t0 = time.perf_counter()
        n = 8
        for _ in range(n):
            model(x)
        dt = (time.perf_counter() - t0) / n
    return 1.0 / dt


def get_baseline():
    if os.environ.get('BENCH_MEASURE_BASELINE') != '1' and os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)['torch_cpu_img_per_sec']
    value = measure_torch_baseline()
    with open(BASELINE_CACHE, 'w') as f:
        json.dump({'torch_cpu_img_per_sec': value,
                   'workload': 'EDSR 64f/16b 4x 128->512, bs1, torch CPU'}, f)
    return value


def measure_tpu():
    """Steady-state device throughput.

    The timed loop runs INSIDE one jitted program (lax.fori_loop with a data dependency
    between iterations) and synchronizes via a host transfer of the reduced output:
    on this platform's remote-execution tunnel, ``block_until_ready`` on dispatched calls
    returns before execution completes, so naive python-loop timing is meaningless.
    """
    import jax
    import jax.numpy as jnp
    from sisr_tpu.models.advanced import EDSR

    model = EDSR(net_features=64, num_blocks=16, scale=4, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.rand(BATCH, 128, 128, 3), jnp.float32)
    variables = model.init(rng, x)

    @jax.jit
    def loop(params, x):
        def body(i, carry):
            y = model.apply({'params': params}, carry)
            # chain iterations: feed a (strided) view of the output back as input
            return (y[:, ::4, ::4, :] * 0.999).astype(carry.dtype)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))

    float(np.asarray(loop(variables['params'], x)))  # compile + first run
    t0 = time.perf_counter()
    float(np.asarray(loop(variables['params'], x)))  # host transfer = real barrier
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH / dt


def main():
    throughput = measure_tpu()
    baseline = get_baseline()
    print(json.dumps({
        'metric': 'images_per_sec_per_chip_edsr_4x_128to512',
        'value': round(throughput, 3),
        'unit': 'img/s/chip',
        'vs_baseline': round(throughput / baseline, 2),
    }))


if __name__ == '__main__':
    main()

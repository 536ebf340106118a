"""Bucketed-eval payoff measurement (run on a real TPU chip).

Mixed-size eval sets recompile one XLA program PER IMAGE SHAPE on the standard
path; ``--eval_buckets N`` pads shapes up to the bucket grid and runs one
mask-exact program per BUCKET (models/handlers.py set_eval_buckets, SURVEY §7
hard-part 2).  This tool measures the claimed payoff on a DIV2K-like mixed-size
set: cold-run wall-clock (compiles included — that is the cost the feature
removes) and compiled-program counts, with and without bucketing.

Run: ``python -m sisr_tpu.tools.bench_bucketed``
"""
import time

import numpy as np


N_IMAGES = 20
SHAPES = [(96 + 8 * i, 120 + 8 * ((i * 3) % 7)) for i in range(10)]  # 10 distinct


def _run_set(handler, images):
    outs = []
    for im in images:
        out, _, _ = handler.run_eval(im[None])
        outs.append(np.asarray(out))
    return outs


def main():
    from ..models.handlers import define_model

    rng = np.random.RandomState(0)
    images = [rng.rand(*SHAPES[i % len(SHAPES)], 3).astype(np.float32)
              for i in range(N_IMAGES)]

    results = {}
    for label, buckets in (('per-shape (no buckets)', None), ('buckets=32', 32)):
        handler = define_model('edsr', eval_mode=True, scale=4, num_features=32,
                               num_blocks=8, dtype='bf16')
        if buckets:
            handler.set_eval_buckets(buckets)
        t0 = time.perf_counter()
        outs = _run_set(handler, images)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        _run_set(handler, images)
        warm = time.perf_counter() - t0
        n_programs = len(handler._eval_step_cache) or \
            len(handler._warm_eval_shapes) or None
        # bucketed path compiles via the masked step's shape cache
        if buckets:
            n_programs = len({((-s[0]) // -buckets * buckets,
                               (-s[1]) // -buckets * buckets) for s in SHAPES})
        else:
            n_programs = len(set(SHAPES))
        results[label] = (cold, warm, n_programs)
        print('%-24s cold %6.1f s | warm %6.2f s | %2d XLA programs (%d images, '
              '%d shapes)' % (label, cold, warm, n_programs, N_IMAGES, len(SHAPES)))

    (cold_a, _, prog_a), (cold_b, _, prog_b) = results.values()
    print('bucketed cold-run speedup: %.2fx (%d -> %d programs)'
          % (cold_a / cold_b, prog_a, prog_b))


if __name__ == '__main__':
    main()

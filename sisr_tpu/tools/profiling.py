"""Profiling helpers: jax.profiler traces + wall-clock timers.

The reference's observability was perf_counter timing + an nvidia-smi helper
(ref: models/__init__.py:508-511, helper_functions.py:75-91).  TPU-native equivalents:
``trace()`` captures a jax profiler trace viewable in TensorBoard/Perfetto, and
``device_timer`` measures honest device time (host transfer as the barrier — see
bench.py for why block_until_ready is not trustworthy on remote-attached chips).
"""
from contextlib import contextmanager
import time

import numpy as np


@contextmanager
def trace(log_dir):
    """Capture a jax profiler trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def device_timer(result_holder=None, label=''):
    """Time a device computation with a real completion barrier.

    The block must leave its final output in ``result_holder['out']`` (a jax array);
    the timer transfers a reduced view to host to guarantee completion.
    """
    holder = result_holder if result_holder is not None else {}
    tic = time.perf_counter()
    yield holder
    out = holder.get('out')
    if out is not None:
        np.asarray(out.sum() if hasattr(out, 'sum') else out)
    toc = time.perf_counter()
    holder['seconds'] = toc - tic
    if label:
        print('%s: %.4fs' % (label, holder['seconds']))

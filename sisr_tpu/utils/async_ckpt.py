"""Background checkpoint writer: overlap the device->host fetch and disk write of a
checkpoint with the next epoch's compute.

Motivation (measured, paper-scale soak `soak_runs/edsr_paper/`): EDSR 256f trains 512
images in ~4.9 s/epoch on one v5e, but the per-epoch full-state checkpoint (517 MB of
params + Adam moments) crossing a ~35 MB/s remote tunnel pushed the epoch wall-clock to
~35 s — the save, not the chip, set the pace.  The reference saves synchronously every
epoch (ref: Code/SISR/models/__init__.py:349-380 combined with train_model.py's epoch
loop); this module keeps that every-epoch contract but makes the save asynchronous:

1. ``start_fetch`` kicks ``copy_to_host_async()`` on every device-array leaf — the
   DMA/tunnel transfers for ALL leaves proceed in parallel (msgpack serialization used
   to fetch leaf-by-leaf, paying a round-trip latency per tensor).
2. ``submit`` queues the blocking part (realize numpy leaves, serialize, atomic write)
   on a single ordered worker thread, so the epoch loop returns to stepping immediately.

The train step donates its state buffers (training/state.py:63-90), and donation marks
the passed-in arrays DELETED at dispatch time — a background ``np.asarray`` racing the
next epoch's first step would raise "Array has been deleted".  ``snapshot_device``
therefore copies every leaf into fresh on-device buffers first (one jitted program for
the whole tree; ~GB/ms HBM-side, negligible next to the host transfer it unblocks) so
nothing the writer touches can be donated away underneath it.

Ordering and durability:

* one worker thread => writes land in submission order (an overwrite of the same epoch
  path cannot be reordered before the original).
* bounded queue => bounded memory: every queued save pins its device snapshot (~state
  size of HBM) until the worker realizes it, and epochs can outpace the tunnel drain
  (4.9 s compute vs ~15 s transfer at paper scale), so ``submit`` BLOCKS once
  ``max_pending`` saves are in flight.  The steady-state epoch pace is then
  max(compute, one transfer) instead of unbounded backlog growth.
* ``wait()`` is the fence; callers MUST fence before reading or deleting checkpoint
  files (load, cleanup, end of training).  Worker exceptions are re-raised there (and
  on the next ``submit``), so a failed write cannot pass silently.
* the pool's threads are non-daemonic and ``concurrent.futures`` joins them at
  interpreter exit, so a CLI that saves and returns still flushes its queue.
* writes go to a ``<path>.tmp-<pid>`` sibling then ``os.replace`` — a crash mid-write
  never leaves a truncated checkpoint under the real name.
"""
import functools
import os
import sys
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np


@functools.partial(jax.jit, static_argnums=1)
def _copy_cast_program(xs, dtype_names):
    """One device program: fresh copies of every leaf, casting where a target
    dtype name is given (None = plain copy).  jit specializes per (shapes,
    dtypes, static spec), so every distinct save signature compiles once."""
    import jax.numpy as jnp
    return [x.astype(d) if d is not None else jnp.copy(x)
            for x, d in zip(xs, dtype_names)]


def snapshot_device(tree, narrow_keys=(), narrow_dtype=None):
    """Copy every jax.Array leaf into a fresh on-device buffer in ONE jitted
    program.  The copies cannot be deleted by a later donated train step, so a
    background writer may realize them at leisure.

    Leaves under a top-level dict key in ``narrow_keys`` whose dtype is inexact
    and wider than ``narrow_dtype`` are CAST to ``narrow_dtype`` in the same
    program instead of copied (the ``checkpoint_dtype='bf16_moments'`` path) —
    a cast already yields a fresh buffer, so copying it again would double its
    HBM footprint for nothing.

    Multihost: save_model runs on rank 0 only, but this is safe because the
    training state is always FULLY REPLICATED (P()) over the mesh — JAX executes
    a single-process jit on fully-replicated global arrays against the caller's
    addressable shards (verified in the real 2-process launch,
    tests/test_multiprocess.py, which saves through this path).  Sharded
    (non-replicated) state would need all ranks to participate; nothing in the
    framework saves such state."""
    import jax.numpy as jnp
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [leaf for _, leaf in leaves_with_path]
    idx, spec = [], []
    for i, (path, leaf) in enumerate(leaves_with_path):
        if not isinstance(leaf, jax.Array):
            continue
        idx.append(i)
        top = getattr(path[0], 'key', None) if path else None
        if narrow_dtype is not None and top in narrow_keys \
                and jnp.issubdtype(leaf.dtype, jnp.inexact) \
                and leaf.dtype != jnp.dtype(narrow_dtype):
            spec.append(jnp.dtype(narrow_dtype).name)
        else:
            spec.append(None)
    if idx:
        copies = _copy_cast_program([leaves[i] for i in idx], tuple(spec))
        for i, copy in zip(idx, copies):
            leaves[i] = copy
    return jax.tree_util.tree_unflatten(treedef, leaves)


_JIT_CAST_CACHE = {}


def cast_float_leaves(tree, dtype):
    """Cast every inexact-dtype jax.Array leaf of ``tree`` to ``dtype`` on device
    (one jitted program, cached per (leaf count, dtype)).  Used by the
    ``checkpoint_dtype='bf16_moments'`` knob: halving the optimizer-moment bytes
    on DEVICE halves their share of the device->host transfer — the part of the
    save that a remote tunnel actually charges for.  The cast also yields fresh
    buffers, so cast leaves are inherently donation-safe."""
    import jax.numpy as jnp
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, leaf in enumerate(leaves)
           if isinstance(leaf, jax.Array) and jnp.issubdtype(leaf.dtype, jnp.inexact)
           and leaf.dtype != dtype]
    if idx:
        key = (len(idx), jnp.dtype(dtype).name)
        fn = _JIT_CAST_CACHE.get(key)
        if fn is None:
            fn = _JIT_CAST_CACHE[key] = jax.jit(
                lambda xs: [x.astype(dtype) for x in xs])
        casts = fn([leaves[i] for i in idx])
        for i, cast in zip(idx, casts):
            leaves[i] = cast
    return jax.tree_util.tree_unflatten(treedef, leaves)


def cast_to_template_dtypes(template, tree):
    """Cast restored host leaves back to the dtypes of the live ``template`` tree
    (inverse of ``cast_float_leaves`` at load time: the training step's donated
    buffers must keep their original dtypes or the first step retraces and the
    moments stay narrow through the rest of the run)."""
    def _restore(tmpl, got):
        if hasattr(tmpl, 'dtype') and hasattr(got, 'dtype') \
                and got.dtype != tmpl.dtype:
            return np.asarray(got).astype(tmpl.dtype)
        return got
    return jax.tree_util.tree_map(_restore, template, tree)


def start_fetch(tree):
    """Begin parallel device->host copies for every jax.Array leaf of ``tree``.

    Returns ``tree`` unchanged; ``np.asarray`` on a leaf later blocks only until its
    own (already in-flight) copy completes.  Non-array leaves pass through.
    """
    def _kick(leaf):
        if isinstance(leaf, jax.Array):
            try:
                leaf.copy_to_host_async()
            except (RuntimeError, ValueError):
                pass  # deleted/committed-elsewhere arrays: np.asarray still works
        return leaf
    return jax.tree_util.tree_map(_kick, tree)


def realize(tree):
    """Materialize every leaf as host numpy (blocks on the in-flight copies)."""
    return jax.tree_util.tree_map(
        lambda leaf: np.asarray(leaf) if isinstance(leaf, jax.Array) else leaf, tree)


def sweep_stale_tmp(head, base, max_age_s=3600):
    """Reclaim crash-leftover '.tmp-<pid>-<base>' siblings older than
    ``max_age_s`` (a SIGKILLed writer can orphan a full-size ~500 MB staging
    file under a pid a restarted run can never match; cleanup deliberately
    ignores dot-prefixed names, so the writer itself must sweep them)."""
    import shutil
    import time
    suffix = '-%s' % base
    try:
        entries = os.listdir(head)
    except OSError:
        return
    for name in entries:
        if not (name.startswith('.tmp-') and name.endswith(suffix)):
            continue
        full = os.path.join(head, name)
        try:
            if time.time() - os.stat(full).st_mtime < max_age_s:
                continue  # plausibly a live writer (incl. this process's own)
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                os.remove(full)
        except OSError:
            pass


def atomic_write_bytes(path, payload):
    # dot-prefixed sibling (same filesystem for os.replace): a crash-leftover tmp
    # must never match the 'train_model_*' globs that clean_models / epoch
    # resolution scan, or cleanup would try to parse it as an epoch number
    head, base = os.path.split(path)
    sweep_stale_tmp(head, base)
    tmp = os.path.join(head, '.tmp-%d-%s' % (os.getpid(), base))
    with open(tmp, 'wb') as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())  # os.replace makes the NAME durable, not the data:
        # without this, power loss after the rename leaves a truncated checkpoint
    os.replace(tmp, path)
    try:  # make the rename itself durable
        dfd = os.open(head or '.', os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # platform without directory fsync: best effort


class AsyncCheckpointWriter:
    """Single-threaded ordered background writer with fence-time error propagation."""

    def __init__(self, max_pending=2):
        self._pool = None
        self._lock = threading.Lock()
        self._pending = []   # (path, future), submission order
        self._failed = []    # every worker failure since the last fence
        self.max_pending = max_pending

    def submit(self, path, job):
        """Queue ``job()`` (the blocking fetch+serialize+write). Raises any error a
        previously queued write produced.  Blocks (backpressure) while
        ``max_pending`` saves are already in flight — each queued save pins its
        device snapshot in HBM, so the queue must stay bounded."""
        self._reap(raise_failed=True)
        while True:
            with self._lock:
                in_flight = [f for _, f in self._pending if not f.done()]
            if len(in_flight) < self.max_pending:
                break
            in_flight[0].exception()  # wait for the oldest write to drain
            self._reap(raise_failed=True)
        with self._lock:
            if self._pool is None:
                self._pool = ThreadPoolExecutor(max_workers=1,
                                                thread_name_prefix='ckpt-writer')
            self._pending.append((path, self._pool.submit(job)))

    def _reap(self, raise_failed):
        with self._lock:
            done, still = [], []
            for path, fut in self._pending:
                (done if fut.done() else still).append((path, fut))
            self._pending = still
        for path, fut in done:
            err = fut.exception()
            if err is not None:
                self._failed.append((path, err))
        if raise_failed and self._failed:
            failures, self._failed = self._failed, []
            # every failure is reported: the raise carries the first, the rest
            # print — an operator must learn that MORE than one epoch is missing
            for extra_path, extra_err in failures[1:]:
                print('WARNING: background checkpoint write of %r also failed: %r'
                      % (extra_path, extra_err), file=sys.stderr)
            path, err = failures[0]
            raise RuntimeError('background checkpoint write of %r failed' % path) from err

    def wait(self, timeout=None):
        """Block until every queued write is on disk; re-raise the first failure.

        ``timeout`` (seconds, total across all pending writes) bounds the drain:
        on expiry a TimeoutError raises with the still-pending paths.  Use a
        bounded drain on failure paths — an unbounded wait on a wedged device
        transport would hang the shutdown and bury the root-cause traceback."""
        import time as _time
        deadline = None if timeout is None else _time.monotonic() + timeout
        with self._lock:
            pending = list(self._pending)
        for path, fut in pending:
            remaining = None if deadline is None \
                else max(0.0, deadline - _time.monotonic())
            try:
                fut.exception(timeout=remaining)  # waits; errors handled in _reap
            except TimeoutError:
                self._reap(raise_failed=True)  # surface failures seen so far first
                raise TimeoutError(
                    'background checkpoint writes still pending after %.0fs: %s'
                    % (timeout, self.pending_paths))
        self._reap(raise_failed=True)

    @property
    def pending_paths(self):
        with self._lock:
            return [path for path, _ in self._pending]


# process-global writer: checkpoints are frequently LOADED through a different handler
# object than the one that saved them (train -> eval in one process), so the fence must
# cover every pending write in the process, not one handler's
WRITER = AsyncCheckpointWriter()

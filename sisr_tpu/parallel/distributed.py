"""Multi-process (multi-host) runtime initialization.

The reference's parallelism stops at single-process ``nn.DataParallel``
(ref: Code/SISR/models/__init__.py:344-347); this framework scales past one host by
initializing the JAX distributed runtime and then building the hierarchical
2-D (dcn, data) mesh from ``parallel.make_multihost_mesh`` — gradient all-reduces
stay ICI-first, with one hop over DCN.

Launcher contract (set by the job scheduler on every process):

* ``SISR_TPU_COORDINATOR`` — ``host:port`` of process 0;
* ``SISR_TPU_NUM_PROCESSES`` / ``SISR_TPU_PROCESS_ID`` — world size / this rank.

On TPU pods (GKE/GCE), ``jax.distributed.initialize()`` auto-discovers all three, so
only setting ``SISR_TPU_MULTIHOST=1`` is required.  Safe to call on a single process
(no env set -> no-op) and idempotent.
"""
import os

_initialized = False


def maybe_init_distributed():
    """Initialize jax.distributed from the launcher env; returns True if multi-host."""
    global _initialized
    if _initialized:
        return True
    if os.environ.get('SISR_TPU_MULTIHOST') != '1' \
            and 'SISR_TPU_COORDINATOR' not in os.environ:
        return False

    import jax
    kwargs = {}
    explicit = 'SISR_TPU_COORDINATOR' in os.environ
    if explicit:
        missing = [v for v in ('SISR_TPU_NUM_PROCESSES', 'SISR_TPU_PROCESS_ID')
                   if v not in os.environ]
        if missing:
            # defaulting to a 1-process world at rank 0 would bring every rank up
            # as an independent job that believes it is primary — duplicate
            # checkpoint/CSV writes and silently-wrong (non-pod) training
            raise RuntimeError('SISR_TPU_COORDINATOR is set but %s %s missing — '
                               'the launcher must export all three.'
                               % (' and '.join(missing),
                                  'is' if len(missing) == 1 else 'are'))
        kwargs = {
            'coordinator_address': os.environ['SISR_TPU_COORDINATOR'],
            'num_processes': int(os.environ['SISR_TPU_NUM_PROCESSES']),
            'process_id': int(os.environ['SISR_TPU_PROCESS_ID']),
        }
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        if explicit and int(os.environ['SISR_TPU_NUM_PROCESSES']) > 1:
            # an env that explicitly requested a multi-rank world must not degrade
            # to N independent single-process jobs all believing they are rank 0
            raise RuntimeError('multi-host init FAILED for an explicit %s-process '
                               'launch: %s (jax.distributed.initialize must run '
                               'before any other jax work)'
                               % (os.environ['SISR_TPU_NUM_PROCESSES'], e)) from e
        # auto-discovery path (SISR_TPU_MULTIHOST=1 outside a pod) or a repeated
        # single-process call — degrade to single-process with a warning
        print('WARNING: multi-host init skipped: %s' % e)
        return False
    _initialized = True
    return True


def is_primary_host():
    """True on the process that should own filesystem writes (rank 0).

    On multi-process launches every process runs the same training loop (SPMD);
    checkpoints, CSV logs, plots and sample images must be written once, not once
    per host — gate them on this.
    """
    import jax
    return jax.process_index() == 0

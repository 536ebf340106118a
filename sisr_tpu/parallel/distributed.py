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
    if 'SISR_TPU_COORDINATOR' in os.environ:
        kwargs = {
            'coordinator_address': os.environ['SISR_TPU_COORDINATOR'],
            'num_processes': int(os.environ.get('SISR_TPU_NUM_PROCESSES', '1')),
            'process_id': int(os.environ.get('SISR_TPU_PROCESS_ID', '0')),
        }
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # RuntimeError: backend already up (initialize must precede ANY jax work)
        # or a second call; ValueError: auto-discovery found no coordinator
        # (SISR_TPU_MULTIHOST=1 outside a pod) — degrade to single-process
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

"""Device-mesh data/spatial parallelism.

The reference's only parallelism is single-process ``nn.DataParallel``
(ref: Code/SISR/models/__init__.py:344-347).  The TPU-native replacement is a
``jax.sharding.Mesh`` with named axes:

* ``data`` — batch-dimension sharding for train/eval steps (the DataParallel analog);
  gradients are averaged across shards by XLA-inserted all-reduces over ICI;
* ``space`` — optional spatial-tile sharding for large-image eval (the framework's
  sequence/context-parallel analog: the tile batch produced by the static tile grid is
  itself sharded across devices).

State (params/opt_state) is replicated; batches are sharded on their leading axis.  XLA
inserts the collectives; nothing here speaks NCCL/MPI.  Multi-host (DCN) would extend
``make_mesh`` with ``jax.distributed`` initialization — left as a seam, not needed for
single-node parity.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_names=('data',), devices=None, shape=None):
    """Build a mesh over local devices.

    1-D by default (pure ICI data parallelism).  Pass ``axis_names=('dcn', 'data')`` and
    ``shape=(n_hosts, devices_per_host)`` for the multi-host layout: the leading axis
    maps to the slower DCN links, the trailing axis to ICI, so batch sharding over
    ``('dcn', 'data')`` keeps the gradient all-reduce hierarchical (ICI-first).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                'make_mesh: requested %d devices but only %d visible (%s). '
                'For multi-chip testing without hardware, provision a virtual '
                'platform BEFORE jax initializes: JAX_PLATFORMS=cpu plus '
                "jax.config.update('jax_num_cpu_devices', n)."
                % (n_devices, len(devices), [d.platform for d in devices[:4]]))
        devices = devices[:n_devices]
    dev_array = np.array(devices)
    if shape is not None:
        dev_array = dev_array.reshape(shape)
    elif len(axis_names) > 1:
        # default multi-axis layout: everything on the trailing (fastest/ICI) axis;
        # pass an explicit shape for a real host x chip factorization
        dev_array = dev_array.reshape((1,) * (len(axis_names) - 1) + (len(devices),))
    return Mesh(dev_array, axis_names)


def make_multihost_mesh(devices_per_host=None, batch_axes=('dcn', 'data'),
                        n_devices=None):
    """Multi-host (DCN + ICI) mesh seam.

    In a true multi-host deployment, call ``jax.distributed.initialize()`` before this
    (driver/launcher responsibility); here we build the 2-D mesh over the visible
    devices (or the first ``n_devices`` of them), which is also how the layout is
    exercised in tests on virtual devices.
    """
    devices = jax.devices()
    if n_devices is not None:
        if jax.process_count() > 1:
            # slicing jax.devices() (process-major order) would keep only rank 0's
            # chips in the mesh while other ranks still join the SPMD program —
            # the override exists for single-process dryruns only
            raise ValueError('n_devices override is not valid on a multi-process '
                             'launch — the mesh must span every rank\'s devices.')
        devices = devices[:n_devices]
    n_hosts = max(jax.process_count(), 1)
    per_host = devices_per_host or len(devices) // n_hosts
    if n_hosts > 1 and n_devices is None:
        # real multi-process launch: jax.devices() ordering is NOT guaranteed
        # host-contiguous, and a naive reshape could put the fast 'data' axis across
        # DCN — use the topology-aware factorization when slice info exists
        # (multi-slice TPU pods), else group by process boundary (single-slice pods,
        # CPU multi-process): rows = hosts (DCN axis), columns = that host's local
        # devices (ICI axis)
        try:
            from jax.experimental import mesh_utils
            dev_array = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, per_host),
                dcn_mesh_shape=(len(devices) // per_host, 1),
                devices=devices).reshape(len(devices) // per_host, per_host)
        except ValueError:
            by_proc = {}
            for d in devices:
                by_proc.setdefault(d.process_index, []).append(d)
            counts = {p: len(v) for p, v in by_proc.items()}
            if len(set(counts.values())) > 1:
                raise RuntimeError('Hosts expose unequal device counts %s — a '
                                   'rectangular (dcn, data) mesh needs the same '
                                   'number of local devices on every rank.'
                                   % counts)
            if devices_per_host and devices_per_host != next(iter(counts.values())):
                raise RuntimeError('devices_per_host=%d requested but every rank '
                                   'exposes %d local devices — partial-host meshes '
                                   'are not supported on multi-process launches.'
                                   % (devices_per_host, next(iter(counts.values()))))
            dev_array = np.array([by_proc[p] for p in sorted(by_proc)])
        mesh = Mesh(dev_array, batch_axes)
    else:
        mesh = make_mesh(axis_names=batch_axes, devices=devices,
                         shape=(len(devices) // per_host, per_host))
    return MeshContext(mesh=mesh, batch_axis=batch_axes)


class MeshContext:
    """Sharding helper bound to a mesh: replicate state, shard batches."""

    def __init__(self, mesh=None, n_devices=None, batch_axis='data'):
        if mesh is None:
            axes = (batch_axis,) if isinstance(batch_axis, str) else tuple(batch_axis)
            mesh = make_mesh(n_devices, axis_names=axes)
        self.mesh = mesh
        self.batch_axis = batch_axis
        self.batch_sharding = NamedSharding(self.mesh, P(batch_axis))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def n_devices(self):
        return self.mesh.devices.size

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def shard_batch(self, batch, shard_factor=1, stacked_steps=False):
        """Shard dict entries on their batch axis (must divide by mesh size).

        ``shard_factor > 1`` marks the arrays as PROCESS-LOCAL shards of a global
        batch ``shard_factor`` times larger (multihost input sharding: each rank's
        loader decoded only its contiguous slice — DataLoader ``process_shard``).
        The global device array is assembled from the local shards with
        ``jax.make_array_from_process_local_data``; no host materializes, decodes
        or uploads another host's data.

        ``stacked_steps`` handles the fused K-step dispatch layout: leaves are
        (K, B, ...) with the batch on axis 1 (axis 0 is the scan axis, never
        sharded).  Its non-divisible fallback device_puts unsharded — one upload
        covers K steps — where the per-step layout leaves the host array for jit
        to stage.
        """
        axis = 1 if stacked_steps else 0
        sharding = NamedSharding(self.mesh, P(None, self.batch_axis)) \
            if stacked_steps else self.batch_sharding
        out = {}
        for k, v in batch.items():
            if not (hasattr(v, 'ndim') and getattr(v, 'ndim', 0) > axis):
                out[k] = v
            elif shard_factor > 1:
                gshape = tuple(s * shard_factor if i == axis else s
                               for i, s in enumerate(v.shape))
                if gshape[axis] % self.n_devices != 0:
                    raise RuntimeError(
                        'Process-sharded global batch of %d does not divide the '
                        '%d-device mesh — choose a batch_size divisible by the '
                        'device count.' % (gshape[axis], self.n_devices))
                out[k] = jax.make_array_from_process_local_data(
                    sharding, np.asarray(v), gshape)
            elif v.shape[axis] % self.n_devices == 0:
                out[k] = jax.device_put(v, sharding)
            elif stacked_steps:
                out[k] = jax.device_put(v)
            else:
                out[k] = v
        return out

    def pad_batch_to_devices(self, batch, keys=('lr', 'hr', 'metadata')):
        """Pad the leading axis up to a multiple of the mesh size (masked entries are
        repeats of the last element; callers slice the outputs back)."""
        n = self.n_devices
        out = dict(batch)
        for k in keys:
            v = batch.get(k)
            if v is None or not hasattr(v, 'shape') or v.ndim == 0:
                continue
            b = v.shape[0]
            pad = (-b) % n
            if pad:
                reps = np.repeat(v[-1:], pad, axis=0)
                out[k] = np.concatenate([v, reps], axis=0)
        return out

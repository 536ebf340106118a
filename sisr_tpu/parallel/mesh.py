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


def make_mesh(n_devices=None, axis_names=('data',), devices=None):
    """Build a 1-D (or reshaped) mesh over local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    dev_array = np.array(devices)
    if len(axis_names) > 1:
        side = int(round(len(devices) ** (1.0 / len(axis_names))))
        dev_array = dev_array.reshape((side,) * len(axis_names))
    return Mesh(dev_array, axis_names)


class MeshContext:
    """Sharding helper bound to a mesh: replicate state, shard batches."""

    def __init__(self, mesh=None, n_devices=None, batch_axis='data'):
        self.mesh = mesh if mesh is not None else make_mesh(n_devices,
                                                            axis_names=(batch_axis,))
        self.batch_axis = batch_axis
        self.batch_sharding = NamedSharding(self.mesh, P(batch_axis))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def n_devices(self):
        return self.mesh.devices.size

    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def shard_batch(self, batch):
        """Shard dict entries on their leading axis (must divide by mesh size)."""
        out = {}
        for k, v in batch.items():
            if hasattr(v, 'ndim') and getattr(v, 'ndim', 0) >= 1 \
                    and v.shape[0] % self.n_devices == 0:
                out[k] = jax.device_put(v, self.batch_sharding)
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

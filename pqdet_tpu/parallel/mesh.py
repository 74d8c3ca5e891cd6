"""Device mesh + sharding for data-parallel training.

The reference's only parallelism is single-process ``nn.DataParallel``
replicate/scatter/gather (tools.py:216). The TPU-native equivalent is a 1-D
``data`` mesh: the batch dim is sharded across chips over ICI, parameters
are replicated, and gradient/batch-norm reductions become XLA collectives
inserted automatically by jit under sharding constraints (sync-BN across
shards — documented divergence from per-replica BN; it only helps AP).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
SPACE_AXIS = 'space'


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data mesh over the first ``num_devices`` devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def make_mesh_2d(n_data: int, n_space: int, devices=None) -> Mesh:
    """('data', 'space') mesh: batch shards over 'data', the image HEIGHT
    axis over 'space' (XLA GSPMD inserts the conv halo exchanges). Spatial
    partitioning is the model-parallel axis that matters for a conv
    detector — it lifts the per-chip memory/latency ceiling for LARGE
    inputs (e.g. 1280px) where a batch shard alone still does not fit or
    a single image's latency matters. Adjacent mesh positions along
    'space' exchange halos every conv, so keep 'space' the minor
    (fastest-varying, ICI-neighbour) axis."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_space
    if len(devices) < need:
        raise ValueError(f'mesh {n_data}x{n_space} needs {need} devices, '
                         f'have {len(devices)}')
    return Mesh(np.array(devices[:need]).reshape(n_data, n_space),
                (DATA_AXIS, SPACE_AXIS))


def spatial_batch_shardings(mesh: Mesh) -> dict:
    """Per-leaf shardings for the production gt-mode batch on a 2-D mesh:
    images (B, H, W, C) shard batch x height; the padded GT boxes
    (B, G, 6) shard batch only (replicated over 'space' — the label grids
    they expand to are small)."""
    return {'image': NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS)),
            'gt': NamedSharding(mesh, P(DATA_AXIS))}


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, batch):
    """Device_put every leaf with its batch dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_pytree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_devices(batch_size: int, n_devices: int) -> int:
    """Smallest batch >= batch_size divisible by the mesh size."""
    rem = batch_size % n_devices
    return batch_size if rem == 0 else batch_size + (n_devices - rem)


def init_multihost(coordinator_address: str = None, num_processes: int = None,
                   process_id: int = None):
    """Join a multi-host run (one controller process per host).

    After this, jax.devices() spans every chip in the slice and make_mesh
    builds a GLOBAL data mesh (batch shards ride ICI within a host, DCN
    across hosts). The Trainer detects jax.process_count() > 1 and switches
    to multi-host data loading automatically: every host computes the same
    system.seed-seeded epoch plan, loads only its contiguous slice of each
    batch (TrainData num_hosts/host_id), and assembles global arrays with
    host_local_batch_to_global; eval + checkpoints run on process 0. Call
    before any other JAX use; arguments come from the TPU environment when
    omitted. Tested end-to-end by tests/test_multihost.py (2-process CPU
    cluster, loss identical to the single-host run on the same batch).
    """
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def host_local_batch_to_global(mesh: Mesh, batch, sharding=None):
    """Assemble a global batch from per-host local shards (multi-host data
    loading: each host reads only its slice of the batch). On a single
    process this is equivalent to shard_batch_pytree. ``sharding`` overrides
    the default batch sharding (e.g. P(None, 'data') for scan-unrolled
    batch groups)."""
    sharding = sharding or batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch)


def fit_mesh_to_batch(batch_size: int, num_devices: int = 0) -> int:
    """Largest device count <= available that divides the batch (the batch
    dim must shard evenly; a bs-12 job on 8 chips runs data-parallel x4)."""
    avail = num_devices or len(jax.devices())
    for n in range(min(avail, batch_size), 0, -1):
        if batch_size % n == 0:
            return n
    return 1

"""Multi-host (pod-slice) runtime glue.

Role of the reference's cluster/distributed scaffolding — the SLURM launch
(slurm_start_train.sbatch, run-single.sh), the never-activated
torch.distributed DDP wrap (nerf/utils.py:299-354), and the rank-0-only
logging gates (utils.py:472-479, 1084-1085) — rebuilt TPU-native:

  - `initialize()` wraps jax.distributed.initialize(): on TPU pods the
    coordinator/process topology comes from the TPU runtime environment,
    so no arguments are needed per worker (launch/tpu_pod_launch.sh starts
    the same command on every worker).
  - `global_mesh()` builds the ('data',) mesh over ALL processes' devices;
    gradient psum then rides ICI within a host and DCN across hosts (XLA
    picks the hierarchical reduction).
  - `host_local_batch_to_global(batch, mesh)` assembles per-host numpy
    batches into one globally-sharded jax.Array
    (jax.make_array_from_process_local_data) — each host feeds only its
    own shard, the multi-host analogue of mesh.shard_batch.
  - `replicate_from_host(tree, mesh)` places host-identical values (params,
    occupancy bitfield, RNG seed) fully replicated across all processes.
    Every process must pass bitwise-identical data (same seed — true for
    checkpoint loads and deterministic inits).
  - `is_primary()` gates file writes (checkpoints, tensorboard, logs) to
    process 0.

Untestable beyond one process in this image (single chip); the logic is
exercised single-process in tests/test_parallel.py and the sharded step
itself is validated on the virtual 8-device mesh.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Bring up the JAX distributed runtime (idempotent).

    On Cloud TPU pod slices all three arguments are inferred from the TPU
    environment; pass them explicitly only for CPU/GPU multi-process runs.

    MUST run before any JAX call that initializes the XLA backend (even
    jax.devices()/jax.process_count() count) — main.py calls it before the
    Trainer is built.  If the backend is already up (tests, notebooks), the
    attempt raises; that case is reported loudly and the run proceeds
    single-process rather than silently misconfigured.
    """
    if getattr(initialize, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except ValueError:
        # no coordinator configuration in the environment: a genuine
        # single-process run
        pass
    except RuntimeError as e:
        import sys
        print(
            "[multihost] jax.distributed.initialize failed "
            f"({e}); continuing as a single process. On a pod slice this "
            "means initialize() ran after the XLA backend came up — call "
            "it before any JAX computation.",
            file=sys.stderr, flush=True,
        )
    initialize._done = True


def is_primary():
    return jax.process_index() == 0


def global_mesh(axis_name="data"):
    """1-D mesh over every device of every process (pod-slice-wide DP)."""
    return Mesh(np.asarray(jax.devices()), axis_names=(axis_name,))


def host_local_batch_to_global(batch, mesh, axis_name="data"):
    """Per-host [n_local, ...] numpy leaves -> one global jax.Array sharded
    along axis 0 of `axis_name` (global batch = sum of host batches).

    Single-process this is identical to parallel.mesh.shard_batch.
    """
    sh = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, batch)


def replicate_from_host(tree, mesh):
    """Host-identical values -> fully-replicated global arrays."""
    sh = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, tree)


def all_processes_barrier(name="barrier"):
    """Synchronize processes (e.g. before reading a checkpoint one process
    just wrote).  No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)

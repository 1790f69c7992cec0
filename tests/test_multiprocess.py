"""REAL multi-process multihost test: two OS processes, a TCP coordinator,
a global 8-device mesh (4 virtual CPU devices per process).

This is the test SURVEY section 4 said the reference never had: it
exercises jax.distributed.initialize, cross-process mesh construction,
host-local batch assembly, a psum over DCN(-simulated), and the barrier —
the actual code paths --multihost 1 uses on a pod slice
(parallel/multihost.py).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["ENERF_REPO"])
# force CPU with 4 local devices BEFORE any jax import side effects
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from enerf_tpu.parallel import multihost

pid = int(sys.argv[1])
multihost.initialize(
    coordinator_address=os.environ["COORD"], num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert multihost.is_primary() == (pid == 0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = multihost.global_mesh()
assert mesh.devices.size == 8, mesh.devices.size

# host-local batches -> one global array; a global sum sees BOTH halves
local = np.full((8, 2), float(pid + 1), np.float32)   # proc0: 1s, proc1: 2s
g = multihost.host_local_batch_to_global({"x": local}, mesh)["x"]
assert g.shape == (16, 2), g.shape

repl = NamedSharding(mesh, P())
total = jax.jit(lambda x: jnp.sum(x), out_shardings=repl)(g)
expect = 8 * 2 * 1.0 + 8 * 2 * 2.0
assert float(total) == expect, (float(total), expect)

r = multihost.replicate_from_host({"y": np.arange(4.0, dtype=np.float32)}, mesh)
assert r["y"].sharding.is_fully_replicated

# a REAL sharded train step across the two processes: state replicated
# from identical host values, batch assembled host-locally, grads psum'd
# over the process boundary
from enerf_tpu.models.field import FieldStatic, init_field_params
from enerf_tpu.parallel.mesh import make_sharded_train_step
from enerf_tpu.train.state import init_train_state
from enerf_tpu.train.step import StepStatics

static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=2,
                     log2_hashmap_size=8)
params = init_field_params(jax.random.PRNGKey(0), static)
state, opt = init_train_state(params, lr0=1e-2, iters=10)
ss = StepStatics(
    field_static=static, num_steps=4, upsample_steps=0, min_near=0.2,
    density_scale=1.0, C_thres=0.2, event_only=True, use_luma=False,
    linlog=True, weight_loss_rgb=1.0, negative_event_sampling=False,
    w_no_ev=1.0, out_dim_color=1,
)
state = multihost.replicate_from_host(jax.tree.map(np.asarray, state), mesh)
rng = np.random.RandomState(pid)
n_local = 8
d = rng.randn(n_local, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
o = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (n_local, 1))
batch = multihost.host_local_batch_to_global({
    "rays_evs_o1": o, "rays_evs_d1": d,
    "rays_evs_o2": o + 0.01, "rays_evs_d2": d,
    "pols": np.ones((n_local,), np.float32),
}, mesh)
step = make_sharded_train_step(ss, opt, mesh, mode="events")
state, scalars = step(state, batch, jax.random.PRNGKey(1))
loss = float(scalars["loss"])
assert np.isfinite(loss), loss
assert int(state.step) == 1

multihost.all_processes_barrier("test-end")
print(f"worker {pid} ok loss={loss:.6f}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("ENERF_SKIP_MULTIPROC") == "1",
                    reason="multiprocess test disabled")
def _run_workers(script, port):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(ENERF_REPO=repo, COORD=f"127.0.0.1:{port}")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out)
    return procs, outs


def test_two_process_multihost(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    # free-port discovery is inherently TOCTOU (the coordinator re-binds
    # the probed port moments later) — retry once with a fresh port if the
    # first attempt loses the race
    for attempt in range(2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs, outs = _run_workers(script, port)
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} ok" in out

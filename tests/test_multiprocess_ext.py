"""Multihost hardening drills (VERDICT r4 item 7), extending
test_multiprocess.py's two-process bring-up:

1. a FOUR-OS-process global mesh (4 procs x 2 virtual CPU devices = 8)
   running the real sharded train step AND the sharded eval-tile render +
   gather (parallel/mesh.make_sharded_render — the role of the
   reference's dead dist.all_gather eval path, utils.py:1064-1079),
   checked bit-level against a single-device render of the same params;
2. a crash -> resume-from-latest drill: a 2-process job trains, saves a
   checkpoint through the async-drain + cross-process barrier (the
   trainer's save path), is then SIGKILLed mid-run (one worker first,
   then the job — the SLURM reality: one node dies, the scheduler reaps
   the job), and a FRESH 2-process job resumes from `latest`, verifying
   the restored step counter and cross-process parameter agreement.

Both are slow-marked (run with --full).
"""

import os
import signal
import socket
import subprocess
import sys
import time

import pytest

_COMMON = r"""
import os, sys
sys.path.insert(0, os.environ["ENERF_REPO"])
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                           + os.environ["LOCAL_DEVICES"])
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from enerf_tpu.parallel import multihost

pid = int(sys.argv[1])
nproc = int(os.environ["NUM_PROCESSES"])
multihost.initialize(coordinator_address=os.environ["COORD"],
                     num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
mesh = multihost.global_mesh()

from enerf_tpu.models.field import FieldStatic, init_field_params
from enerf_tpu.parallel.mesh import make_sharded_train_step
from enerf_tpu.train.state import init_train_state
from enerf_tpu.train.step import StepStatics

static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=2,
                     log2_hashmap_size=8)
ss = StepStatics(
    field_static=static, num_steps=4, upsample_steps=0, min_near=0.2,
    density_scale=1.0, C_thres=0.2, event_only=True, use_luma=False,
    linlog=True, weight_loss_rgb=1.0, negative_event_sampling=False,
    w_no_ev=1.0, out_dim_color=1,
)

def make_batch(seed, n_local, mesh):
    rng = np.random.RandomState(seed)
    d = rng.randn(n_local, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (n_local, 1))
    return multihost.host_local_batch_to_global({
        "rays_evs_o1": o, "rays_evs_d1": d,
        "rays_evs_o2": o + 0.01, "rays_evs_d2": d,
        "pols": np.ones((n_local,), np.float32),
    }, mesh)
"""

_WORKER_4PROC = _COMMON + r"""
assert mesh.devices.size == 8, mesh.devices.size

params = init_field_params(jax.random.PRNGKey(0), static)
state, opt = init_train_state(params, lr0=1e-2, iters=10)
state = multihost.replicate_from_host(jax.tree.map(np.asarray, state), mesh)
step = make_sharded_train_step(ss, opt, mesh, mode="events")
for i in range(2):
    state, scalars = step(state, make_batch(100 + i + pid * 7, 4, mesh),
                          jax.random.PRNGKey(1 + i))
loss = float(scalars["loss"])
assert np.isfinite(loss), loss
assert int(state.step) == 2

# sharded eval-tile render + gather: every process passes the SAME global
# ray set; XLA shards rays over the 8 devices (2 per host) and the
# replicated output sharding emits the cross-host tile gather.
from enerf_tpu.parallel.mesh import make_sharded_render
from enerf_tpu.render.march import render_rays_march
from enerf_tpu.render.occupancy import init_occupancy, ball_bitfield

occ = init_occupancy(1.0)._replace(occ_bitfield=ball_bitfield())
occ_repl = multihost.replicate_from_host(
    np.asarray(occ.occ_bitfield), mesh)

H = W = 8
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
d = np.stack([(xx - W / 2) / W, (yy - H / 2) / H, np.ones_like(xx)], -1)
d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).reshape(-1, 3)
d = d.astype(np.float32)
o = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (d.shape[0], 1))

render = make_sharded_render(static, mesh, num_samples=16, max_steps=64)
host_params = jax.tree.map(np.asarray, state.params)
out = render(state.params, occ_repl, jnp.asarray(o), jnp.asarray(d))
img_gathered = np.asarray(out["image"])

# single-device oracle: same params on local device 0, plain jit
with jax.default_device(jax.local_devices()[0]):
    ref = render_rays_march(
        jax.tree.map(jnp.asarray, host_params), static,
        jnp.asarray(np.asarray(occ.occ_bitfield)),
        jnp.asarray(o), jnp.asarray(d),
        num_samples=16, max_steps=64, bg_color=1.0)
    img_ref = np.asarray(ref["image"])
diff = np.abs(img_gathered - img_ref).max()
assert diff < 1e-4, f"eval tile gather mismatch: {diff}"

multihost.all_processes_barrier("test-end")
print(f"worker {pid} ok loss={loss:.6f} evaldiff={diff:.2e}", flush=True)
"""

# Phase 1: train 4 steps, checkpoint through the trainer's save protocol
# (primary writes, async drain, cross-process barrier), signal readiness
# via a marker file, then spin — the host kills the job mid-run.
_WORKER_CRASH = _COMMON + r"""
from enerf_tpu.train.checkpoints import CheckpointManager

params = init_field_params(jax.random.PRNGKey(0), static)
state, opt = init_train_state(params, lr0=1e-2, iters=10)
state = multihost.replicate_from_host(jax.tree.map(np.asarray, state), mesh)
step = make_sharded_train_step(ss, opt, mesh, mode="events")
for i in range(4):
    state, scalars = step(state, make_batch(200 + i, 8, mesh),
                          jax.random.PRNGKey(10 + i))
assert int(state.step) == 4

ckpt = CheckpointManager(os.environ["CKPT_DIR"], name="drill",
                         async_save=True)
if multihost.is_primary():
    ckpt.save(state, None, epoch=1, stats={"loss": [float(scalars["loss"])]})
ckpt.wait()          # async writes must land before the barrier releases
multihost.all_processes_barrier("ckpt_ep1")

# keep "training" so the kill lands mid-run (the scheduler-reap reality)
open(os.path.join(os.environ["CKPT_DIR"], f"marker_{pid}"), "w").close()
for i in range(1000):
    state, scalars = step(state, make_batch(300 + i, 8, mesh),
                          jax.random.PRNGKey(100 + i))
print(f"worker {pid} should have been killed", flush=True)
sys.exit(3)
"""

_WORKER_RESUME = _COMMON + r"""
from enerf_tpu.train.checkpoints import CheckpointManager, load_checkpoint

params = init_field_params(jax.random.PRNGKey(0), static)
state, opt = init_train_state(params, lr0=1e-2, iters=10)
ckpt = CheckpointManager(os.environ["CKPT_DIR"], name="drill")
path = ckpt.resolve("latest")
assert path, f"no checkpoint to resume from in {os.environ['CKPT_DIR']}"
state, _occ, meta = load_checkpoint(path, state, None)
assert meta["epoch"] == 1, meta
assert meta["global_step"] == 4, meta
state = multihost.replicate_from_host(jax.tree.map(np.asarray, state), mesh)

step = make_sharded_train_step(ss, opt, mesh, mode="events")
for i in range(2):
    state, scalars = step(state, make_batch(400 + i, 8, mesh),
                          jax.random.PRNGKey(20 + i))
assert int(state.step) == 6, int(state.step)
loss = float(scalars["loss"])
assert np.isfinite(loss)

# cross-process parameter agreement after resume: same checkpoint + same
# global batches => identical replicated params on every host
checksum = float(sum(np.abs(np.asarray(v, np.float64)).sum()
                     for v in jax.tree.leaves(
                         jax.tree.map(np.asarray, state.params))))
multihost.all_processes_barrier("resume-end")
print(f"worker {pid} resumed ok step=6 loss={loss:.6f} "
      f"checksum={checksum:.6f}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(script_path, nproc, local_devices, extra_env):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(ENERF_REPO=repo, COORD=f"127.0.0.1:{_free_port()}",
               NUM_PROCESSES=str(nproc), LOCAL_DEVICES=str(local_devices),
               **extra_env)
    return [
        subprocess.Popen([sys.executable, str(script_path), str(pid)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]


def _communicate_all(procs, timeout):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out)
    return outs


@pytest.mark.slow
def test_four_process_mesh_train_and_eval_gather(tmp_path):
    script = tmp_path / "worker4.py"
    script.write_text(_WORKER_4PROC)
    for attempt in range(2):  # free-port TOCTOU retry (see test_multiprocess)
        procs = _launch(script, nproc=4, local_devices=2, extra_env={})
        outs = _communicate_all(procs, timeout=420)
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} ok" in out


@pytest.mark.slow
def test_crash_resume_from_latest(tmp_path):
    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    env = {"CKPT_DIR": str(ckpt_dir)}

    crash = tmp_path / "crash.py"
    crash.write_text(_WORKER_CRASH)
    procs = _launch(crash, nproc=2, local_devices=4, extra_env=env)
    # wait for both markers: checkpoint landed + job back in training
    deadline = time.time() + 300
    while time.time() < deadline:
        if all((ckpt_dir / f"marker_{i}").exists() for i in range(2)):
            break
        if any(p.poll() is not None for p in procs):
            outs = [p.communicate()[0] for p in procs]
            pytest.fail(f"crash-phase worker exited early:\n{outs}")
        time.sleep(0.5)
    else:
        for p in procs:
            p.kill()
        pytest.fail("markers never appeared")
    # one node dies first, then the scheduler reaps the job
    procs[1].send_signal(signal.SIGKILL)
    time.sleep(1.0)
    procs[0].send_signal(signal.SIGKILL)
    for p in procs:
        p.wait(timeout=60)
    assert (ckpt_dir / "drill_ep0001.npz").exists(), os.listdir(ckpt_dir)

    resume = tmp_path / "resume.py"
    resume.write_text(_WORKER_RESUME)
    for attempt in range(2):
        procs = _launch(resume, nproc=2, local_devices=4, extra_env=env)
        outs = _communicate_all(procs, timeout=300)
        if all(p.returncode == 0 for p in procs) or attempt == 1:
            break
    sums = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume worker {pid} failed:\n{out}"
        assert f"worker {pid} resumed ok step=6" in out
        sums.append(out.rsplit("checksum=", 1)[1].split()[0])
    assert sums[0] == sums[1], f"post-resume params diverged: {sums}"

"""Checkpoint save/load/rotate for the full training state.

Parity: reference nerf/utils.py:1295-1416 — every-epoch full checkpoints
(model, optimizer, scheduler, scaler, EMA, occupancy grid stats, epoch/
global_step/stats) with max_keep rotation, a separate best-by-metric
model-only checkpoint carrying the EMA weights, `latest` glob resolution,
and lenient partial loading.

TPU design: the whole TrainState + OccupancyState are pytrees; they are
flattened with key paths into one .npz per checkpoint plus a json sidecar
(step, epoch, stats).  No torch pickles; files are portable across hosts.
"""

import json
import os
import re
import threading

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def _snapshot(state, occupancy):
    """Flatten to {key: np.ndarray}, overlapping the device->host copies.

    All copies are STARTED first (copy_to_host_async), then materialized —
    so the transfers pipeline instead of running serially per leaf.  The
    snapshot MUST be materialized before this returns: the caller's next
    train step donates the state buffers (donate_argnums), after which any
    deferred np.asarray would raise 'Array has been deleted' (jax checks
    deletion before using a cached host copy).  The async win that remains
    for async_save is the npz DISK write on the worker thread.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(
        {"state": state, "occupancy": occupancy})
    for _, leaf in flat:
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _write_arrays(path, arrays, meta):
    """Materialize + write npz/json atomically (tmp + os.replace)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    with open(path + ".npz.tmp", "wb") as f:  # file object: savez won't
        np.savez(f, **arrays)                 # append another .npz suffix
    os.replace(path + ".npz.tmp", path + ".npz")
    with open(path + ".json.tmp", "w") as f:
        json.dump(meta, f)
    os.replace(path + ".json.tmp", path + ".json")
    return path + ".npz"


def save_checkpoint(path, state, occupancy=None, epoch=0, stats=None):
    """Write <path>.npz (+ .json).  Returns the npz path."""
    arrays = _snapshot(state, occupancy)
    meta = {
        "epoch": int(epoch),
        "global_step": int(np.asarray(state.step)),
        "stats": stats or {},
    }
    return _write_arrays(path, arrays, meta)


def load_checkpoint(path, state_template, occupancy_template=None):
    """Load into the shapes of the provided templates (lenient: missing keys
    keep template values, unexpected keys are ignored — utils.py:1383-1398).

    Returns (state, occupancy, meta_dict).
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    meta_path = path[:-4] + ".json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    def refill(template, prefix):
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        n_hit = 0
        for p, leaf in flat:
            key = "/".join([prefix] + [str(q) for q in p])
            if key in data and data[key].shape == np.asarray(leaf).shape:
                leaves.append(jnp.asarray(data[key], jnp.asarray(leaf).dtype))
                n_hit += 1
            else:
                leaves.append(leaf)
        if flat and n_hit == 0:
            raise KeyError(
                f"checkpoint {path} matched no keys under prefix {prefix!r}; "
                f"sample stored keys: {list(data.keys())[:3]}"
            )
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # paths were flattened under a dict {"state":…, "occupancy":…}
    state = refill(state_template, "['state']")
    occ = None
    if occupancy_template is not None:
        occ = refill(occupancy_template, "['occupancy']")
    return state, occ, meta


class CheckpointManager:
    """Rotating checkpoints + best tracking (reference Trainer semantics).

    `async_save=True` overlaps the npz/json DISK write + rotation with
    training on a worker thread.  The device->host pull itself happens on
    the caller's thread (pipelined across leaves via copy_to_host_async)
    because the next train step donates the state buffers — see _snapshot.
    Worker failures are re-raised by the next `wait()` (never silent).
    `wait()` drains pending saves; it is called before any load/resolve so
    readers never see a half-written file (writes are tmp + os.replace).
    """

    def __init__(self, ckpt_dir, name="ngp", max_keep=2, async_save=False):
        self.ckpt_dir = ckpt_dir
        self.name = name
        self.max_keep = max_keep
        self.async_save = async_save
        self._pending = []
        self._errors = []
        self._lock = threading.Lock()
        os.makedirs(ckpt_dir, exist_ok=True)

    def wait(self):
        """Block until every in-flight async save has landed on disk.
        Re-raises the first worker-thread failure, if any."""
        with self._lock:
            pending, self._pending = self._pending, []
        for t in pending:
            t.join()
        with self._lock:
            errors, self._errors = self._errors, []
        if errors:
            raise errors[0]

    def _list(self):
        pat = re.compile(rf"{re.escape(self.name)}_ep(\d+)\.npz$")
        out = []
        for f in sorted(os.listdir(self.ckpt_dir)):
            m = pat.match(f)
            if m:
                out.append((int(m.group(1)), os.path.join(self.ckpt_dir, f)))
        return sorted(out)

    def _save(self, path, state, occupancy, epoch, stats, rotate):
        arrays = _snapshot(state, occupancy)
        meta = {
            "epoch": int(epoch),
            "global_step": int(np.asarray(state.step)),
            "stats": stats or {},
        }

        def work():
            try:
                _write_arrays(path, arrays, meta)
                if rotate:
                    with self._lock:
                        ckpts = self._list()
                        while len(ckpts) > self.max_keep:
                            ep, p = ckpts.pop(0)
                            for ext in (".npz", ".json"):
                                fp = p[:-4] + ext
                                if os.path.exists(fp):
                                    os.remove(fp)
            except Exception as e:  # surfaced by the next wait()
                if self.async_save:
                    with self._lock:
                        self._errors.append(e)
                else:
                    raise

        if self.async_save:
            t = threading.Thread(target=work, daemon=True)
            with self._lock:
                self._pending = [x for x in self._pending if x.is_alive()]
                self._pending.append(t)
            t.start()
        else:
            work()
        return path + ".npz"

    def save(self, state, occupancy, epoch, stats=None):
        path = os.path.join(self.ckpt_dir, f"{self.name}_ep{epoch:04d}")
        return self._save(path, state, occupancy, epoch, stats, rotate=True)

    def save_best(self, state, occupancy, epoch, stats=None):
        """Best-by-metric checkpoint with EMA weights swapped in
        (utils.py:1337-1345)."""
        best_state = state._replace(params=state.ema_params)
        path = os.path.join(self.ckpt_dir, f"{self.name}_best")
        return self._save(path, best_state, occupancy, epoch, stats,
                          rotate=False)

    def latest(self):
        self.wait()
        ckpts = self._list()
        return ckpts[-1][1] if ckpts else None

    def best(self):
        self.wait()
        p = os.path.join(self.ckpt_dir, f"{self.name}_best.npz")
        return p if os.path.exists(p) else None

    def resolve(self, which="latest"):
        """'latest' | 'best' | explicit path (utils.py:1353-1381)."""
        if which == "latest":
            return self.latest()
        if which == "best":
            return self.best() or self.latest()
        if which == "scratch":
            return None
        return which

"""Pose utilities: interpolation, quaternions, convention conversions.

Parity: reference utils/pose_utils.py — Slerp + cubic translation
interpolation at query timestamps (:138-160), quaternion<->matrix helpers
(:13-88), rotation validity checks (:191-228), nerf_matrix_to_ngp (:664-676).

TPU design: besides the host-side scipy interpolators (used once at dataset
build), `slerp_device`/`interp_pose_device` provide an on-device (quat, t)
pose interpolation so the per-event pose can be computed inside the train
step from keyframe poses — the memory/speed tradeoff the reference solves by
precomputing [M, 3, 4] pose arrays (provider.py:1204-1218) becomes a cheap
gather + slerp on TPU.
"""

import numpy as np
import jax.numpy as jnp
from scipy.interpolate import interp1d
from scipy.spatial.transform import Rotation as R
from scipy.spatial.transform import Slerp


# ----------------------------------------------------------------------------
# host-side (scipy) interpolation — dataset build time


def make_pose_interpolator(ts, poses):
    """ts: [K]; poses: [K, 4, 4] or [K, 3, 4] c2w.

    Returns callable query(ts_q) -> [N, 3, 4] float32 (Slerp rotations,
    cubic translations; reference provider.py:1208-1218, 1231-1235).
    """
    ts = np.asarray(ts, np.float64)
    poses = np.asarray(poses, np.float64)
    rot_i = Slerp(ts, R.from_matrix(poses[:, :3, :3]))
    kind = "cubic" if len(ts) >= 4 else "linear"
    trans_i = interp1d(ts, poses[:, :3, 3], axis=0, kind=kind, bounds_error=True)

    def query(ts_q):
        ts_q = np.clip(np.asarray(ts_q, np.float64), ts[0], ts[-1])
        rots = rot_i(ts_q).as_matrix()
        trans = trans_i(ts_q)
        out = np.zeros((len(ts_q), 3, 4), np.float32)
        out[:, :3, :3] = rots
        out[:, :3, 3] = trans
        return out

    return query


# ----------------------------------------------------------------------------
# quaternions (w, x, y, z) — numpy + jnp twins


def mat_to_quat_np(rot):
    """[..., 3, 3] -> [..., 4] (w, x, y, z)."""
    q = R.from_matrix(np.asarray(rot).reshape(-1, 3, 3)).as_quat()  # xyzw
    q = np.concatenate([q[:, 3:4], q[:, :3]], axis=1)
    return q.reshape(np.asarray(rot).shape[:-2] + (4,))


def quat_to_mat(q):
    """jnp [..., 4] (w, x, y, z) -> [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def slerp_device(q0, q1, u):
    """Batched quaternion slerp on device.  q0, q1: [..., 4]; u: [...]."""
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0, -q1, q1)  # shortest arc
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-6
    w0 = jnp.where(small, 1.0 - u, jnp.sin((1.0 - u) * theta) / jnp.where(small, 1.0, sin_t))
    w1 = jnp.where(small, u, jnp.sin(u * theta) / jnp.where(small, 1.0, sin_t))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def interp_pose_device(key_ts, key_quats, key_trans, ts_q):
    """On-device pose interpolation at query times.

    key_ts: [K] sorted keyframe times; key_quats: [K, 4]; key_trans: [K, 3];
    ts_q: [N].  Returns [N, 3, 4] (slerp rotation, linear translation —
    the cubic/linear distinction is imperceptible at event keyframe rates).
    """
    idx = jnp.clip(jnp.searchsorted(key_ts, ts_q, side="right") - 1, 0, len(key_ts) - 2)
    t0, t1 = key_ts[idx], key_ts[idx + 1]
    u = jnp.clip((ts_q - t0) / jnp.maximum(t1 - t0, 1e-12), 0.0, 1.0)
    q = slerp_device(key_quats[idx], key_quats[idx + 1], u)
    tr = key_trans[idx] * (1.0 - u)[:, None] + key_trans[idx + 1] * u[:, None]
    rot = quat_to_mat(q)
    return jnp.concatenate([rot, tr[..., None]], axis=-1)


# ----------------------------------------------------------------------------
# convention conversion + checks


def nerf_matrix_to_ngp(pose, scale=0.33, offset=(0, 0, 0)):
    """rub (OpenGL/NeRF) c2w -> rdf (instant-ngp/this repo) with scaling.

    Parity: reference utils/pose_utils.py:664-676.
    """
    pose = np.asarray(pose, np.float64)
    new = np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float64,
    )
    return new


def check_rot(rot, eps=1e-5):
    """Orthonormal, right-handed rotation check (pose_utils.py:191-228)."""
    rot = np.asarray(rot)
    assert np.allclose(rot @ rot.T, np.eye(3), atol=eps), "not orthonormal"
    assert np.linalg.det(rot) > 0, "not right-handed"


def check_rot_batch(rots, eps=1e-4):
    rots = np.asarray(rots)
    rrt = rots @ np.transpose(rots, (0, 2, 1))
    assert np.allclose(rrt, np.eye(3)[None], atol=eps), "not orthonormal"
    assert (np.linalg.det(rots) > 0).all(), "not right-handed"


def get_hom_trafos(rots, trans):
    """[N, 3, 3] + [N, 3] -> [N, 4, 4] (pose_utils.py homogeneous builder)."""
    rots = np.asarray(rots)
    trans = np.asarray(trans)
    N = rots.shape[0]
    out = np.tile(np.eye(4), (N, 1, 1))
    out[:, :3, :3] = rots
    out[:, :3, 3] = trans
    return out

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
    ts_q: [N].  Returns [N, 3, 4]: slerp rotations + cubic Hermite
    (Catmull-Rom finite-difference tangents, non-uniform knots)
    translations — tracks the host Slerp+scipy-cubic precompute
    (reference provider.py:1204-1218) to spline-flavor differences.
    """
    K = len(key_ts)
    idx = jnp.clip(jnp.searchsorted(key_ts, ts_q, side="right") - 1, 0, K - 2)
    t0, t1 = key_ts[idx], key_ts[idx + 1]
    h = jnp.maximum(t1 - t0, 1e-12)
    u = jnp.clip((ts_q - t0) / h, 0.0, 1.0)
    q = slerp_device(key_quats[idx], key_quats[idx + 1], u)

    p0, p1 = key_trans[idx], key_trans[idx + 1]
    im = jnp.maximum(idx - 1, 0)
    ip = jnp.minimum(idx + 2, K - 1)
    # central-difference tangents scaled to the local interval
    m0 = (p1 - key_trans[im]) / jnp.maximum(t1 - key_ts[im], 1e-12)[:, None] * h[:, None]
    m1 = (key_trans[ip] - p0) / jnp.maximum(key_ts[ip] - t0, 1e-12)[:, None] * h[:, None]
    u2 = (u * u)[:, None]
    u3 = (u2 * u[:, None])
    uu = u[:, None]
    tr = ((2 * u3 - 3 * u2 + 1) * p0 + (u3 - 2 * u2 + uu) * m0
          + (-2 * u3 + 3 * u2) * p1 + (u3 - u2) * m1)
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


# ----------------------------------------------------------------------------
# pose-set preprocessing (reference pose_utils.py:372-470, provider.py:358-408)


def normalize(x):
    return x / np.linalg.norm(x)


def viewmatrix(z, up, pos):
    """[3, 4] camera matrix from forward z, up hint, and position."""
    vec2 = normalize(np.asarray(z, np.float64))
    vec0 = normalize(np.cross(np.asarray(up, np.float64), vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, np.asarray(pos, np.float64)], 1)


def poses_avg(poses):
    """Average c2w of a pose set [N, 3, 4] (pose_utils.py:395-445)."""
    poses = np.asarray(poses)
    center = poses[:, :3, 3].mean(0)
    vec2 = normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return viewmatrix(vec2, up, center)


def recenter_poses(poses):
    """Recenter a pose set around its average pose (pose_utils.py:456-490).

    poses: [N, 3, 4] -> [N, 3, 4], convention preserved.
    """
    poses = np.asarray(poses, np.float64)
    c2w = np.concatenate([poses_avg(poses), [[0, 0, 0, 1.0]]], 0)
    bottom = np.tile([[[0, 0, 0, 1.0]]], (poses.shape[0], 1, 1))
    hom = np.concatenate([poses[:, :3, :4], bottom], 1)
    out = np.linalg.inv(c2w) @ hom
    return out[:, :3, :4]


def rotmat_between(a, b):
    """Rotation taking direction a to b (pose_utils rotmat, provider.py:60)."""
    a, b = normalize(np.asarray(a, np.float64)), normalize(np.asarray(b, np.float64))
    v = np.cross(a, b)
    c = np.dot(a, b)
    s = np.linalg.norm(v)
    kmat = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + kmat + kmat @ kmat * ((1 - c) / (s ** 2 + 1e-10))


def closest_point_2_lines(oa, da, ob, db):
    """Point closest to both rays + parallelism weight (pose_utils.py:610-622)."""
    da, db = normalize(np.asarray(da)), normalize(np.asarray(db))
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = np.asarray(ob) - np.asarray(oa)
    ta = np.linalg.det([t, db, c]) / (denom + 1e-10)
    tb = np.linalg.det([t, da, c]) / (denom + 1e-10)
    ta, tb = min(ta, 0.0), min(tb, 0.0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def preprocess_pose_array_sphere(poses, n_subsample=100, seed=0):
    """Sphere preprocessing of a c2w pose set (provider.py:358-408):
    recenter, axis flips into rub, rotate average up to +z, shift to the
    center of attention (closest point of ray pairs), rescale radius to 1.

    poses: [N, 4, 4] -> [N, 4, 4]
    """
    poses = np.array(poses, np.float64, copy=True)
    N = len(poses)
    poses[:, :3, :] = recenter_poses(poses[:, :3, :])

    poses[:, 0:3, 1] *= -1
    poses[:, 0:3, 2] *= -1
    poses = poses[:, [1, 0, 2, 3], :]
    poses[:, 2, :] *= -1

    up = poses[:, 0:3, 1].sum(0)
    Rm = rotmat_between(up, [0, 0, 1])
    Rm = np.pad(Rm, [0, 1])
    Rm[-1, -1] = 1
    poses = Rm @ poses

    rng = np.random.default_rng(seed)
    idxs = rng.integers(0, N, size=min(n_subsample, N))
    sub = poses[idxs]
    totw, totp = 0.0, np.zeros(3)
    for i in range(len(sub)):
        mf = sub[i, :3, :]
        for j in range(len(sub)):
            mg = sub[j, :3, :]
            p, w = closest_point_2_lines(mf[:, 3], mf[:, 2], mg[:, 3], mg[:, 2])
            if w > 0.01:
                totp += p * w
                totw += w
    totp /= max(totw, 1e-10)
    poses[:, :3, 3] -= totp
    avglen = np.linalg.norm(poses[:, :3, 3], axis=-1).mean()
    poses[:, :3, 3] *= 1.0 / avglen
    return poses


def spiral_path(c2w_center, radii, focus_depth, n_poses=120, n_rots=2):
    """Spiral render path around a center pose (pose_utils.py:597-607 role)."""
    c2w = np.asarray(c2w_center, np.float64)
    out = []
    for t in np.linspace(0, 2 * np.pi * n_rots, n_poses, endpoint=False):
        center = c2w[:3, 3] + c2w[:3, :3] @ (
            np.asarray([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * np.asarray(radii)
        )
        z = normalize(c2w[:3, :3] @ np.asarray([0, 0, focus_depth]) + c2w[:3, 3] - center)
        pose = np.eye(4)
        pose[:3, :] = viewmatrix(z, c2w[:3, 1], center)
        out.append(pose)
    return np.stack(out)

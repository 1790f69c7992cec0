"""Diagnostic visualizations: event accumulation images, pose plots.

Parity: reference utils/plot_utils.py — render_ev_accumulation (:13),
pose visualizers / workspace diagnostic dumps (plotting_poses_bounds :652,
plotting_poses_hf :573, plotting_poses_evs :486).  Matplotlib renders to
files (headless), never to a display.
"""

import os

import numpy as np


def render_ev_accumulation(xs, ys, pols, H, W):
    """Accumulate events into a BGR visualization image.

    Positive events red, negative blue on white (the standard DVS
    rendering; reference plot_utils.py:13).
    Returns [H, W, 3] uint8.
    """
    img = np.full((H, W, 3), 255, np.uint8)
    xs = np.clip(np.asarray(xs).astype(np.int64), 0, W - 1)
    ys = np.clip(np.asarray(ys).astype(np.int64), 0, H - 1)
    pols = np.asarray(pols)
    pos = pols > 0
    img[ys[pos], xs[pos]] = (0, 0, 255)
    img[ys[~pos], xs[~pos]] = (255, 0, 0)
    return img


def event_histogram(xs, ys, pols, H, W):
    """Signed event-count histogram [H, W] (sum of polarities per pixel)."""
    flat = np.clip(ys.astype(np.int64), 0, H - 1) * W + np.clip(
        xs.astype(np.int64), 0, W - 1
    )
    return np.bincount(flat, weights=np.asarray(pols, np.float64),
                       minlength=H * W).reshape(H, W)


def plot_poses(path, poses, ts=None, title="poses", axis_len=0.1, stride=1):
    """3D pose (camera frustum axes) plot written to `path` (png)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = np.asarray(poses)[::stride]
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    for p in poses:
        o = p[:3, 3]
        for k, c in zip(range(3), "rgb"):
            d = p[:3, k] * axis_len
            ax.plot([o[0], o[0] + d[0]], [o[1], o[1] + d[1]], [o[2], o[2] + d[2]], c)
    ax.scatter(poses[:, 0, 3], poses[:, 1, 3], poses[:, 2, 3], s=2, c="k")
    ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def plot_trajectory_timeline(path, ts, poses, title="trajectory"):
    """Per-axis translation curves over time written to `path` (png).

    poses: [N, 3] translations or [N, 3/4, 4] pose matrices.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    poses = np.asarray(poses)
    trans = poses if poses.ndim == 2 else poses[:, :3, 3]
    fig, axes = plt.subplots(3, 1, figsize=(10, 6), sharex=True)
    for k, (axx, lbl) in enumerate(zip(axes, "xyz")):
        axx.plot(ts, trans[:, k])
        axx.set_ylabel(lbl)
    axes[0].set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def plot_rays_in_box(path, poses, intrinsics, H, W, bound=1.0, n_side=3,
                     length=3.0, title="rays vs scene box"):
    """Central pixel rays from each pose drawn into the scene AABB (role of
    the reference's commented pointcloud/ray visualizers, renderer.py:186,
    provider.py:583-587 — here wired for real)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fx, fy, cx, cy = intrinsics
    poses = np.asarray(poses)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    # AABB wireframe
    b = float(bound)
    for s in (-b, b):
        for t in (-b, b):
            ax.plot([-b, b], [s, s], [t, t], "k-", lw=0.4)
            ax.plot([s, s], [-b, b], [t, t], "k-", lw=0.4)
            ax.plot([s, s], [t, t], [-b, b], "k-", lw=0.4)
    us = np.linspace(0.15, 0.85, n_side)
    for p in poses:
        o = p[:3, 3]
        for u in us:
            for v in us:
                d = np.array([(u * W - cx) / fx, (v * H - cy) / fy, 1.0])
                d = p[:3, :3] @ (d / np.linalg.norm(d))
                e = o + d * length
                ax.plot([o[0], e[0]], [o[1], e[1]], [o[2], e[2]],
                        "b-", lw=0.3, alpha=0.5)
        ax.scatter(*o, s=4, c="r")
    ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def plot_event_rate(path, ts, bins=200, title="event rate"):
    """Events/s over the stream duration (dataset sanity, reference
    plot_h5.py role)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ts = np.asarray(ts, np.float64)
    if ts.size < 2:
        return None
    counts, edges = np.histogram(ts, bins=bins)
    widths = np.diff(edges)
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(edges[:-1], counts / np.maximum(widths, 1e-12), width=widths,
           align="edge")
    ax.set_xlabel("t [s]")
    ax.set_ylabel("events/s")
    ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def dump_run_diagnostics(workspace, provider):
    """Per-run dataset diagnostics into workspace/diagnostics (the role of
    the reference's automatic plot dumps: plotting_poses_bounds/hf/evs from
    provider.py:760, 1126 and the undistorted-event accumulation images
    from :1353-1359).  Best-effort: never fails a run.
    """
    import cv2

    ddir = os.path.join(workspace, "diagnostics")
    os.makedirs(ddir, exist_ok=True)
    written = []
    try:
        if hasattr(provider, "chains"):  # event provider
            ch = provider.chains
            img = render_ev_accumulation(
                np.asarray(ch.xs), np.asarray(ch.ys), np.asarray(ch.pols),
                provider.H, provider.W)
            p = os.path.join(ddir, "ev_accumulation.png")
            cv2.imwrite(p, img)
            written.append(p)
            hist = event_histogram(
                np.asarray(ch.xs), np.asarray(ch.ys), np.asarray(ch.pols),
                provider.H, provider.W)
            mx = max(np.abs(hist).max(), 1.0)
            p = os.path.join(ddir, "ev_histogram.png")
            cv2.imwrite(p, ((hist / mx + 1.0) * 127.5).astype(np.uint8))
            written.append(p)
            written.append(plot_trajectory_timeline(
                os.path.join(ddir, "hf_trajectory.png"),
                np.asarray(provider.key_ts), np.asarray(provider.key_trans),
                title="pose keyframes (hf)"))
            p = plot_event_rate(os.path.join(ddir, "ev_rate.png"),
                                np.asarray(ch.ts))
            if p:
                written.append(p)
            # negative-sampling coverage: which pixels ever enter a
            # no-event chunk (provider.py noev machinery)
            if getattr(provider, "noev_coords", None) is not None:
                cov = np.zeros((provider.H, provider.W), np.float32)
                cnts = np.asarray(provider.noev_count)
                valid = []
                for j, nc in enumerate(cnts):
                    valid.append(np.asarray(
                        provider.noev_coords[j][: int(nc)]))
                if valid:
                    v = np.concatenate(valid).astype(np.int64)
                    np.add.at(cov, (np.clip(v[:, 1], 0, provider.H - 1),
                                    np.clip(v[:, 0], 0, provider.W - 1)), 1)
                import cv2 as _cv2
                mx = max(cov.max(), 1.0)
                p = os.path.join(ddir, "noev_coverage.png")
                _cv2.imwrite(p, (cov / mx * 255).astype(np.uint8))
                written.append(p)
        if getattr(provider, "train_poses", None) is not None:
            written.append(plot_poses(
                os.path.join(ddir, "train_poses.png"),
                np.asarray(provider.train_poses), title="train poses"))
            if getattr(provider, "intrinsics", None) is not None:
                written.append(plot_rays_in_box(
                    os.path.join(ddir, "train_rays.png"),
                    np.asarray(provider.train_poses)[:8],
                    provider.intrinsics, provider.H, provider.W))
    except Exception as e:  # diagnostics must never kill training
        written.append(f"(skipped: {e})")
    return written

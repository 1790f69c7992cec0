"""Mesh extraction from the density field (marching tetrahedra) + export.

Parity: reference nerf/utils.py:219-249 (`extract_fields`/`extract_geometry`
via mcubes + trimesh) and Trainer.save_mesh (:712-732).

The image lacks mcubes/trimesh; this module implements marching tetrahedra
(topologically robust, no 256-case table) over the chunk-evaluated density
grid and writes .obj/.ply directly.
"""

import numpy as np

# 6-tetrahedra decomposition of a cube (indices into the 8 cube corners,
# corner i has offset bits (x=i&1, y=(i>>1)&1, z=(i>>2)&1))
_TETS = np.array(
    [
        [0, 5, 1, 3],
        [0, 5, 3, 7],
        [0, 5, 7, 4],
        [0, 7, 3, 2],
        [0, 7, 2, 6],
        [0, 7, 6, 4],
    ],
    np.int64,
)
_CORNER_OFFSETS = np.array(
    [[(i & 1), (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.int64
)


def extract_fields(bound_min, bound_max, resolution, query_fn, chunk=65536):
    """Evaluate query_fn([N, 3]) -> [N] density over a dense grid."""
    xs = np.linspace(bound_min[0], bound_max[0], resolution)
    ys = np.linspace(bound_min[1], bound_max[1], resolution)
    zs = np.linspace(bound_min[2], bound_max[2], resolution)
    u = np.zeros((resolution, resolution, resolution), np.float32)
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)
    for i in range(0, pts.shape[0], chunk):
        u.reshape(-1)[i : i + chunk] = np.asarray(
            query_fn(pts[i : i + chunk].astype(np.float32))
        ).reshape(-1)
    return u


def marching_tets(u, threshold):
    """Extract the threshold isosurface.  u: [R, R, R].  Returns (verts
    [V, 3] in grid coords, tris [T, 3] int)."""
    R = u.shape[0]
    g = np.arange(R - 1)
    cx, cy, cz = np.meshgrid(g, g, g, indexing="ij")
    cells = np.stack([cx, cy, cz], -1).reshape(-1, 3)  # [C, 3]

    corner_vals = np.stack(
        [u[cells[:, 0] + o[0], cells[:, 1] + o[1], cells[:, 2] + o[2]]
         for o in _CORNER_OFFSETS], -1,
    )  # [C, 8]
    # cells crossing the surface only
    crossing = (corner_vals.max(-1) > threshold) & (corner_vals.min(-1) < threshold)
    cells = cells[crossing]
    corner_vals = corner_vals[crossing]
    if cells.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    verts = []
    tris = []
    vert_cache = {}

    corner_pos = cells[:, None, :] + _CORNER_OFFSETS[None, :, :]  # [C, 8, 3]

    def edge_vertex(ci, a, b):
        pa = tuple(corner_pos[ci, a])
        pb = tuple(corner_pos[ci, b])
        key = (pa, pb) if pa <= pb else (pb, pa)
        if key in vert_cache:
            return vert_cache[key]
        va, vb = corner_vals[ci, a], corner_vals[ci, b]
        t = (threshold - va) / (vb - va)
        p = np.asarray(pa) + t * (np.asarray(pb) - np.asarray(pa))
        vert_cache[key] = len(verts)
        verts.append(p)
        return len(verts) - 1

    inside = corner_vals > threshold  # [C, 8]
    for ci in range(cells.shape[0]):
        for tet in _TETS:
            m = inside[ci, tet]
            n_in = int(m.sum())
            if n_in == 0 or n_in == 4:
                continue
            ins = tet[m]
            outs = tet[~m]
            if n_in == 1:
                a = ins[0]
                vs = [edge_vertex(ci, a, b) for b in outs]
                tris.append(vs)
            elif n_in == 3:
                a = outs[0]
                vs = [edge_vertex(ci, b, a) for b in ins]
                tris.append([vs[0], vs[2], vs[1]])
            else:  # 2 in, 2 out -> quad -> 2 triangles
                a, b = ins
                c, d = outs
                v_ac = edge_vertex(ci, a, c)
                v_ad = edge_vertex(ci, a, d)
                v_bc = edge_vertex(ci, b, c)
                v_bd = edge_vertex(ci, b, d)
                tris.append([v_ac, v_ad, v_bd])
                tris.append([v_ac, v_bd, v_bc])

    return np.asarray(verts, np.float32), np.asarray(tris, np.int64)


def extract_geometry(bound_min, bound_max, resolution, threshold, query_fn):
    """Reference utils.py:237-249 equivalent; verts in world coords."""
    u = extract_fields(bound_min, bound_max, resolution, query_fn)
    verts, tris = marching_tets(u, threshold)
    bmin = np.asarray(bound_min, np.float64)
    bmax = np.asarray(bound_max, np.float64)
    verts = verts / (resolution - 1.0) * (bmax - bmin)[None, :] + bmin[None, :]
    return verts.astype(np.float32), tris


def write_obj(path, verts, tris):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in tris:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def write_ply(path, verts, tris):
    with open(path, "wb") as f:
        head = (
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(tris)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(head.encode())
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n".encode())
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n".encode())

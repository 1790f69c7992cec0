"""ctypes bindings for the native event-preprocessing library.

Builds native/libevent_preproc.so on first use (g++ available in the image);
falls back to the pure-numpy implementations in data/events.py when the
toolchain or library is unavailable.  See native/event_preproc.cpp for the
role-parity notes.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libevent_preproc.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")

    lib.sort_events_by_pixel.restype = i64
    lib.sort_events_by_pixel.argtypes = [
        f32p, f32p, f64p, i32p, i64, ctypes.c_int32, ctypes.c_int32, i64p, i64p,
    ]
    lib.group_tables.restype = None
    lib.group_tables.argtypes = [i64p, i64, i64, i64p, i64p, i64p]
    lib.ms_to_idx.restype = i64
    lib.ms_to_idx.argtypes = [f64p, i64, ctypes.c_double, i64p, i64]
    lib.window_indices.restype = None
    lib.window_indices.argtypes = [
        f64p, i64, ctypes.c_double, ctypes.c_double, i64p, i64p,
    ]
    _lib = lib
    return lib


def available():
    return _load() is not None


def sort_events_by_pixel(xs, ys, ts, frame_ids, W, H):
    """Returns (order [n], group_id [n], n_groups) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(xs)
    order = np.empty(n, np.int64)
    group_id = np.empty(n, np.int64)
    n_groups = lib.sort_events_by_pixel(
        np.ascontiguousarray(xs, np.float32),
        np.ascontiguousarray(ys, np.float32),
        np.ascontiguousarray(ts, np.float64),
        np.ascontiguousarray(frame_ids, np.int32),
        n, int(W), int(H), order, group_id,
    )
    return order, group_id, int(n_groups)


def group_tables(group_id, n_groups):
    lib = _load()
    if lib is None:
        return None
    n = len(group_id)
    counts = np.empty(n_groups, np.int64)
    offsets = np.empty(n_groups, np.int64)
    num_succ = np.empty(n, np.int64)
    lib.group_tables(np.ascontiguousarray(group_id, np.int64), n, n_groups,
                     counts, offsets, num_succ)
    return counts, offsets, num_succ


def ms_to_idx(ts, tick):
    lib = _load()
    if lib is None:
        return None
    ts = np.ascontiguousarray(ts, np.float64)
    cap = int(ts[-1] / tick) + 2 if len(ts) else 1
    out = np.empty(cap, np.int64)
    m = lib.ms_to_idx(ts, len(ts), float(tick), out, cap)
    if m < 0:
        return None
    return out[:m]


def window_indices(ts, t_start, t_end):
    lib = _load()
    if lib is None:
        return None
    ts = np.ascontiguousarray(ts, np.float64)
    i0 = np.zeros(1, np.int64)
    i1 = np.zeros(1, np.int64)
    lib.window_indices(ts, len(ts), float(t_start), float(t_end), i0, i1)
    return int(i0[0]), int(i1[0])

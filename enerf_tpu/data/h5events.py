"""H5 event streams: EventSlicer + ms_to_idx (tumvie/eds formats).

Parity: reference utils/event_utils.py:223-386 (EventSlicer: conservative
millisecond window from the ms_to_idx table, then exact refinement;
t_offset handling for eds) and :389-407 (compute_ms_to_idx).

TPU design note: the reference refines windows with a numba-jitted linear
scan; here the refinement is a numpy searchsorted (events are time-sorted),
identical semantics: time_start_us <= t[idx_start:idx_end] < time_end_us.
The native C++ fast path for bulk preprocessing lives in native/ (see
enerf_tpu/data/native_events.py).
"""

import math

import h5py
import numpy as np


def compute_ms_to_idx(tss, ms_start=0, tick_ns=1_000_000):
    """Millisecond -> first-event-index table (event_utils.py:389-407).

    tss: sorted event timestamps; tick_ns: nanoseconds per table tick
    (1e6 for ns timestamps like esim, 1e3 for us timestamps like tumvie/eds).
    """
    tss = np.asarray(tss)
    ms_end = int(math.floor(tss.max() / tick_ns))
    assert ms_end >= ms_start
    ms_window = np.arange(ms_start, ms_end + 1, 1, dtype=np.uint64)
    return np.searchsorted(tss, ms_window * tick_ns, side="left").astype(np.int64)


class EventSlicer:
    """Window queries over an H5 event stream (x, y, t, p + ms_to_idx)."""

    def __init__(self, h5f):
        self.h5f = h5f
        self.events = {}
        prefix = "events/" if "events/x" in h5f else ""
        for k in ("p", "x", "y", "t"):
            self.events[k] = h5f[prefix + k]
        self.ms_to_idx = np.asarray(h5f["ms_to_idx"], dtype="int64")
        self.t_offset = int(h5f["t_offset"][()]) if "t_offset" in h5f.keys() else 0
        self.t_final = int(self.events["t"][-1]) + self.t_offset

    def get_start_time_us(self):
        return self.t_offset

    def get_final_time_us(self):
        return self.t_final

    @staticmethod
    def get_conservative_window_ms(ts_start_us, ts_end_us):
        assert ts_end_us > ts_start_us
        return math.floor(ts_start_us / 1000), math.ceil(ts_end_us / 1000)

    def ms2idx(self, time_ms):
        assert time_ms >= 0
        if time_ms >= self.ms_to_idx.size:
            return None
        return int(self.ms_to_idx[time_ms])

    def get_events(self, t_start_us, t_end_us):
        """Events with t_start_us <= t < t_end_us, or None if out of range."""
        assert t_start_us < t_end_us
        t_start_us -= self.t_offset
        t_end_us -= self.t_offset

        t_start_ms, t_end_ms = self.get_conservative_window_ms(t_start_us, t_end_us)
        t_start_ms = max(t_start_ms, 0)
        lo = self.ms2idx(t_start_ms)
        hi = self.ms2idx(t_end_ms)
        if hi is None and t_end_ms >= self.ms_to_idx.size:
            # conservative upper bound past the table: all remaining events
            # (robustness over the reference, which returns None here)
            hi = int(self.events["t"].shape[0])
        if lo is None or hi is None:
            return None

        t_cons = np.asarray(self.events["t"][lo:hi])
        if t_cons.size == 0:
            return {k: np.asarray([]) for k in ("p", "x", "y", "t")}
        i0 = int(np.searchsorted(t_cons, t_start_us, side="left"))
        i1 = int(np.searchsorted(t_cons, t_end_us, side="left"))
        out = {"t": t_cons[i0:i1] + self.t_offset}
        for k in ("p", "x", "y"):
            out[k] = np.asarray(self.events[k][lo + i0 : lo + i1])
            assert out[k].size == out["t"].size
        return out


def write_event_h5(path, x, y, t_us, p, t_offset=None, grouped=False):
    """Write an event stream in the tumvie/eds H5 layout (test fixture +
    scripts/numpys_to_h5 equivalent).  t_us must be sorted microseconds."""
    t_us = np.asarray(t_us)
    assert np.all(np.diff(t_us) >= 0)
    with h5py.File(path, "w") as f:
        g = f.create_group("events") if grouped else f
        g.create_dataset("x", data=np.asarray(x, np.uint16))
        g.create_dataset("y", data=np.asarray(y, np.uint16))
        g.create_dataset("t", data=t_us.astype(np.int64))
        g.create_dataset("p", data=np.asarray(p, np.int8))
        f.create_dataset("ms_to_idx", data=compute_ms_to_idx(t_us, tick_ns=1000))
        if t_offset is not None:
            f.create_dataset("t_offset", data=np.int64(t_offset))
    return path


def write_rectify_map(path, map_xy):
    """Rectify (undistortion) map H5: [H, W, 2] float32 target coords."""
    with h5py.File(path, "w") as f:
        f.create_dataset("rectify_map", data=np.asarray(map_xy, np.float32))
    return path


def load_rectify_map(path):
    with h5py.File(path, "r") as f:
        return np.asarray(f["rectify_map"])

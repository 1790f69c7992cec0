"""Native C++ event-preprocessing library vs numpy reference."""

import numpy as np
import pytest

from enerf_tpu.data import native_events
from enerf_tpu.data.h5events import compute_ms_to_idx


@pytest.fixture(scope="module")
def lib_ok():
    if not native_events.available():
        pytest.skip("native library not built (no g++?)")
    return True


def _random_events(n=5000, W=64, H=48, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, W, n).astype(np.float32)
    ys = rng.integers(0, H, n).astype(np.float32)
    ts = np.sort(rng.uniform(0, 1e6, n))
    fids = (ts > 5e5).astype(np.int32)
    return xs, ys, ts, fids, W, H


def test_sort_matches_lexsort(lib_ok):
    xs, ys, ts, fids, W, H = _random_events()
    order, gid, n_groups = native_events.sort_events_by_pixel(xs, ys, ts, fids, W, H)
    # numpy reference
    pix = ys.astype(np.int64) * W + xs.astype(np.int64)
    key = fids.astype(np.int64) * W * H + pix
    ref_order = np.lexsort((ts, key))
    # same grouping + time order (permutation may differ within exact ties)
    np.testing.assert_array_equal(key[order], key[ref_order])
    np.testing.assert_array_equal(ts[order], ts[ref_order])
    # group ids increase by 1 at key changes
    k = key[order]
    expect_gid = np.cumsum(np.concatenate([[1], (k[1:] != k[:-1]).astype(np.int64)])) - 1
    np.testing.assert_array_equal(gid, expect_gid)
    assert n_groups == expect_gid[-1] + 1


def test_group_tables(lib_ok):
    xs, ys, ts, fids, W, H = _random_events(n=2000)
    order, gid, n_groups = native_events.sort_events_by_pixel(xs, ys, ts, fids, W, H)
    counts, offsets, num_succ = native_events.group_tables(gid, n_groups)
    assert counts.sum() == len(xs)
    np.testing.assert_array_equal(np.cumsum(counts)[:-1], offsets[1:])
    # successor count: last event of each group has 0
    for g in [0, n_groups // 2, n_groups - 1]:
        end = offsets[g] + counts[g] - 1
        assert num_succ[end] == 0
        assert num_succ[offsets[g]] == counts[g] - 1


def test_ms_to_idx_matches_numpy(lib_ok):
    rng = np.random.default_rng(1)
    ts = np.sort(rng.uniform(0, 50_000, 3000))  # us
    native = native_events.ms_to_idx(ts, tick=1000.0)
    ref = compute_ms_to_idx(ts, tick_ns=1000)
    np.testing.assert_array_equal(native, ref)


def test_window_indices(lib_ok):
    ts = np.asarray([0.0, 500.0, 2100.0, 5000.0, 5000.0, 7100.0])
    i0, i1 = native_events.window_indices(ts, 500.0, 5000.0)
    assert (i0, i1) == (1, 3)
    i0, i1 = native_events.window_indices(ts, 4999.0, 5001.0)
    assert (i0, i1) == (3, 5)

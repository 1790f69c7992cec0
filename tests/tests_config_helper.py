"""Shared tiny-config factory for orchestration tests (keeps shapes
identical across tests so jit caches are reused)."""

from enerf_tpu.config import Config


def tiny_cfg(tmp_path, **kw):
    kw.setdefault("mode", "synthetic")
    kw.setdefault("outdir", str(tmp_path))
    kw.setdefault("H", 24)
    kw.setdefault("W", 24)
    kw.setdefault("num_rays", 128)
    kw.setdefault("batch_size_evs", 128)
    kw.setdefault("num_steps", 24)
    kw.setdefault("iters", 2000)
    kw.setdefault("lr", 1e-2)
    kw.setdefault("eval_interval", 1)
    kw.setdefault("log_every", 10)
    kw.setdefault("out_dim_color", 3)
    kw.setdefault("use_luma", 1)
    return Config(**kw).validate()

"""Config parsing compat with the reference's configargparse txt format."""

import os
import pytest

from enerf_tpu.config import Config, load_config_file, build_config

REF_CFG = "/root/reference/configs/spiral1/spiral1_enerf.txt"


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference not mounted")
def test_load_reference_config():
    kw = load_config_file(REF_CFG)
    cfg = Config(**kw).validate()
    assert cfg.mode == "esim"
    assert cfg.lr == 0.005
    assert cfg.bound == 3.0
    assert cfg.scale == 0.3
    assert cfg.events == 1 and cfg.event_only == 1
    assert cfg.C_thres == 0.2
    assert cfg.out_dim_color == 1 and cfg.use_luma == 0
    assert cfg.num_rays == 30096 and cfg.batch_size_evs == 30096
    assert cfg.num_steps == 512
    assert cfg.fp16 is True and cfg.cuda_ray is False
    assert cfg.train_idxs[:3] == [0, 2, 4]
    assert len(cfg.val_idxs) == 32


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference not mounted")
def test_cli_overrides_config():
    cfg = build_config(["--config", REF_CFG, "--lr", "0.01", "--iters", "500"])
    assert cfg.lr == 0.01
    assert cfg.iters == 500
    assert cfg.bound == 3.0  # from file


def test_o_macro_flag():
    cfg = build_config(["-O", "--out_dim_color", "3"])
    assert cfg.fp16 and cfg.cuda_ray and cfg.preload


def test_validation_rejects_bad():
    import dataclasses
    with pytest.raises(AssertionError):
        Config(event_only=1, events=0).validate()
    with pytest.raises(AssertionError):
        Config(out_dim_color=2).validate()
    # grayscale + use_luma is coerced (use_luma -> 0), not rejected: the
    # reference hard-asserts here on its own DEFAULTS (main_nerf.py:91-92
    # vs :117/:126) — a foot-gun this framework fixes
    cfg = Config(out_dim_color=1, use_luma=1).validate()
    assert cfg.use_luma == 0

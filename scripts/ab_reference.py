"""Run the ACTUAL reference (main_nerf.py) on CPU for the quality A/B.

This executes /root/reference/main_nerf.py as __main__ via runpy with the
functional CPU stubs from ref_stubs installed first, so EVERYTHING on the
training path is the reference's own code: its configargparse CLI, its
get_model() (NeRFNetwork with the hashgrid backbone — served by our
exact-semantics pure-torch GridEncoder stub), its EventNeRFDataset event
sampling (provider.py:1107-1405), its Trainer.train_step_events
(utils.py:482-573), its pytorch run() renderer (renderer.py:150-278,
cuda_ray=False — the path every enerf config uses), its Adam + LambdaLR
schedule and EMA eval (main_nerf.py:211-214).

Usage:
  python scripts/ab_reference.py -- --config <cfg.txt> --datadir <dir> ...
Everything after `--` is passed verbatim to the reference CLI.
"""

import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ref_stubs import install_stubs  # noqa: E402

REF_MAIN = "/root/reference/main_nerf.py"


def main():
    argv = sys.argv[1:]
    if argv and argv[0] == "--":
        argv = argv[1:]
    import torch
    torch.set_num_threads(
        int(os.environ.get("AB_TORCH_THREADS", os.cpu_count())))
    install_stubs()
    sys.argv = [REF_MAIN] + argv
    runpy.run_path(REF_MAIN, run_name="__main__")


if __name__ == "__main__":
    main()

"""Export calibrated LPIPS weights for enerf_tpu's JAX LPIPS.

Run this OFFLINE on any machine where the `lpips` torch package (and its
pretrained AlexNet/VGG16 weights) is installed — this image has zero
egress, so the weights must be produced elsewhere and copied in:

    python scripts/export_lpips_weights.py --out lpips_weights.npz
    # copy lpips_weights.npz to the training host, then:
    export ENERF_LPIPS_WEIGHTS=/path/to/lpips_weights.npz

With the file in place, enerf_tpu/train/lpips_jax.py uses the trained
convolutional features + the LPIPS linear calibration heads instead of its
seeded random features, and eval metric labels drop the `_rand` suffix
(train/metrics.py lpips_label).  Schema consumed by lpips_jax._load_external:

    {net}_conv{i}_w : [k, k, cin, cout] f32   (HWIO; torch OIHW transposed)
    {net}_conv{i}_b : [cout] f32
    {net}_lin{j}    : [C_j] f32               (LPIPS 1x1 lin head, squeezed)

for net in {alex, vgg}; i over conv layers (alex: 5, vgg16: 13), j over
the 5 feature taps.  Note lpips_jax evaluates convs with SAME padding;
torch AlexNet uses explicit pads (2,2,1,1,1) which differ from SAME only
at the border pixels of the k=11/s=4 stem — identical for VGG16 (k3 pad1).
"""

import argparse

import numpy as np


def export(out_path):
    import lpips  # torch package, available offline only
    import torch

    out = {}
    for net_name in ("alex", "vgg"):
        model = lpips.LPIPS(net=net_name)
        # conv stack: model.net.slice1..sliceN hold torchvision features
        convs = [m for m in model.net.modules()
                 if isinstance(m, torch.nn.Conv2d)]
        for i, conv in enumerate(convs):
            w = conv.weight.detach().numpy()          # [cout, cin, k, k]
            out[f"{net_name}_conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))
            b = (conv.bias.detach().numpy() if conv.bias is not None
                 else np.zeros(w.shape[0], np.float32))
            out[f"{net_name}_conv{i}_b"] = b
        for j, lin in enumerate(model.lins):
            w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
            out[f"{net_name}_lin{j}"] = w.reshape(-1).astype(np.float32)
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_weights.npz")
    export(ap.parse_args().out)

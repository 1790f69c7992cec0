"""Optional CLIP-guidance loss for random-pose training.

Parity: reference nerf/clip_utils.py (CLIPLoss: normalized text/image
embedding similarity, unused by the enerf configs).  The `clip` package and
its pretrained weights are not in this image; `clip_available()` gates the
feature and the trainer skips it when absent (documented divergence, same
as LPIPS).
"""

import numpy as np


def clip_available():
    try:
        import clip  # noqa: F401
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


class CLIPLoss:
    """Text-image similarity loss on rendered views (clip_utils.py role)."""

    def __init__(self, text, device="cpu"):
        if not clip_available():
            raise ImportError(
                "CLIP guidance needs the `clip` package + weights; not "
                "available in this image"
            )
        import clip
        import torch

        self.device = device
        self.model, _ = clip.load("ViT-B/32", device=device)
        self.text_feat = self.model.encode_text(
            clip.tokenize([text]).to(device)
        ).detach()
        self.text_feat = self.text_feat / self.text_feat.norm(dim=-1, keepdim=True)

    def __call__(self, image_hwc):
        """image_hwc: [H, W, 3] float in [0,1] (numpy).  Returns scalar loss."""
        import torch
        import torch.nn.functional as F

        x = torch.from_numpy(np.asarray(image_hwc, np.float32))
        x = x.permute(2, 0, 1)[None]
        x = F.interpolate(x, size=(224, 224), mode="bilinear", align_corners=False)
        mean = torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1)
        std = torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)
        x = (x - mean) / std
        with torch.no_grad():
            feat = self.model.encode_image(x.to(self.device))
        feat = feat / feat.norm(dim=-1, keepdim=True)
        return float(1.0 - (feat @ self.text_feat.T).squeeze())

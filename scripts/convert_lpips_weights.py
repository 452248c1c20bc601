"""One-time converter: official LPIPS(AlexNet) weights -> vendored npz.

Run this on any machine WITH network access (it downloads the torchvision
AlexNet backbone and the LPIPS linear-calibration weights), then commit
the produced `remixfusion_tpu/assets/lpips_alex.npz` (~9 MB). After that,
`rendering_eval.py` and `utils/metrics.py:perceptual_distance` emit a true
LPIPS column with zero network access (utils/lpips_jax.py).

Sources accepted, in order of preference:
  1. the `lpips` pip package (pip install lpips) — canonical weights;
  2. torchmetrics' LPIPS (pip install torchmetrics[image]);
both resolve to the same AlexNet features + 'lin' layers.

Usage: python scripts/convert_lpips_weights.py [out.npz]
"""

import os
import sys

import numpy as np


def _from_module(net):
    """Extract conv + lin weights from an lpips.LPIPS-like module."""
    out = {}
    convs = [m for m in net.net.modules()
             if m.__class__.__name__ == "Conv2d"]
    assert len(convs) == 5, f"expected 5 convs, got {len(convs)}"
    for i, c in enumerate(convs):
        out[f"conv{i}_w"] = c.weight.detach().cpu().numpy()
        out[f"conv{i}_b"] = c.bias.detach().cpu().numpy()
    lins = [net.lin0, net.lin1, net.lin2, net.lin3, net.lin4]
    for i, lin in enumerate(lins):
        w = [m for m in lin.modules()
             if m.__class__.__name__ == "Conv2d"][0]
        out[f"lin{i}_w"] = w.weight.detach().cpu().numpy().reshape(-1)
    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "remixfusion_tpu", "assets", "lpips_alex.npz")
    try:
        import lpips
        net = lpips.LPIPS(net="alex")
    except ImportError:
        from torchmetrics.image.lpip import (
            LearnedPerceptualImagePatchSimilarity)
        net = LearnedPerceptualImagePatchSimilarity(net_type="alex").net
    params = _from_module(net)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **params)
    size = os.path.getsize(out_path) / 1e6
    print(f"wrote {out_path} ({size:.1f} MB): "
          f"{sorted(params)}")


if __name__ == "__main__":
    main()

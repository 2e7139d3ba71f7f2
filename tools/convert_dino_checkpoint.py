#!/usr/bin/env python
"""Convert a DINOv2 torch checkpoint to a .npz our loader reads natively.

Use on a machine with network access (this framework's runtime does not
require torch when given the npz):

    # official weights
    python -c "import torch; m = torch.hub.load('facebookresearch/dinov2', 'dinov2_vitb14'); \
               torch.save(m.state_dict(), 'dinov2_vitb14.pth')"
    python tools/convert_dino_checkpoint.py dinov2_vitb14.pth dinov2_vitb14.npz

Then set ``system.dino.checkpoint: dinov2_vitb14.npz`` in the run config.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="torch .pth state_dict (official or HF naming)")
    parser.add_argument("dst", help="output .npz")
    args = parser.parse_args()

    import torch

    sd = torch.load(args.src, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    flat = {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}
    np.savez(args.dst, **flat)
    print(f"wrote {len(flat)} tensors -> {args.dst}")

    # Round-trip sanity: our converter must accept it.
    from dynhor_tpu.models import dino as D

    params, cfg = D.convert_torch_state_dict(dict(np.load(args.dst)))
    n = sum(np.prod(x.shape) for x in __import__("jax").tree.leaves(params))
    print(f"converted OK: {n / 1e6:.1f}M params, pos grid {cfg.pos_grid}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the ViT attention implementations at the fine-loss production shape.

Times DINO ViT-B/14 forward+backward (grad w.r.t. the INPUT IMAGE, weights
frozen — the fine sem-loss pattern, refine.py) at 8 x 518^2 bf16 under
remat="frozen", for:

  * attn_impl="xla"   (einsum + hand-written bf16 softmax, fused by XLA —
    the round-2 winner and still the default after round 4)
  * attn_impl="flash" at Pallas tile sizes 128/256/704 (round 2 rejected
    the default-512 padding config; round 3 retested with segment-id
    padding 1370 -> 1408)
  * attn_impl="splash" at block sizes 128/256/512/768, each also with
    splash_fused_bwd=True at 512/768 (the fused dq+dkv backward kernel) —
    round-4 additions; blk=768 fused-bwd is splash's best and only TIES
    the xla path (BASELINE.md round-4 table)

Also prints the max |Δ| of the loss gradient vs the xla path (bf16 noise
expected, structural mismatch would be >> 1e-2).

    python tools/probe_vit_attention.py [--frames 8] [--edge 518]

Env: DYNHOR_PROBE_ONLY="name1;name2" runs only the named variants
(exact-match against the labels above); 'xla' is always kept as the
gradient baseline.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from dynhor_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--edge", type=int, default=518)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dynhor_tpu.models import dino as D

    params, cfg0 = D.load_params(
        None, D.DinoConfig(smaller_edge_size=args.edge)
    )
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(
        jax.random.PRNGKey(0), (args.frames, 3, args.edge, args.edge), jnp.bfloat16
    )
    gt = jax.random.normal(
        jax.random.PRNGKey(1),
        (args.frames, (args.edge // 14) ** 2, cfg0.embed_dim),
        jnp.float32,
    )

    def run(cfg):
        def loss_fn(img):
            feats = D.forward_tokens(params, img, cfg, remat="frozen")
            feats = feats.astype(jnp.float32)
            cos = (gt * feats).sum(-1) / (
                jnp.linalg.norm(gt, axis=-1) * jnp.linalg.norm(feats, axis=-1) + 1e-6
            )
            return (1.0 - cos).mean()

        g = jax.jit(jax.grad(loss_fn))
        t0 = time.time()
        out = jax.block_until_ready(g(x))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            out = g(x)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters
        return out, dt, compile_s

    variants = [
        ("xla", cfg0),
        ("flash blk=128", dataclasses.replace(cfg0, attn_impl="flash", flash_block=128)),
        ("flash blk=256", dataclasses.replace(cfg0, attn_impl="flash", flash_block=256)),
        ("flash blk=704", dataclasses.replace(cfg0, attn_impl="flash", flash_block=704)),
        ("splash blk=128", dataclasses.replace(cfg0, attn_impl="splash", splash_block=128)),
        ("splash blk=256", dataclasses.replace(cfg0, attn_impl="splash", splash_block=256)),
        ("splash blk=512", dataclasses.replace(cfg0, attn_impl="splash", splash_block=512)),
        ("splash blk=768", dataclasses.replace(cfg0, attn_impl="splash", splash_block=768)),
        ("splash blk=512 fused-bwd", dataclasses.replace(
            cfg0, attn_impl="splash", splash_block=512, splash_fused_bwd=True)),
        ("splash blk=768 fused-bwd", dataclasses.replace(
            cfg0, attn_impl="splash", splash_block=768, splash_fused_bwd=True)),
    ]
    if os.environ.get("DYNHOR_PROBE_ONLY"):
        keep = os.environ["DYNHOR_PROBE_ONLY"].split(";")
        variants = [v for v in variants if v[0] == "xla" or v[0] in keep]
    g_ref = None
    for name, cfg in variants:
        try:
            g, dt, cs = run(cfg)
        except Exception as e:  # noqa: BLE001 — probe tool: report and move on
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}")
            continue
        # The grad-diff baseline is the 'xla' variant SPECIFICALLY — if it
        # failed, report the others without a (mislabeled) comparison.
        if name == "xla":
            g_ref = g
        diff = (
            float(jnp.max(jnp.abs(g.astype(jnp.float32) - g_ref.astype(jnp.float32))))
            if g_ref is not None
            else float("nan")
        )
        print(
            f"{name:16s} f+b {dt * 1e3:7.1f} ms  (compile {cs:5.1f} s, "
            f"max|grad Δ| vs xla {diff:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()

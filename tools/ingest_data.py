#!/usr/bin/env python
"""Validate a custom sequence directory against the data convention.

The reference's README (README.md:27-44) documents the inputs produced by
external preprocessing models (SAM-v2 masks, StableNormal normals, DKM
correspondences) but ships no validation — a miswired export silently
mis-tracks.  This CLI checks channel semantics, dtype/range, sizes, and
frame-id alignment across rgb/ sam_seg/ monocular_normal/
correspondence_infos/ and exits non-zero on errors.

Usage:
  python tools/ingest_data.py <dataroot> [--max-frames N]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynhor_tpu.io.ingest import validate_dataroot  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataroot", help="sequence directory (contains rgb/ ...)")
    ap.add_argument(
        "--max-frames", type=int, default=None,
        help="only decode the first N frames (default: all)",
    )
    args = ap.parse_args()
    findings = validate_dataroot(args.dataroot, max_frames=args.max_frames)
    n_err = sum(1 for f in findings if f.level == "error")
    n_warn = sum(1 for f in findings if f.level == "warning")
    for f in findings:
        print(str(f))
    print(
        f"{args.dataroot}: {n_err} error(s), {n_warn} warning(s)"
        + ("" if n_err else " — OK to ingest")
    )
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())

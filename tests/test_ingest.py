"""Ingest validation: a deliberately-miswired sequence must fail loudly.

VERDICT r3 next #6: the first real sequence (SAM-v2 / StableNormal / DKM
exports per reference README.md:27-44) must hit actionable errors, not
silent mis-tracking.
"""
import numpy as np
import pytest
from PIL import Image

from dynhor_tpu.io.ingest import IngestError, validate_dataroot, validate_or_raise


def _write_seq(
    root,
    n=3,
    size=(32, 40),
    obj_channel=1,
    soft_mask=False,
    seg_size=None,
    normals=True,
    normal_encoding="stablenormal",
    corr="good",
    skip_seg_for=(),
):
    """Synthesize a sequence directory; knobs introduce specific defects."""
    h, w = size
    (root / "rgb").mkdir(parents=True)
    (root / "sam_seg").mkdir()
    if normals:
        (root / "monocular_normal").mkdir()
    for i in range(n):
        fid = f"{i:04d}"
        rng = np.random.default_rng(i)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "rgb" / f"{fid}.png")
        if fid in skip_seg_for:
            continue
        sh, sw = seg_size or (h, w)
        seg = np.zeros((sh, sw, 3), np.uint8)
        val = 180 if soft_mask else 255
        seg[sh // 4 : sh // 2, sw // 4 : sw // 2, obj_channel] = val
        seg[sh // 2 :, :, 2] = 255  # hand in B
        Image.fromarray(seg).save(root / "sam_seg" / f"{fid}.png")
        if normals:
            nrm = np.zeros((h, w, 3), np.float32)
            nrm[..., 2] = 1.0  # unit +z normals
            if normal_encoding == "stablenormal":
                enc = ((nrm + 1.0) / 2.0 * 255).astype(np.uint8)
            else:  # wrong: raw [0,1] encoding, decodes to |n| far from 1
                enc = (np.abs(nrm) * 127).astype(np.uint8)
            Image.fromarray(enc).save(root / "monocular_normal" / f"{fid}.png")
    if corr is not None:
        (root / "correspondence_infos").mkdir()
        m = 17
        if corr == "good":
            np.savez(
                root / "correspondence_infos" / "pairs_0000_0001.npz",
                frame_i="0000", frame_j="0001",
                xy_i=np.random.rand(m, 2).astype(np.float32) * [w - 1, h - 1],
                xy_j=np.random.rand(m, 2).astype(np.float32) * [w - 1, h - 1],
            )
        elif corr == "normalized":
            np.savez(
                root / "correspondence_infos" / "pairs_0000_0001.npz",
                frame_i="0000", frame_j="0001",
                xy_i=np.random.rand(m, 2).astype(np.float32),
                xy_j=np.random.rand(m, 2).astype(np.float32),
            )
        elif corr == "badkeys":
            np.savez(
                root / "correspondence_infos" / "pairs_0000_0001.npz",
                src="0000", dst="0001", pts=np.zeros((m, 4), np.float32),
            )


def _levels(findings):
    return {f.level for f in findings}


def test_clean_sequence_validates(tmp_path):
    _write_seq(tmp_path / "seq")
    findings = validate_dataroot(str(tmp_path / "seq"))
    assert "error" not in _levels(findings), [str(f) for f in findings]
    validate_or_raise(str(tmp_path / "seq"))  # should not raise


def test_miswired_object_channel_is_an_error(tmp_path):
    # Object mask exported in R instead of G (run.py:84-85 channel law).
    _write_seq(tmp_path / "seq", obj_channel=0)
    findings = validate_dataroot(str(tmp_path / "seq"))
    msgs = [f.message for f in findings if f.level == "error"]
    assert any("EMPTY object mask" in m for m in msgs)
    assert any("miswired" in m for m in msgs)
    with pytest.raises(IngestError):
        validate_or_raise(str(tmp_path / "seq"))


def test_soft_masks_warn(tmp_path):
    _write_seq(tmp_path / "seq", soft_mask=True)
    findings = validate_dataroot(str(tmp_path / "seq"))
    assert any(
        "anti-aliased" in f.message for f in findings if f.level == "warning"
    )


def test_seg_size_mismatch_is_an_error(tmp_path):
    _write_seq(tmp_path / "seq", seg_size=(16, 20))
    findings = validate_dataroot(str(tmp_path / "seq"))
    assert any(
        "mask size" in f.message for f in findings if f.level == "error"
    )


def test_missing_seg_frame_is_an_error(tmp_path):
    _write_seq(tmp_path / "seq", skip_seg_for=("0001",))
    findings = validate_dataroot(str(tmp_path / "seq"))
    assert any(
        "no segmentation" in f.message for f in findings if f.level == "error"
    )


def test_wrong_normal_encoding_warns(tmp_path):
    _write_seq(tmp_path / "seq", normal_encoding="raw01")
    findings = validate_dataroot(str(tmp_path / "seq"))
    assert any(
        "(n+1)/2" in f.message for f in findings if f.level == "warning"
    )


def test_normalized_correspondences_warn(tmp_path):
    _write_seq(tmp_path / "seq", corr="normalized")
    findings = validate_dataroot(str(tmp_path / "seq"))
    assert any(
        "NORMALIZED" in f.message for f in findings if f.level == "warning"
    )


def test_bad_correspondence_keys_error(tmp_path):
    _write_seq(tmp_path / "seq", corr="badkeys")
    findings = validate_dataroot(str(tmp_path / "seq"))
    assert any(
        "missing keys" in f.message for f in findings if f.level == "error"
    )


def test_missing_rgb_dir(tmp_path):
    (tmp_path / "seq").mkdir()
    findings = validate_dataroot(str(tmp_path / "seq"))
    assert any(f.level == "error" for f in findings)


def test_demo_data_validates():
    """The synthetic generator's output must pass its own validator."""
    import os

    root = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "data", "custom_shoes"
    )
    if not os.path.isdir(os.path.join(root, "rgb")):
        pytest.skip("demo data not generated")
    findings = validate_dataroot(root, max_frames=2)
    assert not [str(f) for f in findings if f.level == "error"]

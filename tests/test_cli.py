"""End-to-end CLI tests (the reference's test_me.sh smoke tier, on synthetic
volumes instead of downloads)."""

import numpy as np
import pytest

from conftest import make_blob_volume
from flowdenoising_tpu.cli import main, build_parser
from flowdenoising_tpu.io.mrc import read_mrc, write_mrc
from flowdenoising_tpu.io.tiff import write_tiff, read_tiff


def test_parser_reference_flags():
    p = build_parser()
    args = p.parse_args(["-i", "a.mrc", "-o", "b.mrc", "-s", "2.0", "1.0", "3.0",
                         "-l", "2", "-w", "9", "-v", "1", "-n", "-m",
                         "-p", "8", "--recompute_flow"])
    assert args.input == "a.mrc"
    assert [float(s) for s in args.sigma] == [2.0, 1.0, 3.0]
    assert args.levels == 2 and args.winsize == 9
    assert args.no_OF and args.memory_map and args.recompute_flow


def test_parser_gpu_variant_flags(tmp_path):
    # The GPU variant's extra flags (flowdenoising_GPU.py:597-598) are
    # accepted (and ignored: everything runs on-device) so its invocations
    # work unchanged.
    p = build_parser()
    args = p.parse_args(["--use_GPU", "--use_threads", "-p", "4"])
    assert args.use_GPU and args.use_threads
    vol = make_blob_volume(4, 16, 16, seed=14)
    src, dst = tmp_path / "in.mrc", tmp_path / "out.mrc"
    write_mrc(src, vol)
    rc = main(["-i", str(src), "-o", str(dst), "-n", "-s", "0.5",
               "--use_GPU", "--use_threads", "-p", "4"])
    assert rc == 0
    out, _ = read_mrc(dst)
    assert out.shape == vol.shape


def test_cli_no_of_mrc_roundtrip(tmp_path):
    vol = make_blob_volume(8, 16, 16, seed=11)
    src = tmp_path / "in.mrc"
    dst = tmp_path / "out.mrc"
    write_mrc(src, vol)
    rc = main(["-i", str(src), "-o", str(dst), "-n", "-s", "1.0"])
    assert rc == 0
    out, hdr = read_mrc(dst)
    assert hdr.mode == 2
    assert out.shape == vol.shape
    # smoothing shrinks variance but keeps the mean (wrap boundary)
    assert abs(out.mean() - vol.mean()) < 0.3
    assert out.std() < vol.std()


@pytest.mark.slow
def test_cli_of_tiff(tmp_path):
    vol = make_blob_volume(6, 32, 32, seed=12)
    src = tmp_path / "in.tif"
    dst = tmp_path / "out.tif"
    write_tiff(src, vol.astype(np.float32))
    rc = main(["-i", str(src), "-o", str(dst), "-s", "0.5", "-l", "0", "-w", "5"])
    assert rc == 0
    out = read_tiff(dst)
    assert out.shape == vol.shape
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_cli_fast_modes(tmp_path):
    vol = make_blob_volume(6, 32, 32, seed=13)
    src = tmp_path / "in.tif"
    dst = tmp_path / "out.tif"
    write_tiff(src, vol.astype(np.float32))
    rc = main(["-i", str(src), "-o", str(dst), "-s", "0.5", "-l", "0",
               "--tap_flow", "compose", "--symmetric_adjacent",
               "--precision", "bfloat16"])
    assert rc == 0
    out = read_tiff(dst)
    assert out.shape == vol.shape
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_cli_max_displacement(tmp_path):
    # --max_displacement reaches FlowConfig; 0 selects the unbounded
    # exact-gather sampling path (max_displacement=None).  The CLI default
    # is the auto probe (None sentinel resolved in main; QUALITY.md default
    # decision), except for -n / --coordinator runs.
    p = build_parser()
    assert p.parse_args([]).max_displacement is None
    vol = make_blob_volume(6, 32, 32, seed=15)
    src, dst0, dst1 = (tmp_path / n for n in ("in.tif", "o0.tif", "o1.tif"))
    write_tiff(src, vol.astype(np.float32))
    for dst, d in ((dst0, "12"), (dst1, "0")):
        rc = main(["-i", str(src), "-o", str(dst), "-s", "0.5", "-l", "0",
                   "--max_displacement", d])
        assert rc == 0
        out = read_tiff(dst)
        assert out.shape == vol.shape and np.isfinite(out).all()
    # both bounds cover this volume's sub-pixel drift: same output
    np.testing.assert_allclose(read_tiff(dst0), read_tiff(dst1),
                               rtol=0, atol=2e-2)


def test_cli_fingerprint(capsys, tmp_path):
    vol = make_blob_volume(4, 16, 16, seed=13)
    src = tmp_path / "in.mrc"
    dst = tmp_path / "out.mrc"
    write_mrc(src, vol)
    main(["-i", str(src), "-o", str(dst), "-n", "-s", "0.5", "--show_fingerprint"])
    captured = capsys.readouterr()
    assert "fingerprint =" in captured.out


def test_cli_preserves_voxel_size(tmp_path):
    """Input MRC pixel calibration (CELLA) survives into the output header
    (the reference drops it -- mrcfile.new leaves cell 0)."""
    from flowdenoising_tpu.io.mrc import (_HEADER_BYTES, _parse_header,
                                          write_mrc)
    vol = make_blob_volume(6, 16, 16, seed=19)
    src, dst = tmp_path / "in.mrc", tmp_path / "out.mrc"
    write_mrc(src, vol, voxel_size=(7.5, 7.5, 12.0))
    rc = main(["-i", str(src), "-o", str(dst), "-n", "-s", "0.5"])
    assert rc == 0
    with open(dst, "rb") as f:
        hdr = _parse_header(f.read(_HEADER_BYTES))
    assert hdr.voxel_size is not None
    np.testing.assert_allclose(hdr.voxel_size, (7.5, 7.5, 12.0), rtol=1e-5)


def test_cli_missing_input_friendly_error(tmp_path):
    import pytest
    with pytest.raises(SystemExit, match="not found"):
        main(["-i", str(tmp_path / "nope.mrc"), "-o", str(tmp_path / "o.mrc"),
              "-n"])
    with pytest.raises(SystemExit, match="output directory"):
        vol = make_blob_volume(4, 16, 16, seed=20)
        src = tmp_path / "in.mrc"
        write_mrc(src, vol)
        main(["-i", str(src), "-o", str(tmp_path / "no_dir" / "o.mrc"), "-n"])

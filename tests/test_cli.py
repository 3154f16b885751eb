"""CLI end-to-end: PNG in → upscaled PNG out + oracle comparison print."""

import numpy as np

from lanczos_tpu.cli import main
from lanczos_tpu.io import read_png, write_png


def test_cli_end_to_end(tmp_path, rng, capsys):
    img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    dst = tmp_path / "out.png"
    write_png(src, img)
    rc = main([str(src), str(dst), "--scale", "2/1", "--a", "2",
               "--profile", "c_oracle", "--backend", "xla", "--expected"])
    assert rc == 0
    out = read_png(dst)
    assert out.shape == (64, 48, 3)
    captured = capsys.readouterr().out
    assert "PSNR" in captured
    # c_oracle profile on the XLA backend is bit-exact vs the ref oracle
    assert "PSNR: inf" in captured or "RMS error vs oracle: 0.0000" in captured
    ex = list(tmp_path.glob("*expected.png"))
    assert len(ex) == 1


def test_cli_default_output_name(tmp_path, rng):
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    write_png(src, img)
    rc = main([str(src), "--scale", "3/1", "--a", "2", "--no-psnr"])
    assert rc == 0
    outs = list(tmp_path.glob("*observed.png"))
    assert len(outs) == 1
    assert "16x16->48x48_3|1_2-" in outs[0].name  # full_TB.h:170 pattern


def test_cli_rgba_and_gray(tmp_path, rng):
    rgba = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    src = tmp_path / "rgba.png"
    write_png(src, rgba)
    assert main([str(src), str(tmp_path / "o1.png"), "--scale", "2",
                 "--no-psnr"]) == 0
    gray = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    src2 = tmp_path / "gray.png"
    write_png(src2, gray)
    assert main([str(src2), str(tmp_path / "o2.png"), "--scale", "2",
                 "--no-psnr"]) == 0
    assert read_png(tmp_path / "o2.png").shape == (32, 32, 3)


def test_cli_info(tmp_path, capsys):
    import numpy as np

    from lanczos_tpu.cli import main
    from lanczos_tpu.io import write_image

    p = tmp_path / "x.png"
    write_image(p, np.zeros((12, 34, 3), np.uint8))
    assert main([str(p), "--info"]) == 0
    out = capsys.readouterr().out
    assert "png 34x12 3ch 8-bit" in out


def test_cli_expected_is_fp64_oracle(tmp_path, capsys):
    """The reference testbench's 'expected' is always the fp64 software
    oracle (full_TB.h:141), so the hls profile prints a nonzero
    cross-implementation RMS while c_oracle prints bit-exact inf."""
    import numpy as np

    from lanczos_tpu.cli import main
    from lanczos_tpu.io import write_image

    rng = np.random.default_rng(5)
    p = tmp_path / "in.png"
    write_image(p, rng.integers(0, 256, (24, 20, 3), dtype=np.uint8))
    assert main([str(p), str(tmp_path / "o1.png"), "--scale", "2/1",
                 "--a", "2", "--profile", "hls"]) == 0
    hls_out = capsys.readouterr().out
    assert "PSNR: inf" not in hls_out and "RMS error vs fp64 oracle" in hls_out
    assert main([str(p), str(tmp_path / "o2.png"), "--scale", "2/1",
                 "--a", "2", "--profile", "c_oracle"]) == 0
    assert "PSNR: inf" in capsys.readouterr().out


def test_cli_downscale_psnr_falls_back(tmp_path, capsys, rng):
    """A downscale run is outside the C oracle's domain (upscale-only,
    full_TB.h): the PSNR step must fall back to the fp64 ref backend
    instead of crashing (round-3 advisor finding, cli.py:157)."""
    from lanczos_tpu.io import write_image

    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    write_image(src, img)
    rc = main([str(src), str(tmp_path / "down.png"), "--scale", "1/2",
               "--a", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RMS error vs fp64 ref backend" in out
    assert read_png(tmp_path / "down.png").shape == (16, 16, 3)


def test_cli_center_align_psnr_falls_back(tmp_path, capsys, rng):
    """center align is outside the C oracle's domain (the oracle is
    zero-aligned); the PSNR print must compare against the ref backend
    with the SAME config, yielding a self-consistent (near-exact) value."""
    from lanczos_tpu.io import write_image

    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    write_image(src, img)
    rc = main([str(src), str(tmp_path / "o.png"), "--scale", "2/1",
               "--a", "2", "--align", "center"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "fp64 ref backend" in out


def test_cli_precision_bf16(tmp_path, capsys, rng):
    """--precision bf16 selects the fast tier on the precise profile and
    is rejected for the bit-exact profiles."""
    from lanczos_tpu.io import write_image

    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    write_image(src, img)
    rc = main([str(src), str(tmp_path / "o.png"), "--scale", "2/1",
               "--a", "2", "--precision", "bf16", "--no-psnr"])
    assert rc == 0
    assert read_png(tmp_path / "o.png").shape == (32, 32, 3)
    import pytest

    with pytest.raises(SystemExit):
        main([str(src), "--profile", "hls", "--precision", "bf16"])

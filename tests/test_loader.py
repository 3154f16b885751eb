"""Frame loader/writer pipeline."""

import numpy as np

from lanczos_tpu.io import read_png, write_png
from lanczos_tpu.io.loader import FrameLoader, FrameWriter


def test_loader_order_and_content(tmp_path, rng):
    paths = []
    imgs = []
    for k in range(9):
        img = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
        p = tmp_path / f"f{k:03d}.png"
        write_png(p, img)
        paths.append(p)
        imgs.append(img)
    loader = FrameLoader(paths, decode_workers=3, prefetch=4)
    assert len(loader) == 9
    out = list(loader)
    assert [p for p, _ in out] == [str(p) for p in paths]
    for (_, got), want in zip(out, imgs):
        np.testing.assert_array_equal(got, want)


def test_loader_transform(tmp_path, rng):
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_png(p, img)
    loader = FrameLoader([p], transform=lambda im: im[..., :1])
    (_, got), = list(loader)
    assert got.shape == (8, 8, 1)


def test_writer_roundtrip(tmp_path, rng):
    imgs = [rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8) for _ in range(5)]
    with FrameWriter(encode_workers=2) as w:
        for k, img in enumerate(imgs):
            w.write(tmp_path / f"o{k}.png", img)
    for k, img in enumerate(imgs):
        np.testing.assert_array_equal(read_png(tmp_path / f"o{k}.png"), img)

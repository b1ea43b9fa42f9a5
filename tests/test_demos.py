"""Smoke tests for the example demo scripts (replacing demo.ipynb /
demo_benchmark.ipynb) — run on CPU with random-init weights and tiny frames."""
import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("demo_frames")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(2):
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        p = str(root / f"frame{i}.jpg")
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths


def test_demo_single_image(frames, tmp_path):
    import demo

    out = str(tmp_path / "out")
    demo.main(["--frames", os.path.join(os.path.dirname(frames[0]), "*.jpg"),
               "--out", out, "--height", "32", "--width", "64"])
    written = glob.glob(os.path.join(out, "*.png"))
    assert len(written) == 2


def test_demo_benchmark_cascade(frames, tmp_path):
    import demo_benchmark

    out = str(tmp_path / "out")
    demo_benchmark.main(["--left", frames[0], "--right", frames[1],
                         "--out", out, "--height", "32", "--width", "64"])
    assert glob.glob(os.path.join(out, "*.png"))


def test_serve_loop_processes_frames(frames, tmp_path):
    import serve

    out = str(tmp_path / "served")
    n = serve.main(["--watch_dir", os.path.dirname(frames[0]),
                    "--output_dir", out, "--height", "32", "--width", "64",
                    "--out_height", "48", "--out_width", "96",
                    "--batch_size", "4", "--max_batches", "1", "--no_bilateral"])
    assert n == 2
    written = glob.glob(os.path.join(out, "*_z.bin"))
    assert len(written) == 2
    z = np.fromfile(written[0], np.float32)
    assert z.size == 48 * 96 and np.isfinite(z).all()


def test_serve_array_mode_blocks(tmp_path):
    """--array_mode consumes pre-decoded uint8 .npy blocks and writes _z.npy depth
    blocks; corrupt/misshapen blocks are retried then blacklisted, not fatal."""
    import serve

    watch = tmp_path / "blocks"
    out = tmp_path / "served"
    watch.mkdir()
    rng = np.random.RandomState(0)
    # a_empty sorts first: a valid-on-disk zero-frame block must be skipped, not
    # crash predict_array with an empty concatenation
    np.save(str(watch / "a_empty.npy"), np.zeros((0, 32, 64, 3), np.uint8))
    np.save(str(watch / "block0.npy"),
            (rng.rand(3, 32, 64, 3) * 255).astype(np.uint8))
    np.save(str(watch / "badshape.npy"), np.zeros((2, 8, 8, 3), np.uint8))
    with open(str(watch / "corrupt.npy"), "wb") as f:
        f.write(b"\x00" * 16)

    n = serve.main(["--watch_dir", str(watch), "--output_dir", str(out),
                    "--height", "32", "--width", "64", "--batch_size", "4",
                    "--max_batches", "1", "--poll_s", "0.01", "--array_mode"])
    assert n == 3
    z = np.load(str(out / "block0_z.npy"))
    assert z.shape == (3, 32, 64) and z.dtype == np.float32
    assert np.isfinite(z).all()
    assert not (out / "a_empty_z.npy").exists()


def test_serve_array_mode_retry_then_blacklist(tmp_path):
    """A permanently-unreadable block is retried across >=2 real poll passes and
    blacklisted; the loop keeps polling and serves a block that arrives later."""
    import threading

    import serve

    watch = tmp_path / "blocks"
    out = tmp_path / "served"
    watch.mkdir()
    with open(str(watch / "corrupt.npy"), "wb") as f:
        f.write(b"\x00" * 16)

    def write_good_block():
        rng = np.random.RandomState(1)
        with open(str(watch / "late.part"), "wb") as fh:  # atomic-rename protocol
            np.save(fh, (rng.rand(2, 32, 64, 3) * 255).astype(np.uint8))
        os.replace(str(watch / "late.part"), str(watch / "late.npy"))

    t = threading.Timer(1.0, write_good_block)
    t.start()
    try:
        n = serve.main(["--watch_dir", str(watch), "--output_dir", str(out),
                        "--height", "32", "--width", "64", "--batch_size", "4",
                        "--max_batches", "1", "--poll_s", "0.05", "--array_mode"])
    finally:
        t.join()
    assert n == 2  # the late block was served; corrupt never killed the loop
    assert (out / "late_z.npy").exists()
    assert not (out / "corrupt_z.npy").exists()


def test_serve_turbo_model(frames, tmp_path):
    """--turbo serves the distilled-architecture student through the same loop."""
    import serve

    out = str(tmp_path / "served_turbo")
    n = serve.main(["--watch_dir", os.path.dirname(frames[0]),
                    "--output_dir", out, "--height", "32", "--width", "64",
                    "--out_height", "48", "--out_width", "96", "--turbo", "small",
                    "--batch_size", "4", "--max_batches", "1", "--no_bilateral"])
    assert n == 2
    written = glob.glob(os.path.join(out, "*_z.bin"))
    assert len(written) == 2
    z = np.fromfile(written[0], np.float32)
    assert z.size == 48 * 96 and np.isfinite(z).all()

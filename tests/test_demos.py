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

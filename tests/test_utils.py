"""Tests for GIF encoding and HTML gallery utilities."""

import os

import numpy as np

from video_prediction_tpu.utils.gif import encode_gif, save_gif, tile_image_grid
from video_prediction_tpu.utils.html import HTML


class TestGif:
    def test_encode_roundtrip(self, tmp_path):
        from PIL import Image

        vid = np.random.RandomState(0).rand(5, 16, 16, 3).astype(np.float32)
        data = encode_gif(vid, fps=4)
        assert data[:6] in (b"GIF87a", b"GIF89a")
        p = tmp_path / "x.gif"
        save_gif(str(p), vid)
        img = Image.open(p)
        assert img.n_frames == 5
        assert img.size == (16, 16)

    def test_uint8_input(self):
        vid = np.zeros((2, 8, 8, 3), np.uint8)
        assert encode_gif(vid)[:3] == b"GIF"

    def test_tile_grid(self):
        batch = np.zeros((5, 3, 8, 8, 3), np.float32)
        grid = tile_image_grid(batch, max_cols=4)
        assert grid.shape == (3, 16, 32, 3)  # 2 rows x 4 cols


class TestHTML:
    def test_build_page(self, tmp_path):
        html = HTML(str(tmp_path), title="t")
        html.add_header("h")
        html.add_text("some text")
        html.add_images(["images/a.gif", "images/b.gif"], ["a", "b"])
        path = html.save()
        assert os.path.exists(path)
        content = open(path).read()
        assert "<h3>h</h3>" in content and "a.gif" in content
        assert os.path.isdir(html.get_image_dir())

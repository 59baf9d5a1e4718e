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


class TestTraceSummary:
    def _write_trace(self, tmp_path, gz=True):
        import gzip
        import json

        events = [
            {"ph": "M", "pid": 1, "tid": 0, "name": "thread_name", "args": {"name": "XLA Modules"}},
            {"ph": "M", "pid": 1, "tid": 1, "name": "thread_name", "args": {"name": "XLA Ops"}},
            {"ph": "X", "pid": 1, "tid": 0, "name": "jit_step(1)", "dur": 1000,
             "args": {"device_duration_ps": "2000000000"}},
            {"ph": "X", "pid": 1, "tid": 0, "name": "jit_step(1)", "dur": 1000,
             "args": {"device_duration_ps": "2000000000"}},
            # two fusions with ids -> same bucket; 1 ms each, 1 GB each
            {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.12", "dur": 1000,
             "args": {"device_duration_ps": "1000000000", "bytes_accessed": "1000000000"}},
            {"ph": "X", "pid": 1, "tid": 1, "name": "fusion.34", "dur": 1000,
             "args": {"device_duration_ps": "1000000000", "bytes_accessed": "1000000000"}},
            {"ph": "X", "pid": 1, "tid": 1, "name": "copy-done.5", "dur": 10,
             "args": {"device_duration_ps": "500000000", "bytes_accessed": "0"}},
        ]
        sub = tmp_path / "plugins" / "profile" / "run1"
        sub.mkdir(parents=True)
        p = sub / ("t.trace.json.gz" if gz else "t.trace.json")
        raw = json.dumps({"traceEvents": events})
        if gz:
            with gzip.open(p, "wt") as f:
                f.write(raw)
        else:
            p.write_text(raw)
        return str(p)

    def test_op_table_aggregates_by_op_type(self, tmp_path):
        from video_prediction_tpu.utils.trace_summary import find_trace_file, format_table, op_table

        path = self._write_trace(tmp_path)
        assert find_trace_file(str(tmp_path)) == path
        total, steps, rows = op_table(path)
        assert steps == 2
        assert abs(total - 2.5) < 1e-6  # 2x1ms fusion + 0.5ms copy-done
        top = rows[0]
        assert top["name"] == "fusion" and top["count"] == 2
        assert abs(top["gbps"] - 1000.0) < 1e-6  # 2 GB in 2 ms
        table = format_table(total, steps, rows)
        assert "fusion" in table and "ms/step" in table


class TestWatchdog:
    def test_returns_devices_and_disarms_on_healthy_backend(self):
        # conftest forces the CPU backend, so init completes instantly; a
        # short timeout must NOT fire after done.set() (regression guard
        # for the disarm path — firing would os._exit(3) and kill pytest).
        import time

        from video_prediction_tpu.utils.watchdog import device_init_or_die

        devices = device_init_or_die(timeout_s=0.2)
        assert len(devices) >= 1
        time.sleep(0.4)  # give a buggy (non-disarmed) watchdog time to fire

    def test_disarms_when_device_query_raises(self, monkeypatch):
        # A FAILED backend registration makes jax.devices() raise rather
        # than hang (e.g. a swallowed plugin register() error). The
        # watchdog must disarm on that path too — otherwise a caller that
        # catches the exception is os._exit(3)'d up to timeout_s later.
        import time

        import jax
        import pytest

        from video_prediction_tpu.utils.watchdog import device_init_or_die

        def boom():
            raise RuntimeError("backend registration failed")

        monkeypatch.setattr(jax, "devices", boom)
        with pytest.raises(RuntimeError, match="registration failed"):
            device_init_or_die(timeout_s=0.2)
        time.sleep(0.4)  # a non-disarmed watchdog would kill pytest here

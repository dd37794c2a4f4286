"""Video tooling tests: write_video fallback chain with synthetic frames,
and graceful degradation of the render path when no GL is available
(mirrors the reference's excluded-from-CI video test tier, SURVEY §4)."""

import os

import numpy as np

from puppax.tools import video


def _frames(n=4, h=16, w=24):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (h, w, 3), np.uint8) for _ in range(n)]


def test_write_video_produces_file(tmp_path):
    path = str(tmp_path / "clip.mp4")
    out = video.write_video(path, _frames(), fps=25)
    # mediapy -> ffmpeg -> .npz fallback; whichever ran must leave a file
    assert os.path.exists(out)
    assert out.endswith(".mp4") or out.endswith(".npz")
    assert os.path.getsize(out) > 0


def test_write_video_npz_fallback_roundtrip(tmp_path, monkeypatch):
    # force the npz fallback by hiding ffmpeg and mediapy
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "which", lambda *_: None)
    import sys

    monkeypatch.setitem(sys.modules, "mediapy", None)
    path = str(tmp_path / "clip.mp4")
    frames = _frames()
    out = video.write_video(path, frames, fps=50)
    assert out.endswith(".npz")
    data = np.load(out)
    np.testing.assert_array_equal(data["frames"], np.stack(frames))
    assert float(data["fps"]) == 50.0


def test_render_trajectory_raises_cleanly_without_gl():
    """With no GL context, render_trajectory must raise RuntimeError (which
    visualize_policy converts to a graceful None), not crash the process."""
    from puppax.model.mjcf import load_model

    cm = load_model(None)
    try:
        frames = video.render_trajectory(cm.mj_model, [cm.robot.key_qpos])
        # environments with working GL: must actually produce frames
        assert len(frames) == 1 and frames[0].ndim == 3
    except RuntimeError as e:
        assert "renderer unavailable" in str(e)

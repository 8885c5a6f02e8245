"""Live ffmpeg demux tests for pipeline/extract.py frames/audio.

These are the only L1 stages whose subprocess invocation was previously just
string-checked (this image ships no ffmpeg binary — reference counterparts:
/root/reference/scripts/extract_visual_frames/extract_frames.py:7-17 and
extract_audio_cues/extract_audio.py:11-15). Where ffmpeg IS present the test
synthesizes its own fixture video (lavfi testsrc + sine — no network, no
checked-in media) and drives the real demux end to end; elsewhere it skips
cleanly.
"""
import shutil
import subprocess

import numpy as np
import pytest

FFMPEG = shutil.which("ffmpeg")

pytestmark = pytest.mark.skipif(FFMPEG is None, reason="no ffmpeg binary")


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    """A 3-second 64x64 test video with a 440 Hz sine audio track."""
    path = tmp_path_factory.mktemp("media") / "vid0001.mp4"
    subprocess.run(
        [FFMPEG, "-nostdin", "-loglevel", "error",
         "-f", "lavfi", "-i", "testsrc=duration=3:size=64x64:rate=8",
         "-f", "lavfi", "-i", "sine=frequency=440:duration=3",
         "-c:v", "libx264", "-pix_fmt", "yuv420p", "-c:a", "aac",
         "-shortest", str(path)],
        check=True)
    return path


def test_extract_frames_live(tiny_video, tmp_path):
    from qa_tiger_tpu.pipeline.extract import extract_frames

    dst = tmp_path / "frames" / tiny_video.stem
    extract_frames(tiny_video, dst, fps=1)
    jpgs = sorted(dst.glob("*.jpg"))
    # 1 fps over a 3 s clip: ffmpeg emits 3-4 frames depending on rounding
    assert 3 <= len(jpgs) <= 4, [p.name for p in jpgs]
    assert jpgs[0].name == "000001.jpg"  # %06d template, 1-based
    from PIL import Image

    with Image.open(jpgs[0]) as im:
        assert im.size == (64, 64)


def test_extract_audio_live(tiny_video, tmp_path):
    from scipy.io import wavfile

    from qa_tiger_tpu.pipeline.extract import extract_audio

    dst = tmp_path / "audio" / f"{tiny_video.stem}.wav"
    extract_audio(tiny_video, dst, sr=16000)
    sr, wav = wavfile.read(dst)
    assert sr == 16000
    assert wav.ndim == 1  # -ac 1 mono
    assert abs(wav.shape[0] / sr - 3.0) < 0.25  # ~3 s
    # the sine track must carry real signal energy
    assert np.abs(wav.astype(np.float64)).mean() > 1.0


def test_frames_then_features_live(tiny_video, tmp_path):
    """Demuxed frames flow into the frame-selection + image-IO path the
    model-backed stages consume (select_frame_paths pads 3 -> 60 with the
    last frame, ref extract_frames_ViT-L14@336px.py:125-139)."""
    from qa_tiger_tpu.pipeline.extract import (
        extract_frames,
        load_image_batch,
        select_frame_paths,
    )

    dst = tmp_path / "frames" / tiny_video.stem
    extract_frames(tiny_video, dst, fps=1)
    sel = select_frame_paths(sorted(dst.glob("*.jpg")), target=60)
    assert len(sel) == 60
    assert sel[-1] == sel[-2]  # padded with the last frame
    batch = load_image_batch(sel[:2], 64, (0.48, 0.46, 0.41), (0.27, 0.26, 0.28))
    assert batch.shape == (2, 64, 64, 3)
    assert np.isfinite(batch).all()

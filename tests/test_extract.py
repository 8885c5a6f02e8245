"""Feature-extraction pipeline tests: frame sampling rule, end-to-end stage
drivers with random weights over a synthetic corpus, and the full
corpus -> features -> dataset -> model chain."""
import json
from pathlib import Path

import numpy as np
import pytest

from qa_tiger_tpu.pipeline import extract as E


class TestFrameSelection:
    def test_uniform_sampling_matches_reference_rule(self):
        paths = [Path(f"{i:06d}.jpg") for i in range(100)]
        sel = E.select_frame_paths(paths, 60)
        idx = np.round(np.linspace(0, 99, 60)).astype(int)
        assert sel == [paths[i] for i in idx]

    def test_exact_count_identity(self):
        paths = [Path(f"{i}.jpg") for i in range(60)]
        assert E.select_frame_paths(paths, 60) == paths

    def test_padding_with_last(self):
        paths = [Path(f"{i}.jpg") for i in range(40)]
        sel = E.select_frame_paths(paths, 60)
        assert sel[:40] == paths and sel[40:] == [paths[-1]] * 20

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            E.select_frame_paths([], 60)


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    """Synthetic corpus: jpg frame dirs + wavs for 2 'videos'."""
    from PIL import Image
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    frames = root / "frames"
    for v in ("vid1", "vid2"):
        d = frames / v
        d.mkdir(parents=True)
        for i in range(5):
            arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i:06d}.jpg")
    audio = root / "audio"
    audio.mkdir()
    for v in ("vid1", "vid2"):
        wav = (rng.standard_normal(16000 * 3) * 2000).astype(np.int16)
        wavfile.write(audio / f"{v}.wav", 16000, wav)
    annot = [{"question_id": i,
              "question_content": "Is there a <Object> sound?",
              "templ_values": '["piano"]'} for i in range(3)]
    (root / "annot.json").write_text(json.dumps(annot))
    return root


@pytest.fixture(autouse=True)
def tiny_models(monkeypatch):
    from qa_tiger_tpu.models import clip_image, clip_text, vit

    monkeypatch.setitem(
        clip_image.CLIP_VISION_CONFIGS, "tiny-vis",
        dict(input_resolution=32, patch_size=8, width=32, layers=2, heads=4,
             output_dim=24))
    monkeypatch.setitem(
        clip_text.CLIP_TEXT_CONFIGS, "tiny-vis",
        dict(width=32, heads=4, layers=2, embed_dim=24))
    monkeypatch.setitem(
        vit.VIT_CONFIGS, "tiny-tome",
        dict(img_size=32, patch_size=8, width=16, depth=3, heads=4,
             ln_eps=1e-6))


def test_vggish_stage(media, tmp_path):
    E.main(["vggish", "--src", str(media / "audio"), "--dst", str(tmp_path),
            "--num-secs", "6", "--random-weights"])
    out = np.load(tmp_path / "vid1.npy")
    assert out.shape == (6, 128)
    assert np.all(np.isfinite(out))
    # pad rule: seconds 3.. come from tiling the last second, so every
    # second from index 3 on embeds identically
    np.testing.assert_allclose(out[3], out[4], rtol=1e-4, atol=1e-5)


def test_clip_stage(media, tmp_path):
    E.main(["clip", "--src", str(media / "frames"), "--dst", str(tmp_path),
            "--encoder", "tiny-vis", "--random-weights"])
    out = np.load(tmp_path / "vid1.npy")
    assert out.shape == (60, 24)
    # frames 5..59 are the padded last frame -> identical features
    np.testing.assert_allclose(out[5], out[59], rtol=1e-4, atol=1e-5)


def test_tome_stage(media, tmp_path):
    E.main(["tome", "--src", str(media / "frames"), "--dst", str(tmp_path),
            "--model", "tiny-tome", "--r", "3", "--layers", "3",
            "--random-weights"])
    out = np.load(tmp_path / "vid1.npy")
    # 17 tokens - 3*3 merges = 8 remaining (incl cls)
    assert out.shape == (60, 8, 16)


def test_question_and_prompt_stages(media, tmp_path):
    E.main(["questions", "--annot", str(media / "annot.json"),
            "--dst", str(tmp_path / "q"), "--encoder", "tiny-vis",
            "--random-weights"])
    E.main(["prompts", "--annot", str(media / "annot.json"),
            "--dst", str(tmp_path / "p"), "--encoder", "tiny-vis",
            "--random-weights"])
    q = np.load(tmp_path / "q" / "0.npy")
    p = np.load(tmp_path / "p" / "0.npy")
    assert q.shape == (1, 24) and p.shape == (1, 24)
    assert not np.allclose(q, p)  # different texts -> different features


def test_resumability(media, tmp_path, capsys):
    E.main(["vggish", "--src", str(media / "audio"), "--dst", str(tmp_path),
            "--num-secs", "3", "--random-weights"])
    before = (tmp_path / "vid1.npy").stat().st_mtime
    E.main(["vggish", "--src", str(media / "audio"), "--dst", str(tmp_path),
            "--num-secs", "3", "--random-weights"])
    assert (tmp_path / "vid1.npy").stat().st_mtime == before

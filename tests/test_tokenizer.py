"""Tokenizer parity vs the reference's vendored OpenAI CLIP tokenizer."""
import json

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from qa_tiger_tpu.data.tokenizer import ClipTokenizer, find_vocab_file

try:
    find_vocab_file()
    HAVE_VOCAB = True
except FileNotFoundError:  # pragma: no cover
    HAVE_VOCAB = False

pytestmark = pytest.mark.skipif(not HAVE_VOCAB, reason="BPE vocab unavailable")

SAMPLES = [
    "How many musical instruments were heard throughout the video?",
    "Is the <Object> in the video always playing?",
    "Where is the first sounding instrument?",
    "is there a voiceover?",
    "What's the instrument on the <LR> of <Object>?",
]


def test_basic_shape_and_specials():
    tok = ClipTokenizer()
    arr = tok(SAMPLES)
    assert arr.shape == (len(SAMPLES), 77)
    assert (arr[:, 0] == tok.sot_id).all()
    for row in arr:
        nz = row[row != 0]
        assert nz[-1] == tok.eot_id
    # EOT must carry the highest id so argmax-pooling finds it
    assert tok.eot_id == arr.max()
    assert tok.eot_id == 49407


def test_truncation():
    tok = ClipTokenizer()
    long_text = "instrument " * 100
    arr = tok(long_text, truncate=True)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == tok.eot_id
    with pytest.raises(RuntimeError):
        tok(long_text, truncate=False)


def test_roundtrip_decode():
    tok = ClipTokenizer()
    ids = tok.encode("how many flutes are playing?")
    assert tok.decode(ids).strip() == "how many flutes are playing ?"


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_with_reference_tokenizer():
    add_reference_to_path()
    from src.models.base.clip_tokenize import SimpleTokenizer  # oracle

    ref = SimpleTokenizer(find_vocab_file().as_posix())
    ours = ClipTokenizer()
    with open("/root/reference/data/annots/music_avqa/music_avqa_val.json") as f:
        questions = [s["question_content"] for s in json.load(f)[:200]]
    for text in SAMPLES + questions:
        assert ours.encode(text) == ref.encode(text), text


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_tokenize_wrapper_parity():
    """Full tokenize() (with SOT/EOT + padding) vs reference clip.tokenize."""
    add_reference_to_path()
    from src.models import clip as ref_clip

    ours = ClipTokenizer()
    theirs = ref_clip.tokenize(SAMPLES, truncate=True).numpy()
    np.testing.assert_array_equal(ours(SAMPLES, truncate=True), theirs)

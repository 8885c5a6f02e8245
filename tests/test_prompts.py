"""Prompt matcher parity vs the reference on every real annotation."""
import json

import pytest

from tests.conftest import add_reference_to_path, reference_available

from qa_tiger_tpu.data.prompts import PROMPT_TABLE, match_prompt


def test_table_covers_33_templates():
    assert len(PROMPT_TABLE) == 33


def test_fallback_is_reference_compatible():
    assert match_prompt("Unknown question?", "[]") == "e"


def test_basic_substitution():
    assert match_prompt("Is the <Object> in the video always playing?",
                        '["violin"]') == \
        "The violin is not playing in this video."
    # reference quirk: spaces inside values are stripped
    assert match_prompt("Is there a <Object> in the entire video?",
                        '["acoustic guitar"]') == \
        "The acousticguitar is not in this video."


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_parity_on_real_annotations():
    add_reference_to_path()
    from src.prompt_matcher import match_prompt as ref_match  # oracle

    count = 0
    for split in ("music_avqa_val", "music_avqa_test"):
        path = f"/root/reference/data/annots/music_avqa/{split}.json"
        for s in json.load(open(path)):
            ours = match_prompt(s["question_content"], s["templ_values"])
            theirs = ref_match(s["question_content"], s["templ_values"])
            assert ours == theirs, (s["question_content"], ours, theirs)
            count += 1
    assert count > 10000

"""End-to-end accuracy equality: the reference torch test pipeline
(src/dataset.py AVQA_dataset -> DataLoader -> src/trainutils.py test())
vs our src/test.py CLI, on the SAME synthetic corpus and the SAME weights
(converted torch -> JAX). Asserts the complete per-qtype accuracy report —
all 13 'Test ... accuracy: v(c/t)' lines — is IDENTICAL.

This is the offline stand-in for BASELINE's HF-checkpoint accuracy gate
(no network: no real checkpoints/features), exercising both stacks'
datasets, loaders, tokenization, eval loops, and counters end to end.
"""
import importlib.util
import json
import re
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)

# transformers is present but would download bert on first use; the reference
# dataset only *constructs* the bert tokenizer, never uses it for QA-TIGER,
# so stub the module before the reference imports it
if "transformers" not in sys.modules:
    mod = types.ModuleType("transformers")
    mod.AutoTokenizer = type(
        "AutoTokenizer", (),
        {"from_pretrained": staticmethod(lambda *a, **k: None)})
    sys.modules["transformers"] = mod

add_reference_to_path()

from src import dataset as ref_dataset  # noqa: E402
from src import trainutils as ref_trainutils  # noqa: E402
from src.models import net as ref_net  # noqa: E402
from src.models.base import clip_base as ref_clip  # noqa: E402

from qa_tiger_tpu.convert import state_dict_to_pytree  # noqa: E402
from qa_tiger_tpu.training import save_checkpoint  # noqa: E402
from qa_tiger_tpu.utils import Box  # noqa: E402

REPO = Path(__file__).resolve().parents[1]

# tiny dims; video_dim == text width (reference quest_proj quirk,
# src/models/net.py:42-43)
D_MODEL, VIDEO_DIM, PATCH_DIM, AUDIO_DIM = 32, 64, 48, 24
WIDTH, HEADS, LAYERS, EMBED = 64, 4, 2, 64
VOCAB, CTX = 49408, 77  # real BPE vocab so real tokenized questions work
T, P, TOPK, EXPERTS = 12, 4, 3, 5

# >=1 sample of every qtype: the reference's report divides per-type
# (trainutils.py:380) and would ZeroDivisionError on an empty type
ALL_TYPES = [
    '["Audio", "Counting"]', '["Audio", "Comparative"]',
    '["Visual", "Counting"]', '["Visual", "Location"]',
    '["Audio-Visual", "Existential"]', '["Audio-Visual", "Counting"]',
    '["Audio-Visual", "Location"]', '["Audio-Visual", "Comparative"]',
    '["Audio-Visual", "Temporal"]',
]
# exactly 42 answers like the real MUSIC-AVQA vocabulary: our CLI sizes the
# head from the dataset's answer2idx (src/test.py builds first_ds before the
# model) while the reference's QA_TIGER head is fixed at 42 — with a
# 42-answer vocab both heads match the converted checkpoint
ANSWERS = ([str(i) for i in range(12)]
           + ["yes", "no", "left", "right", "middle", "indoor", "outdoor"]
           + ["cello", "ukulele", "piano", "guitar", "violin", "drum",
              "flute", "congas", "saxophone", "trumpet", "accordion",
              "banjo", "tuba", "clarinet", "erhu", "guzheng", "pipa",
              "suona", "bassoon", "acoustic_guitar", "bagpipe",
              "electric_bass", "xylophone"])
assert len(ANSWERS) == 42
QUESTIONS = [
    "How many instruments are playing in the video?",
    "Is the <Object> in the video always playing?",
    "Where is the <LL> instrument?",
    "Which instrument is louder, the <Object> or the <Object>?",
]
VIDEOS = [f"v{i:03d}" for i in range(6)]


class TorchTextTower(torch.nn.Module):
    """CLIP_TEncoder replica at tiny width but REAL vocab, built from the
    reference's transformer classes (same pattern as test_clip_text_parity)."""

    def __init__(self):
        super().__init__()
        mask = torch.full((CTX, CTX), float("-inf")).triu_(1)
        self.token_embedding = torch.nn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(CTX, WIDTH) * 0.01)
        self.transformer = ref_clip.Transformer(
            WIDTH, LAYERS, HEADS, q_aware_N=-1, attn_mask=mask)
        self.ln_final = torch.nn.LayerNorm(WIDTH)
        self.text_projection = torch.nn.Parameter(
            torch.randn(WIDTH, EMBED) * WIDTH ** -0.5)
        self.logit_scale = torch.nn.Parameter(torch.tensor(2.6592))
        self.dtype = torch.float32

    def forward(self, text):
        x = self.token_embedding(text)
        x = x + self.positional_embedding[: x.shape[1]]
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]),
                   torch.argmax(text, dim=-1)] @ self.text_projection
        return pooled, x

    def freeze(self):
        for p in self.parameters():
            p.requires_grad = False


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_acc")
    data = root / "data"
    rng = np.random.default_rng(0)
    for sub, shape in [("vggish", (T, AUDIO_DIM)), ("clip", (T, VIDEO_DIM)),
                       ("tome", (T, P, PATCH_DIM))]:
        d = data / sub
        d.mkdir(parents=True)
        for v in VIDEOS:
            np.save(d / f"{v}.npy",
                    rng.standard_normal(shape).astype(np.float32))

    n = 27  # 3x all 9 types -> a few eval batches
    annots = [{
        "video_id": VIDEOS[i % len(VIDEOS)],
        "question_id": i,
        "type": ALL_TYPES[i % 9],
        "question_content": QUESTIONS[i % len(QUESTIONS)],
        "templ_values": '["ukulele", "cello"]',
        "anser": ANSWERS[i % len(ANSWERS)],
    } for i in range(n)]
    (data / "test.json").write_text(json.dumps(annots))
    (data / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {a: i for i, a in enumerate(ANSWERS)},
         "max_que_len": 24}))
    return data


def data_cfg(data: Path) -> dict:
    return dict(
        root=str(data), img_size=336, batch_size=8, eval_batch_size=8,
        num_workers=0, frame_sample_rate=1,
        train_annot="test.json", valid_annot="test.json",
        test_annot="test.json", test_annots=None,
        ans_quelen="answer2idx.json",
        quest_feat=None, audio_feat="vggish", video_feat="clip",
        patch_feat="tome", prompt_feat=None,
    )


class CaptureLogger:
    def __init__(self):
        self.lines = []

    def info(self, msg, *a, **k):
        self.lines.append(str(msg))


ACC_RE = re.compile(r"Test\s+([\w\-/ ]+?)\s+accuracy: ([\d.]+)\((\d+)/(\d+)\)")


def accuracy_lines(lines):
    out = {}
    for line in lines:
        m = ACC_RE.search(line)
        if m:
            out[m.group(1).strip()] = (m.group(2), m.group(3), m.group(4))
    return out


def run_reference(corpus, model) -> dict:
    cfg = Box(dict(
        type="qa-tiger", mode="test", debug=False, log_interval=100, seed=1,
        data=data_cfg(corpus),
        hyper_params=Box(dict(model_type="QA-TIGER_e2e")),
    ))
    loader = torch.utils.data.DataLoader(
        ref_dataset.AVQA_dataset(cfg, mode="test"),
        batch_size=cfg.data.eval_batch_size, shuffle=False, num_workers=0)
    cap = CaptureLogger()
    orig = ref_trainutils.get_logger
    ref_trainutils.get_logger = lambda: cap
    try:
        acc = ref_trainutils.test(cfg, torch.device("cpu"), loader, model)
    finally:
        ref_trainutils.get_logger = orig
    report = accuracy_lines(cap.lines)
    assert report, "reference produced no accuracy lines"
    return report, acc


def run_ours(corpus, weight_path, monkeypatch, tmp_path) -> dict:
    import qa_tiger_tpu.models.clip_text as ct
    from qa_tiger_tpu.parallel import mesh as mesh_mod

    monkeypatch.setitem(ct.CLIP_TEXT_CONFIGS, "tiny-e2e",
                        dict(width=WIDTH, heads=HEADS, layers=LAYERS,
                             embed_dim=EMBED))
    real_make_mesh = mesh_mod.make_mesh
    cfg_file = tmp_path / "e2e.py"
    cfg_file.write_text(f"""
config = dict(
    type='qa-tiger', seed=1, epochs=1, num_labels=42, log_interval=100,
    output_dir='{(tmp_path / 'out').as_posix()}', weight='',
    data=dict(**{data_cfg(corpus)!r}),
    hyper_params=dict(
        gpus='0', model_type='QA-TIGER_e2e',
        model=dict(d_model={D_MODEL}, video_dim={VIDEO_DIM},
                   patch_dim={PATCH_DIM}, audio_dim={AUDIO_DIM},
                   topK={TOPK}, num_experts={EXPERTS},
                   encoder_type='tiny-e2e'),
        optim=dict(lr=1e-3, encoder_lr=None, min_lr=1e-7, weight_decay=0,
                   betas=(0.95, 0.999)),
        sched=dict(name='StepLR', mode='min', gamma=0.1, step_size=8,
                   factor=0.5, patience=5, verbose=True, warmup_epochs=1),
    ),
)
""")
    spec = importlib.util.spec_from_file_location(
        "qa_e2e_test_entry", REPO / "src" / "test.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        mod, "make_mesh",
        lambda *a, **k: real_make_mesh(
            *a, **{**k, "devices": jax.devices("cpu")}))
    monkeypatch.setattr(sys, "argv", [
        "test.py", "--config", str(cfg_file), "--weight", str(weight_path),
        "--output_path", str(tmp_path / "out")])
    mod.main()
    result = (tmp_path / "out" / f"{Path(weight_path).stem}_result.txt")
    report = accuracy_lines(result.read_text().splitlines())
    assert report, "our CLI produced no accuracy lines"
    return report


class TestEndToEndAccuracyEquality:
    def test_reports_identical(self, corpus, monkeypatch, tmp_path):
        torch.manual_seed(0)
        tower = TorchTextTower().eval()
        monkeypatch.setattr(ref_net, "CLIP_TEncoder", lambda _name: tower)
        ref = ref_net.QA_TIGER(
            d_model=D_MODEL, video_dim=VIDEO_DIM, patch_dim=PATCH_DIM,
            audio_dim=AUDIO_DIM, topK=TOPK, num_experts=EXPERTS,
            encoder_type="unused").eval()

        ref_report, ref_acc = run_reference(corpus, ref)

        params = jax.tree_util.tree_map(
            jnp.asarray, state_dict_to_pytree(ref.state_dict()))
        weight_path = tmp_path / "converted.npz"
        save_checkpoint(params, weight_path)
        our_report = run_ours(corpus, weight_path, monkeypatch, tmp_path)

        # identical accuracy values AND raw counters, every one of the
        # 9 per-type + 3 per-modality + total lines
        assert set(our_report) == set(ref_report)
        assert len(ref_report) == 13
        for key in ref_report:
            assert our_report[key] == ref_report[key], (
                f"{key}: ours {our_report[key]} != ref {ref_report[key]}")
        total_c, total_t = int(ref_report["Total avg"][1]), \
            int(ref_report["Total avg"][2])
        assert total_t == 27
        assert ref_acc == pytest.approx(total_c / total_t * 100.0)

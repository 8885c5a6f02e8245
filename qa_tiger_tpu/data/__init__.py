from qa_tiger_tpu.data.annotations import (
    qtype2idx,
    load_annotations,
    load_answer_vocab,
    qtype_index,
)
from qa_tiger_tpu.data.tokenizer import ClipTokenizer, tokenize
from qa_tiger_tpu.data.dataset import AVQADataset, BatchLoader

__all__ = [
    "qtype2idx",
    "load_annotations",
    "load_answer_vocab",
    "qtype_index",
    "ClipTokenizer",
    "tokenize",
    "AVQADataset",
    "BatchLoader",
]

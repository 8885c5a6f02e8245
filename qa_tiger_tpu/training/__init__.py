from qa_tiger_tpu.training.optim import (
    make_optimizer,
    make_lr_schedule,
    PlateauScheduler,
)
from qa_tiger_tpu.training.metrics import (
    masked_cross_entropy,
    qtype_counters,
    accuracy_report,
)
from qa_tiger_tpu.training.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    save_train_state,
    load_train_state,
    save_train_state_async,
    wait_for_async_saves,
)

__all__ = [
    "make_optimizer",
    "make_lr_schedule",
    "PlateauScheduler",
    "masked_cross_entropy",
    "qtype_counters",
    "accuracy_report",
    "save_checkpoint",
    "load_checkpoint",
    "save_train_state",
    "load_train_state",
    "save_train_state_async",
    "wait_for_async_saves",
]

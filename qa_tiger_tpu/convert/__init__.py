from qa_tiger_tpu.convert.torch_import import (
    flat_to_nested,
    nested_to_flat,
    load_torch_checkpoint,
    state_dict_to_pytree,
)

__all__ = [
    "flat_to_nested",
    "nested_to_flat",
    "load_torch_checkpoint",
    "state_dict_to_pytree",
]

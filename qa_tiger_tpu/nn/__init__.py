from qa_tiger_tpu.nn.core import (
    linear,
    linear_init,
    kaiming_linear_init,
    layer_norm,
    layer_norm_init,
    dropout,
    mlp2,
    mlp2_init,
    quick_gelu,
    next_rng,
)
from qa_tiger_tpu.nn.attention import mha, mha_init

__all__ = [
    "linear",
    "linear_init",
    "kaiming_linear_init",
    "layer_norm",
    "layer_norm_init",
    "dropout",
    "mlp2",
    "mlp2_init",
    "quick_gelu",
    "next_rng",
    "mha",
    "mha_init",
]

from qa_tiger_tpu.ops.pallas.avq import fused_avq_train
from qa_tiger_tpu.ops.pallas.gaussian_moe import fused_gaussian_moe
from qa_tiger_tpu.ops.pallas.patch_select import fused_patch_select
from qa_tiger_tpu.ops.pallas.resblock import fused_resblock

__all__ = ["fused_avq_train", "fused_gaussian_moe", "fused_patch_select",
           "fused_resblock"]

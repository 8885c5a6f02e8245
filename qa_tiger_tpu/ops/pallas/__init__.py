from qa_tiger_tpu.ops.pallas.gaussian_moe import fused_gaussian_moe

__all__ = ["fused_gaussian_moe"]

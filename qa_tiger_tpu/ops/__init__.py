from qa_tiger_tpu.ops.tempmoe import gaussian_weights, gaussian_expert_aggregate

__all__ = ["gaussian_weights", "gaussian_expert_aggregate"]

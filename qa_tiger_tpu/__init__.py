"""qa_tiger_tpu — a TPU-native (JAX/XLA/Pallas) Audio-Visual Question Answering framework.

A from-scratch rebuild of the capabilities of QA-TIGER (CVPR 2025,
"Question-Aware Gaussian Experts for Audio-Visual Question Answering",
reference layout surveyed in /root/repo/SURVEY.md):

- ``models``:   QA-TIGER network, TSPM baseline, CLIP text/image towers, VGGish.
- ``nn``:       functional parity kernel library (torch-semantics MHA, Linear,
                LayerNorm) over plain pytree parameter dicts whose structure
                mirrors torch ``state_dict`` names 1:1 so checkpoints convert
                losslessly.
- ``ops``:      TPU compute ops — fused Gaussian-expert aggregation, ToMe
                bipartite soft matching, log-mel frontend, Pallas kernels.
- ``data``:     annotation/vocab readers, feature dataset, CLIP BPE tokenizer,
                prompt matcher, host-side prefetching loader.
- ``parallel``: device-mesh construction and sharding rules (DP over a
                ``data`` axis; optional tensor sharding over ``model``).
- ``training``: jitted train/eval steps, optax optimizers with StepLR /
                cosine / plateau schedules, metrics, checkpointing.
- ``convert``:  torch ``.pt`` state_dict -> pytree importers.

Everything in the hot path is pure-functional and compiles to a single XLA
graph per step; batches have static shapes (padded + masked) so XLA never
recompiles during an epoch.
"""

__version__ = "0.1.0"

"""efficient_gnns_tpu — a TPU-native GNN message-passing + knowledge-distillation framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
experiment suite for "On Representation Knowledge Distillation for Graph
Neural Networks" (Joshi et al., TNNLS 2022): GCN, GraphSAGE, GAT, GIN-E, PNA,
R-GCN and SIGN models; logit-KD, FitNet, Attention Transfer, Local/Global
Structure Preserving and G-CRD distillation losses; OGB node- and
graph-classification workloads.

Layering (bottom -> top), mirroring SURVEY.md section 1:
  graphs/    CSR / padded-COO containers + preprocessing    (reference L1)
  ops/       SpMM, SDDMM, edge-softmax, segment reductions  (reference L0)
  models/    GNN model zoo as flax modules                  (reference L2)
  sampling/  GraphSAINT walks, SIGN hop precompute          (reference L3)
  distill/   distillation criteria + teacher artifact I/O   (reference L4)
  train/     jitted steps, epoch drivers, logging, ckpt     (reference L5-L6)
  parallel/  mesh, edge partitioning, halo exchange         (no reference analog)
  cli/       experiment entry points                        (reference L7)
"""

__version__ = "0.1.0"

from efficient_gnns_tpu.graphs.container import Graph  # noqa: F401

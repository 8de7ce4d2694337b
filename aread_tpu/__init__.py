"""aread_tpu — a TPU-native multi-domain CTR recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Chrissie-Law/AREAD-Multi-Domain-Recommendation (AAAI'25): the AREAD model
(HEI hierarchical expert integration + HEMP mask pruning), a zoo of 12
multi-domain/CTR baselines, multi-domain data pipelines (Amazon-25,
AliCCP-30, Cloud-Theme), counterfactual augmentation, domain-grouped
batching and per-domain weighted AUC evaluation.

Design principles (TPU-first, not a port):
  * every model is a pure function over a parameter pytree (flax.linen),
    jit-compiled once per static shape;
  * Python-loop-over-towers patterns in the reference become stacked-
    parameter einsums that tile onto the MXU;
  * the single shared embedding table (reference layer.py:150) becomes a
    row-shardable table with an all-gather/psum lookup over a device mesh;
  * HEMP's per-domain boolean masks are runtime arguments with static
    shapes, so mask evolution never triggers recompilation.
"""

__version__ = "0.1.0"

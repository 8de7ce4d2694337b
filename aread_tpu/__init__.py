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

# Free device arrays at process exit, unconditionally for every process
# that imports the package.  On this image's single-tenant tunneled TPU,
# HBM left resident by a dead session blocks the NEXT process's chip claim
# for minutes (measured ~6 min per ~1 GB leaked; <1 s when freed) — see
# utils/device_cleanup.py.  No-op cost on CPU platforms.
from aread_tpu.utils.device_cleanup import install as _install_device_cleanup

_install_device_cleanup()
del _install_device_cleanup

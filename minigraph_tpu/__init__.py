"""minigraph-tpu: a TPU-native sequence-to-graph mapping and pangenome
graph construction framework.

Built from scratch in JAX/XLA/Pallas (device compute path) + Python/C++
(host runtime) with the capabilities of lh3/minigraph v0.21-r606:

* minimizer sketching and indexing of GFA/rGFA sequence graphs
* seed-chain-align mapping of reads/assemblies (PAF/GAF output)
* base-level alignment (WFA / graph-WFA) with CIGAR and ds strings
* incremental pangenome graph augmentation (rGFA output)
* bubble structural-variant calling (--call BED) and coverage annotation

The host layer keeps byte-parity with the reference's text formats; hot
kernels run batched on TPU via Pallas, scaling data-parallel over
jax.sharding meshes.
"""

__version__ = "0.1.0"
MG_VERSION_COMPAT = "0.21-r606"  # behavior-parity target (minigraph.h:7)

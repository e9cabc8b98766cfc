"""lancet2_tpu — TPU-native microassembly somatic/germline variant caller.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of nygenome/Lancet2
(reference layout documented in SURVEY.md): windowed local re-assembly of
tumor/normal short reads into colored bidirected de Bruijn graphs, haplotype
path enumeration, read-to-haplotype re-alignment (batched glocal affine DP on
TPU), and Dirichlet-Multinomial genotyping with coverage-invariant ML features.

Layering mirrors the reference's 6-layer DAG (SURVEY.md §1):
    base -> hts -> cbdg -> caller -> core -> cli
plus TPU-specific layers:
    ops      - Pallas kernels + jit-batched device ops (the compute core)
    parallel - mesh/sharding utilities for multi-chip / multi-host scale-out
"""

__version__ = "0.1.0"

"""Device-mesh sharding for the window-batch compute step.

The reference's only parallelism is single-node data parallelism over
genomic windows (thread pool + MPMC queues; SURVEY.md §2). The TPU-native
equivalent: a 1-D 'windows' mesh axis over all chips — window batches are
sharded on their leading axis, each chip runs the full window step on its
shard (windows are embarrassingly parallel; no resharding needed), and only
scalar run statistics are aggregated with collectives over ICI.

Across hosts the window manifest is statically sharded (see
parallel.manifest); per-host readers feed per-host device batches and VCF
record streams merge host-side in genomic order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lancet2_tpu.ops.affine_dp import READ_TO_HAP
from lancet2_tpu.ops.window_step import make_window_step


def make_mesh(devices=None, axis: str = "windows") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_sharded_window_step(mesh: Mesh, num_samples: int, num_alleles: int,
                             band_margin: int | None = None):
    """jit the window step with the batch axis sharded over the mesh.

    Returns (fn, shard_inputs) where shard_inputs places a host batch onto
    the mesh. The step also psums a global windows-processed counter across
    the mesh so the collective path compiles and runs over ICI.
    """
    step = make_window_step(num_samples, num_alleles, band_margin=band_margin)
    axis = mesh.axis_names[0]
    batch_sharding = NamedSharding(mesh, P(axis))
    keys = ["reads", "read_lens", "read_sample", "read_valid",
            "haps", "hap_lens", "hap_allele"]
    if band_margin is not None:
        keys.append("read_offset")

    def wrapped(*args):
        out = step(*args)
        # scalar run-stat aggregation: total ALT depth over all shards.
        # jnp.sum over a sharded axis lowers to an XLA all-reduce over ICI.
        out["total_alt_depth"] = jnp.sum(out["allele_counts"][:, :, 1:])
        out["total_windows"] = jnp.asarray(args[0].shape[0], jnp.int32)
        return out

    fn = jax.jit(
        wrapped,
        in_shardings=(batch_sharding,) * len(keys),
        out_shardings=None,
    )

    def shard_inputs(batch: dict):
        return tuple(jax.device_put(batch[k], batch_sharding) for k in keys)

    return fn, shard_inputs

"""Multi-device compression: subdomains sharded over a TPU mesh.

TPU-native re-design of the reference's scale-out story (reference:
SURVEY.md §2.13): the reference runs MPI rank-per-GPU with an
MPI_Allreduce for the global norm (pmdr-x-qoi.cpp:891-935) and otherwise
fully independent per-rank compression. Here the same structure is one
shard_map over an ICI mesh: each device transforms+quantizes its subdomain
locally; the only cross-device communication is an O(1) psum/pmax for the
global norm — exactly the reference's Allreduce, riding ICI instead of MPI.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hierarchy import Hierarchy
from ..ops import quantize as Q
from ..ops.refactor import decompose


def make_subdomain_mesh(n_devices: Optional[int] = None, axis: str = "subdomain") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def quantizers_ingraph(l_target: int, D: int, total_dof, abs_tol, s, s_inf: bool,
                       decomposition_multidim: bool = True,
                       orthogonal: bool = False):
    """Per-level quantizer steps computed inside the XLA program.

    Mirrors Hierarchy.quantizers / reference CalcQuantizers
    (LinearQuantization.hpp:234-298) with tol/s/norm as traced scalars, so a
    sharded pipeline can derive steps from a psum'd global norm in-graph.
    """
    L = l_target
    levels = jnp.arange(L + 1, dtype=jnp.float64)
    abs_tol = abs_tol.astype(jnp.float64) * 2.0
    if s_inf:
        if decomposition_multidim:
            denom = (L + 1) * ((1 + 3.0**D) if orthogonal else 1.0)
        else:
            denom = (L + 1) * D * 4.0
        q = jnp.full((L + 1,), 1.0, jnp.float64) * (abs_tol / denom)
    else:
        q = abs_tol / (jnp.exp2(s.astype(jnp.float64) * levels) * math.sqrt(total_dof))
    return q


def compress_shards_device(
    vs,
    hier: Hierarchy,
    mesh: Mesh,
    tol,
    s: float,
    rel: bool,
    prep_huffman: bool = True,
    dict_size: int = 8192,
    outlier_cap: int = 4096,
    axis: str = "subdomain",
):
    """Device portion of sharded compression.

    vs: (S, *subdomain_shape) array, S divisible by mesh size. Each shard is
    decomposed+quantized independently; REL bounds use a global pmax/psum
    norm (the reference's MPI_Allreduce, on ICI). Returns per-subdomain
    quantized arrays + outlier info, still sharded.
    """
    s_inf = math.isinf(s)
    orthogonal = not s_inf
    n_sub = vs.shape[0]
    total_dof = n_sub * hier.total_num_elems

    def shard_fn(v_shard, tol_s, s_s):
        # local batch of subdomains on this device
        def one(v):
            return decompose(v, hier, orthogonal)

        dec = jax.vmap(one)(v_shard)
        if rel:
            if s_inf:
                local = jnp.max(jnp.abs(v_shard))
                norm = jax.lax.pmax(local, axis)
            else:
                local = jnp.sum(v_shard.astype(jnp.float64) ** 2)
                norm = jnp.sqrt(jax.lax.psum(local, axis) / total_dof)
            abs_tol = tol_s * norm.astype(jnp.float64)
        else:
            abs_tol = tol_s
        if not s_inf:
            # Per-subdomain L2 errors add in quadrature across the n_sub
            # independent subdomains, so each local bound must shrink by
            # sqrt(n_sub) for the global bound to hold (reference:
            # ErrorToleranceCalculator.hpp:127-147; matches
            # decomposer.calc_local_abs_tol).
            abs_tol = abs_tol / math.sqrt(n_sub)
        quant = quantizers_ingraph(
            hier.l_target, hier.D, hier.total_num_elems, abs_tol, s_s, s_inf,
            orthogonal=orthogonal,
        )

        def qz(d):
            return Q.quantize_with_scales(
                d, hier, quant, s_inf, prep_huffman, dict_size, outlier_cap
            )

        res = jax.vmap(qz)(dec)
        return res.quantized, res.outlier_count, res.outlier_idx, res.outlier_val

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    )
    return fn(
        vs,
        jnp.asarray(float(tol), jnp.float64),
        jnp.asarray(0.0 if s_inf else float(s), jnp.float64),
    )

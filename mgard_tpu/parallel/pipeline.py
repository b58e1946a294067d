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


def compress_shards_symbols(
    vs,
    hier: Hierarchy,
    mesh: Mesh,
    tol,
    s: float,
    rel: bool,
    normalize: bool = True,
    axis: str = "subdomain",
):
    """Sharded decompose + raw-symbol quantize (the BFX-class path).

    vs: (S, *sub_shape) sharded over `axis`. Returns (symbols (S, n) int32
    still sharded, global norm scalar). The only cross-device communication
    is the O(1) psum/pmax for the norm — the reference's MPI_Allreduce
    (pmdr-x-qoi.cpp:891-935) riding ICI.
    """
    s_inf = math.isinf(s)
    orthogonal = not s_inf
    n_sub = vs.shape[0]
    total_dof = n_sub * hier.total_num_elems

    def shard_fn(v_shard, tol_s, s_s):
        if rel:
            if s_inf:
                norm = jax.lax.pmax(jnp.max(jnp.abs(v_shard)), axis)
            else:
                sq = jax.lax.psum(jnp.sum(v_shard.astype(jnp.float64) ** 2), axis)
                norm = jnp.sqrt(sq / total_dof) if normalize else jnp.sqrt(sq)
            abs_tol = tol_s * norm.astype(jnp.float64)
        else:
            norm = jnp.asarray(0.0, jnp.float64)
            abs_tol = tol_s
        if not s_inf:
            # per-subdomain L2 errors add in quadrature (reference:
            # ErrorToleranceCalculator.hpp:127-147)
            abs_tol = abs_tol / math.sqrt(n_sub)
        quant = quantizers_ingraph(
            hier.l_target, hier.D, hier.total_num_elems, abs_tol, s_s, s_inf,
            orthogonal=orthogonal,
        )

        def one(v):
            dec = decompose(v, hier, orthogonal)
            return Q.quantize_symbols(dec, hier, quant.astype(v.dtype), s_inf)

        sym = jax.vmap(one)(v_shard)
        return sym, norm[None]

    from jax.experimental.shard_map import shard_map

    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(), P()),
            out_specs=(P(axis), P(axis)),
        )
    )
    sym, norms = fn(
        vs,
        jnp.asarray(float(tol), jnp.float64),
        jnp.asarray(0.0 if s_inf else float(s), jnp.float64),
    )
    return sym, float(norms[0])


def compress_sharded(
    arr,
    tol: float,
    s: float = math.inf,
    mode=None,
    config=None,
    mesh: Optional[Mesh] = None,
):
    """Full multi-device compression to a standard self-describing blob.

    The leading axis is block-split into one equal subdomain per mesh
    device (it must divide evenly); each device runs the complete
    decompose->quantize locally with a single psum/pmax for REL norms, and
    the entropy stage + serialization run per subdomain. The blob is
    byte-compatible with the single-device DomainDecomposer format, so
    mgard_tpu.decompress() reads it directly.
    """
    import struct

    import numpy as np

    from ..config import Config
    from ..dtypes import (
        compress_status_type,
        data_structure_type,
        domain_decomposition_type,
        dtype_enum,
        error_bound_type,
        lossless_type,
        norm_type,
    )
    from ..formats.metadata import Metadata
    from ..highlevel import _serialize_outliers
    from ..hierarchy import get_hierarchy
    from ..lossless import lossless_compress

    config = config or Config()
    if config.lossless not in (lossless_type.BFX, lossless_type.BFX_Zstd):
        # the sharded symbol path emits raw signed symbols; route
        # non-raw-symbol configs through the BFX backend
        import dataclasses

        config = dataclasses.replace(config, lossless=lossless_type.BFX)
    mode = mode if mode is not None else error_bound_type.ABS
    mesh = mesh or make_subdomain_mesh()
    n_dev = mesh.devices.size
    arr = np.asarray(arr) if not isinstance(arr, jax.Array) else arr
    shape = tuple(int(x) for x in arr.shape)
    if shape[0] % n_dev != 0:
        raise ValueError(
            f"leading dim {shape[0]} must divide over {n_dev} devices"
        )
    chunk = shape[0] // n_dev
    sub_shape = (chunk,) + shape[1:]
    hier = get_hierarchy(sub_shape, np.float32, None, config)
    vs = jnp.reshape(jnp.asarray(arr, jnp.float32), (n_dev,) + sub_shape)
    vs = jax.device_put(vs, NamedSharding(mesh, P(config.mesh_axis)))
    rel = mode == error_bound_type.REL
    sym, norm = compress_shards_symbols(
        vs, hier, mesh, tol, s, rel, config.normalize_coordinates,
        axis=config.mesh_axis,
    )
    sections = []
    for i in range(n_dev):
        sec = _serialize_outliers(0, np.zeros(0, np.int64), np.zeros(0, np.int64))
        sec += lossless_compress(sym[i].ravel(), config)
        sections.append(sec)
    payload = b"".join(struct.pack("<Q", len(sec)) + sec for sec in sections)
    s_inf = math.isinf(s)
    meta = Metadata(
        dtype=dtype_enum(np.dtype(np.float32)),
        shape=shape,
        dstype=data_structure_type.Cartesian_Grid_Uniform,
        coords=None,
        decomposition=config.decomposition,
        l_target=hier.l_target,
        reorder=config.reorder,
        domain_decomposed=True,
        ddtype=domain_decomposition_type.MaxDim,
        domain_decomposed_dim=0,
        domain_decomposed_size=chunk,
        ebtype=mode,
        norm=norm,
        tol=float(tol),
        ntype=norm_type.L_Inf if s_inf else norm_type.L_2,
        s=float(s),
        ltype=config.lossless,
        huff_dict_size=config.huff_dict_size,
        huff_block_size=config.huff_block_size,
        block_delta_block_size=config.block_delta_block_size,
    )
    return meta.serialize() + payload, compress_status_type.Success


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

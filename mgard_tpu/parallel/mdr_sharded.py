"""Sharded MDR: refactor / reconstruct over a device mesh.

TPU-native counterpart of the reference's distributed MDR entry point
(reference: src/mgard-x/Executables/pmdr-x-qoi.cpp:26-948 — MPI rank per
GPU, per-rank MDRefactor, MPI_Allreduce for the global value range at
:891-935). Here one shard_map runs the full refactor device pipeline
(decompose -> interleave -> bitplane encode with error collection) per
subdomain, and the global min/max ride a pmin/pmax collective over ICI —
the reference's only inter-rank data exchange.

The result is an ordinary mdr.api.DecomposedMDR, so MDRequestDecomposed /
MDReconstructDecomposed / the QoI planner work unchanged on sharded
output; MDReconstructSharded runs the reconstruction back over the mesh
when every subdomain uses the same retrieval plan.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..dtypes import bitplane_encoding_type, dtype_enum, np_dtype
from ..hierarchy import get_hierarchy
from ..mdr import bitplane
from ..mdr import api as _mdr_api
from ..mdr.api import (
    DecomposedMDR,
    LevelMetadata,
    RefactoredData,
    RefactoredMetadata,
    _reconstruct_device,
    decode_plane_blob,
)
from ..mdr.components import interleave_level, level_num_elems
from ..ops.refactor import decompose
from .pipeline import _plan_subdomains, make_subdomain_mesh


def MDRefactorSharded(
    data,
    config: Optional[Config] = None,
    mesh: Optional[Mesh] = None,
):
    """Refactor equal leading-dim subdomains over the mesh.

    Returns (DecomposedMDR, (global_min, global_max)). The min/max pair is
    the reference's MPI_Allreduce product (pmdr-x-qoi.cpp:891-935), used by
    QoI drivers for normalization."""
    import zlib

    config = config or Config()
    mesh = mesh or make_subdomain_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    arr = np.asarray(data)
    shape = tuple(int(s) for s in arr.shape)
    chunk, sizes = _plan_subdomains(shape, n_dev)
    if len(sizes) > n_dev:
        raise ValueError(
            f"leading dim {shape[0]} must divide over {n_dev} devices for "
            "sharded MDR (remainder subdomains: use MDRefactorDecomposed)"
        )
    sub_shape = (chunk,) + shape[1:]
    hier = get_hierarchy(sub_shape, arr.dtype, None, config)
    B = int(config.total_num_bitplanes)
    negabinary = config.mdr_encoding == bitplane_encoding_type.NegaBinary
    orthogonal = bool(config.mdr_orthogonal_basis)
    interleaver = {"direct": 0, "blocked": 1, "sfc": 2}[
        getattr(config, "mdr_interleaver", "direct")
    ]
    enc = (
        bitplane.encode_kernel_negabinary if negabinary else bitplane.encode_kernel
    )
    L = hier.l_target

    def shard_fn(v_block):
        v = v_block[0]
        gmin = jax.lax.pmin(jnp.min(v), axis)
        gmax = jax.lax.pmax(jnp.max(v), axis)
        dec = decompose(v, hier, orthogonal=orthogonal)
        outs = []
        for l in range(L + 1):
            stream = bitplane.pad_stream(interleave_level(dec, hier, l, interleaver))
            planes, exp, err_max, err_sq = enc(stream, B)
            outs.append((planes[None], exp[None], err_max[None], err_sq[None]))
        return tuple(outs), gmin[None], gmax[None]

    from jax import shard_map

    fn = jax.jit(
        shard_map(
            shard_fn, mesh=mesh, in_specs=(P(axis),),
            out_specs=(tuple((P(axis),) * 4 for _ in range(L + 1)),
                       P(axis), P(axis)),
        )
    )
    vs = jax.device_put(
        jnp.asarray(arr).reshape((n_dev,) + sub_shape),
        NamedSharding(mesh, P(axis)),
    )
    outs, gmins, gmaxs = fn(vs)

    # host phase: per-subdomain level compression + metadata (same as the
    # single-device MDRefactor host tail; every codec MDReconstruct's
    # decode_plane_blob reads must be writable here too — r3 ADVICE #3)
    lvl_codec = getattr(config, "mdr_level_compressor", "zlib")
    if lvl_codec == "bfx":
        from ..lossless import bfx as _bfx
    metas, datas, sls_list = [], [], []
    for d in range(n_dev):
        levels, blobs_all = [], []
        for l in range(L + 1):
            planes, exp, err_max, err_sq = outs[l]
            planes_h = np.asarray(planes[d])
            n = level_num_elems(hier, l)
            sizes_l, raws, blobs = [], [], []
            for p in range(planes_h.shape[0]):
                raw_bytes = planes_h[p].astype("<u4").tobytes()
                cand, cid = None, _mdr_api.PLANE_RAW
                if lvl_codec == "zlib":
                    cand, cid = zlib.compress(raw_bytes, 1), _mdr_api.PLANE_ZLIB
                elif (lvl_codec == "bfx"
                      and planes_h.shape[1] >= _mdr_api.PLANE_BFX_MIN_WORDS):
                    cand = _bfx.encode(planes_h[p].view(np.int32))
                    cid = _mdr_api.PLANE_BFX
                best, codec = _mdr_api.choose_plane_blob(raw_bytes, cand, cid)
                blobs.append(best)
                sizes_l.append(len(best))
                raws.append(codec)
            em, es = bitplane.scale_tables(
                err_max[d], err_sq[d], int(exp[d]), B, negabinary
            )
            levels.append(
                LevelMetadata(int(exp[d]), n, sizes_l, raws, em, es)
            )
            blobs_all.append(blobs)
        metas.append(
            RefactoredMetadata(
                dtype=dtype_enum(arr.dtype),
                shape=sub_shape,
                l_target=hier.l_target,
                number_bitplanes=B,
                total_num_elems=hier.total_num_elems,
                levels=levels,
                encoding=config.mdr_encoding,
                orthogonal=orthogonal,
                interleaver=interleaver,
            )
        )
        datas.append(RefactoredData(planes=blobs_all))
        sl = [slice(0, s) for s in shape]
        sl[0] = slice(d * chunk, (d + 1) * chunk)
        sls_list.append(tuple(sl))
    dmdr = DecomposedMDR(
        shape=shape, subdomain_slices=sls_list, metas=metas, datas=datas
    )
    return dmdr, (float(gmins[0]), float(gmaxs[0]))


def MDReconstructSharded(
    dmdr: DecomposedMDR,
    counts: Sequence[int],
    config: Optional[Config] = None,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """Reconstruct all subdomains over the mesh with one shared retrieval
    plan (per-level plane counts identical across subdomains — the common
    case for homogeneous data; heterogeneous plans fall back to
    MDReconstructDecomposed)."""
    import zlib

    config = config or Config()
    mesh = mesh or make_subdomain_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    S = len(dmdr.metas)
    if S != n_dev:
        raise ValueError(f"{S} subdomains vs {n_dev} mesh devices")
    meta0 = dmdr.metas[0]
    dtype = np_dtype(meta0.dtype)
    hier = get_hierarchy(meta0.shape, dtype, meta0.coords, config)
    B = meta0.number_bitplanes
    sr = meta0.sign_rows
    counts = list(counts)

    # decode plane bytes -> stacked (S, rows, m) arrays per level
    planes_list, exps = [], np.zeros((S, len(meta0.levels)), np.int32)
    for l, lm in enumerate(meta0.levels):
        b = counts[l]
        m = bitplane.padded_words(lm.n)
        nrows = (sr + b) if b > 0 else 0
        stack = np.zeros((S, nrows, m), np.uint32)
        for d in range(S):
            lvl_meta = dmdr.metas[d].levels[l]
            exps[d, l] = lvl_meta.exp
            for p in range(nrows):
                stack[d, p] = decode_plane_blob(
                    dmdr.datas[d].planes[l][p], int(lvl_meta.plane_raw[p]), m
                )
        planes_list.append(stack)

    negabinary = sr == 0
    rec_fn = _reconstruct_device(
        hier, B, tuple(counts), negabinary, bool(meta0.orthogonal), dtype,
        int(getattr(meta0, "interleaver", 0)),
    )

    def shard_fn(*args):
        exps_b = args[-1]
        planes = [a[0] for a in args[:-1]]
        return rec_fn(tuple(planes), exps_b[0])[None]

    from jax import shard_map

    fn = jax.jit(
        shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis),) * (len(planes_list) + 1),
            out_specs=P(axis),
        )
    )
    args = [
        jax.device_put(jnp.asarray(p), NamedSharding(mesh, P(axis)))
        for p in planes_list
    ] + [jax.device_put(jnp.asarray(exps), NamedSharding(mesh, P(axis)))]
    rec = np.asarray(fn(*args))
    out = np.empty(dmdr.shape, dtype)
    for d, sl in enumerate(dmdr.subdomain_slices):
        out[sl] = rec[d]
    return out


# ----------------------------------------------------------------------
# Sharded file I/O (reference: pmdr-x-qoi-io,
# src/mgard-x/Executables/pmdr-x-qoi-io.cpp — per-rank refactored-level
# files written in parallel and retrieved byte-ranged per rank)
# ----------------------------------------------------------------------
def write_mdr_sharded(path_prefix: str, dmdr: DecomposedMDR,
                      s: float = float("inf")) -> List[str]:
    """Write one self-describing .mdr file per shard (the reference's
    per-rank file layout) plus a tiny manifest binding them to the global
    shape. Returns the written paths."""
    import json
    import os

    from ..mdr.api import write_mdr

    paths = []
    for d, (meta, data) in enumerate(zip(dmdr.metas, dmdr.datas)):
        p = f"{path_prefix}.rank{d}.mdr"
        write_mdr(p, meta, data, s=s)
        paths.append(p)
    manifest = {
        "shape": list(dmdr.shape),
        "n_shards": len(dmdr.metas),
        "slices": [
            [[sl.start, sl.stop] for sl in sls]
            for sls in dmdr.subdomain_slices
        ],
    }
    with open(f"{path_prefix}.manifest.json", "w") as f:
        json.dump(manifest, f)
    return paths + [f"{path_prefix}.manifest.json"]


def read_mdr_sharded(path_prefix: str, counts: Sequence[int]) -> DecomposedMDR:
    """Byte-ranged retrieval of only the planes `counts` needs from every
    shard file (the reference retriever's partial reads, per rank)."""
    import json

    from ..mdr.api import read_mdr_metadata, read_mdr_planes

    with open(f"{path_prefix}.manifest.json") as f:
        man = json.load(f)
    metas, datas, sls = [], [], []
    for d in range(int(man["n_shards"])):
        p = f"{path_prefix}.rank{d}.mdr"
        meta, hdr = read_mdr_metadata(p)
        data = read_mdr_planes(p, meta, list(counts), hdr)
        metas.append(meta)
        datas.append(data)
        sls.append(tuple(slice(a, b) for a, b in man["slices"][d]))
    return DecomposedMDR(
        shape=tuple(man["shape"]), subdomain_slices=sls, metas=metas,
        datas=datas,
    )

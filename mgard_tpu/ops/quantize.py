"""Error-bound-driven levelwise linear quantization.

TPU-native re-design of the reference LevelwiseLinearQuantizerNDFunctor
(reference: include/mgard-x/Quantization/LinearQuantization.hpp:21-146):
one fused elementwise pass over the nested-box decomposed array that
  * looks up each node's level (max over dims of the per-axis level marks),
  * multiplies by the reciprocal per-level step (x sqrt(volume) when s!=inf),
  * rounds half-away-from-zero to an int32 symbol,
  * folds in the Huffman dictionary shift, and
  * captures outliers (|q| outside the dictionary) into a fixed-capacity
    side list (indices + int64 values), replacing them with the zero symbol.

The reference appends outliers with device-wide atomics; on TPU we use a
deterministic masked prefix-capture (jnp.nonzero with static size), which is
reproducible run-to-run (the reference's atomic order is not).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..dtypes import OUTLIER_DTYPE, QUANTIZED_DTYPE
from ..hierarchy import Hierarchy


class QuantizedResult(NamedTuple):
    quantized: jnp.ndarray  # int32, shape of input, nested-box layout
    outlier_count: jnp.ndarray  # int32 scalar (true count; may exceed capacity)
    outlier_idx: jnp.ndarray  # int64 (capacity,) flat C-order indices
    outlier_val: jnp.ndarray  # int64 (capacity,) unshifted quantized values


def node_levels(hier: Hierarchy):
    """Per-node level in the nested-box layout: max over dims of the per-axis
    level marks (reference: LinearQuantization.hpp:78-82)."""
    lvl = None
    for d in range(hier.D):
        shape = [1] * hier.D
        shape[d] = hier.shape[d]
        marks = jnp.asarray(hier.level_marks[d]).reshape(shape)
        lvl = marks if lvl is None else jnp.maximum(lvl, marks)
    return jnp.broadcast_to(lvl, hier.shape)


def _level_scales(hier: Hierarchy, quantizers: np.ndarray, s: float, reciprocal: bool):
    """Per-level multiplicative factors.

    quantize factor = sqrt(level volume)/q_l (volume only when s != inf);
    dequantize factor is the reciprocal (reference: LinearQuantization.hpp
    quantize `t * quantizer * volume` with reciprocal quantizers /
    dequantize `(quantizer * volume) * q` with reciprocal volumes).
    """
    q = np.asarray(quantizers, dtype=np.float64)
    if np.isinf(s):
        scale = 1.0 / q if reciprocal else q
    else:
        vol = hier.vol_sqrt
        scale = vol / q if reciprocal else q / vol
    return scale.astype(hier.dtype)


def quantize(
    dec,
    hier: Hierarchy,
    quantizers: np.ndarray,
    s: float,
    prep_huffman: bool,
    dict_size: int,
    outlier_capacity: int,
) -> QuantizedResult:
    """Quantize a decomposed (nested-box) array."""
    levels = node_levels(hier)
    scales = jnp.asarray(_level_scales(hier, quantizers, s, reciprocal=True))
    scale = scales[levels]
    t = dec * scale
    # round half away from zero, exactly as the reference:
    # copysign(0.5 + |t|, t) truncated (LinearQuantization.hpp:99-104)
    q = jnp.trunc(jnp.copysign(jnp.asarray(0.5, dec.dtype) + jnp.abs(t), t))

    shift = dict_size // 2 if prep_huffman else 0
    if prep_huffman:
        qs = q + shift
        in_range = (qs >= 0) & (qs < dict_size)
    else:
        # Signed backends: int32 range guard only.
        qs = q
        in_range = jnp.abs(q) < 2**31 - 1

    flat_q = jnp.where(in_range, qs, float(shift)).ravel().astype(QUANTIZED_DTYPE)
    mask = ~in_range.ravel()
    count = mask.sum(dtype=jnp.int32)
    (idx,) = jnp.nonzero(mask, size=outlier_capacity, fill_value=hier.total_num_elems)
    val = jnp.where(
        idx < hier.total_num_elems,
        q.ravel().astype(OUTLIER_DTYPE)[jnp.minimum(idx, hier.total_num_elems - 1)],
        0,
    )
    return QuantizedResult(
        quantized=flat_q.reshape(hier.shape),
        outlier_count=count,
        outlier_idx=idx.astype(OUTLIER_DTYPE),
        outlier_val=val,
    )


def dequantize(
    quantized,
    hier: Hierarchy,
    quantizers: np.ndarray,
    s: float,
    prep_huffman: bool,
    dict_size: int,
    outlier_idx=None,
    outlier_val=None,
):
    """Inverse of quantize: restore outliers, unshift, scale back."""
    shift = dict_size // 2 if prep_huffman else 0
    qflat = quantized.ravel().astype(jnp.float64 if hier.dtype == np.float64 else jnp.float32)
    qflat = qflat - shift
    if outlier_idx is not None:
        safe_idx = jnp.minimum(outlier_idx, hier.total_num_elems)  # cap fill entries
        qflat = qflat.at[safe_idx].set(
            outlier_val.astype(qflat.dtype), mode="drop", indices_are_sorted=True
        )
    levels = node_levels(hier)
    scales = jnp.asarray(_level_scales(hier, quantizers, s, reciprocal=False))
    scale = scales[levels]
    return qflat.reshape(hier.shape) * scale

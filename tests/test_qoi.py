"""QoI preservation tests (compression-side linear QoI + MDR V_TOT)."""

import math

import numpy as np

import mgard_tpu
from mgard_tpu import decompress, mdr
from mgard_tpu.config import Config
from mgard_tpu.mdr.qoi import MDReconstructQoI, VTotQoI
from mgard_tpu.qoi import TensorQuantityOfInterest, compress_qoi


def smooth(shape, seed=0):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 1, n) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    v = np.zeros(shape)
    for _ in range(3):
        ks = rng.integers(1, 4, len(shape))
        acc = rng.uniform(0, 2 * np.pi)
        for k, g in zip(ks, grids):
            acc = acc + 2 * np.pi * k * g
        v += rng.uniform(0.3, 1.0) * np.sin(acc)
    return v


def test_linear_qoi_average_preserved():
    """The domain average (reference: examples/qoi/average.cpp) must be
    preserved to the requested QoI tolerance."""
    v = smooth((65, 65))
    w = np.full(v.shape, 1.0 / v.size)  # average functional
    qoi = TensorQuantityOfInterest(w)
    tol = 1e-5
    for s in [math.inf, 0.0]:
        blob, st, data_tol = compress_qoi(v, qoi, tol, s=s)
        out, _ = decompress(blob)
        dq = abs(qoi(v) - qoi(out))
        assert dq <= tol, f"s={s}: QoI err {dq} > {tol}"


def test_qoi_norms():
    w = np.array([1.0, -2.0, 3.0])
    q = TensorQuantityOfInterest(w)
    assert np.isclose(q.norm(math.inf), 6.0)
    assert np.isclose(q.norm(0.0), math.sqrt(3) * math.sqrt(14))


def test_mdr_vtot_qoi():
    shape = (33, 33)
    cfg = Config()
    cfg.total_num_bitplanes = 12
    vars_true = [smooth(shape, seed=i) + 1.5 for i in range(3)]
    metas, datas = [], []
    for v in vars_true:
        m, d = mdr.MDRefactor(v, cfg)
        metas.append(m)
        datas.append(d)
    qoi = VTotQoI()
    vtot_true = qoi.eval(vars_true)
    tol = 1e-2
    vars_rec, vtot_rec, bound, counts = MDReconstructQoI(metas, datas, tol, qoi)
    assert bound <= tol
    actual = np.max(np.abs(vtot_true - vtot_rec))
    assert actual <= tol, f"QoI actual err {actual} > {tol}"
    # joint planning retrieves fewer planes for some variables than full
    assert any(c < 12 for counts_v in counts for c in counts_v)

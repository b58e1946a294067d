"""mgard-tpu as a compression operator inside a parallel I/O pipeline.

Runnable counterpart of the reference's ADIOS2 integration
(reference: examples/ADIOS2/adios2-test-external-compressor.cpp — MPI
ranks write timestep variables through ADIOS2 with MGARD as the external
compression operator, then read them back and verify). ADIOS2 itself is
not in this environment, so the same pattern is shown against a minimal
self-describing container: each (variable, step, shard) chunk is an
independent mgard-tpu blob behind a JSON index, shards are produced by
the sharded (mesh) compressor, and reads are byte-ranged per chunk —
the three properties the ADIOS2 operator relies on (self-describing
chunks, rank-independent encode, range reads).

Run: PYTHONPATH=. python examples/io_operator.py
"""

import json
import math
import os
import struct
import tempfile

import jax
import numpy as np

import mgard_tpu
from mgard_tpu.parallel import compress_sharded, make_subdomain_mesh


class CompressedContainer:
    """A .bpz-style container: header index + concatenated chunk blobs."""

    def __init__(self, path):
        self.path = path
        self.index = {}
        self.chunks = []

    def put(self, var: str, step: int, data, tol: float, mesh=None):
        if mesh is not None and data.shape[0] % mesh.devices.size == 0:
            blob, st = compress_sharded(data, tol=tol, s=math.inf, mesh=mesh)
        else:
            blob, st = mgard_tpu.compress(data, tol=tol, s=math.inf)
        assert int(st) == 0
        self.index[f"{var}/{step}"] = (
            sum(len(c) for c in self.chunks), len(blob)
        )
        self.chunks.append(blob)
        return len(blob)

    def close(self):
        idx = json.dumps(self.index).encode()
        with open(self.path, "wb") as f:
            f.write(struct.pack("<Q", len(idx)))
            f.write(idx)
            for c in self.chunks:
                f.write(c)

    @staticmethod
    def get(path, var: str, step: int):
        with open(path, "rb") as f:
            (n,) = struct.unpack("<Q", f.read(8))
            index = json.loads(f.read(n))
            off, size = index[f"{var}/{step}"]
            f.seek(8 + n + off)          # byte-ranged read of ONE chunk
            blob = f.read(size)
        out, st = mgard_tpu.decompress(blob)
        assert int(st) == 0
        return out


def main():
    mesh = make_subdomain_mesh(min(len(jax.devices()), 8))
    rng = np.random.default_rng(0)
    steps, shape = 3, (mesh.devices.size * 6, 17, 9)
    fields = {
        "temperature": [
            np.cumsum(rng.standard_normal(shape), axis=0).astype(np.float32)
            for _ in range(steps)
        ],
        "density": [
            rng.standard_normal(shape).astype(np.float32) for _ in range(steps)
        ],
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sim.bpz")
        box = CompressedContainer(path)
        total_raw = total_c = 0
        for var, series in fields.items():
            for t, data in enumerate(series):
                c = box.put(var, t, data, tol=1e-2, mesh=mesh)
                total_raw += data.nbytes
                total_c += c
        box.close()
        print(f"wrote {path}: {total_raw} -> {total_c + os.path.getsize(path) - total_c} "
              f"bytes (ratio {total_raw/os.path.getsize(path):.1f})")
        for var, series in fields.items():
            for t, data in enumerate(series):
                out = CompressedContainer.get(path, var, t)
                err = np.max(np.abs(out - data))
                assert err <= 1e-2, (var, t, err)
        print("all variables/steps read back under bound OK")


if __name__ == "__main__":
    main()

"""Minimal repro of the full-suite segfault (r3 VERDICT weak #1).

Mechanism: every compiled XLA:CPU executable is JIT-loaded into the
process and its code/data pages stay mmapped while the jit cache holds it.
A long pytest session compiles thousands of programs (observed growth:
~3,000 new /proc/self/maps entries per minute mid-suite), so the process
eventually exceeds the kernel's vm.max_map_count limit (default 65530).
The next mmap — an executable load or a persistent-compile-cache
deserialize — fails inside jaxlib and the process segfaults. The crash
point moves with test order because it fires on whichever compile crosses
the limit, which is why every crashing test passes in isolation.

Fix: jax.clear_caches() releases the mappings (demonstrated below);
tests/conftest.py drops compiled state between test modules, which keeps
the map count bounded for the whole suite.

Run:  env JAX_PLATFORMS=cpu python scripts/repro_mapleak.py
"""

import gc
import os


def nmaps() -> int:
    with open(f"/proc/{os.getpid()}/maps") as f:
        return sum(1 for _ in f)


def main():
    import jax
    import jax.numpy as jnp

    print(f"start:                {nmaps():6d} maps")
    fns = []
    for i in range(200):
        f = jax.jit(lambda x, i=i: jnp.sin(x) * i + jnp.cos(x) ** (i % 3 + 1))
        f(jnp.ones((128, 128))).block_until_ready()
        fns.append(f)
    grown = nmaps()
    print(f"after 200 compiles:   {grown:6d} maps  (limit: "
          f"{open('/proc/sys/vm/max_map_count').read().strip()})")
    del fns
    jax.clear_caches()
    gc.collect()
    cleared = nmaps()
    print(f"after clear_caches(): {cleared:6d} maps")
    assert cleared < grown - 100, "clear_caches no longer releases mappings"
    print("ok: clear_caches releases the executable mappings")


if __name__ == "__main__":
    main()

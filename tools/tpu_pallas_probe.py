#!/usr/bin/env python
"""Probe: is Mosaic/Pallas lowering available on the tunnel TPU backend?

Hot-stage Pallas kernels (ARCHITECTURE.md §5 performance model) only
matter once ingest stops binding; this probe settles whether the
development tunnel backend can compile+run a Pallas kernel AT ALL, so
the kernel work can be planned (or ruled out) without poisoning a work
process.  Protocol per CLAUDE.md: ONE probe per process, output
consumed (block_until_ready does not surface errors).

Prints one JSON line: {"pallas": "ok"|"failed", ...}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        dev = str(jax.devices()[0])

        def kernel(x_ref, y_ref, o_ref):
            # One VPU-shaped tile op: enough to force a Mosaic lowering.
            o_ref[...] = x_ref[...] * 2.0 + y_ref[...]

        @jax.jit
        def f(x, y):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x, y)

        x = jnp.asarray(np.arange(8 * 128, dtype=np.float32).reshape(8, 128))
        y = jnp.ones((8, 128), dtype=jnp.float32)
        out = np.asarray(f(x, y))  # consume: surfaces deferred errors
        ok = bool(np.allclose(out, np.asarray(x) * 2.0 + 1.0))
        print(
            json.dumps(
                {
                    "pallas": "ok" if ok else "wrong-result",
                    "device": dev,
                    "max_abs_err": float(
                        np.abs(out - (np.asarray(x) * 2.0 + 1.0)).max()
                    ),
                    "elapsed_s": round(time.time() - t0, 1),
                }
            )
        )
        return 0 if ok else 1
    except Exception as e:  # noqa: BLE001 — the verdict IS the output
        print(
            json.dumps(
                {
                    "pallas": "failed",
                    "error": f"{type(e).__name__}: {str(e)[:400]}",
                    "elapsed_s": round(time.time() - t0, 1),
                }
            )
        )
        return 1


if __name__ == "__main__":
    sys.exit(main())

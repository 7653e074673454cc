"""Worker process for the REAL 2-process jax.distributed test.

Each process owns 4 virtual CPU devices; the coordinator glues them into
one 8-device process group (the exact bring-up a 2-host DCN pod uses —
SURVEY §2.8 communication-backend row, BASELINE.md 2+ hosts line).  The
('ch', 'fft') pod mesh then spans the process boundary and a
FourStepPlan runs with its all_to_all corner turns crossing it; the
result is value-checked against the host golden oracle on every process.

Usage (spawned by tests/test_multihost.py::test_two_process_distributed):
    python distributed_worker.py <coordinator> <num_procs> <proc_id> <out>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(coordinator: str, num_processes: int, process_id: int,
         out_path: str) -> None:
    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from intfftk_tpu.config import FFTConfig
    from intfftk_tpu.golden.four_step import four_step_int
    from intfftk_tpu.parallel import FourStepPlan
    from intfftk_tpu.parallel.mesh import CHANNEL_AXIS, FFT_AXIS
    from intfftk_tpu.parallel.multihost import (initialize_multihost,
                                                pod_mesh)

    initialize_multihost(coordinator=coordinator,
                         num_processes=num_processes,
                         process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4 * num_processes

    # ch (no traffic) across the process/DCN boundary, fft (all_to_all)
    # within each process's devices — pod_mesh's documented layout
    mesh = pod_mesh()
    assert dict(mesh.shape)[CHANNEL_AXIS] == num_processes

    cfg = FFTConfig(n=1024, mode="scaled", rounding="round", data_width=12)
    plan = FourStepPlan(cfg, 32, 32, mesh, axis=FFT_AXIS,
                        batch_axis=CHANNEL_AXIS)

    rng = np.random.default_rng(7)   # same stimulus on every process
    batch = 2 * num_processes
    xr = rng.integers(-1024, 1024, (batch, cfg.n)).astype(np.int32)
    xi = rng.integers(-1024, 1024, (batch, cfg.n)).astype(np.int32)

    # globally replicated device arrays: each process contributes every
    # shard it addresses (the plan's jit then re-shards along the specs)
    rep = NamedSharding(mesh, P())
    mk = lambda h: jax.make_array_from_callback(h.shape, rep,
                                                lambda idx: h[idx])
    yr, yi = plan(mk(xr), mk(xi))
    yr = multihost_utils.process_allgather(yr, tiled=True)
    yi = multihost_utils.process_allgather(yi, tiled=True)

    gr, gi = four_step_int(xr, xi, cfg, 32, 32)
    ok = (np.array_equal(gr, np.asarray(yr, np.int64))
          and np.array_equal(gi, np.asarray(yi, np.int64)))
    with open(out_path, "w") as f:
        f.write("OK" if ok else "MISMATCH")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

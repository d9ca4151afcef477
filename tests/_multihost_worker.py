"""One process of the 2-process CPU-cluster pod validation.

Run by tests/test_multihost.py with RANK/WORLD_SIZE/JAX_COORDINATOR_ADDRESS
in the environment (the same launcher env vars parallel/distributed.py
parses in production — reference distributed_utils.py:16-77 launchers).
Each process carries 2 virtual CPU devices, so the global mesh spans 4
devices across 2 processes and every collective below rides the
cross-process (DCN-analogue) path for real.

Writes a JSON result blob to the path in PCRL_MULTIHOST_OUT.
"""

import json
import os
import sys

# this machine's sitecustomize imports jax at interpreter startup (forcing
# the tunneled-TPU platform), so env vars are too late — switch the lazily
# initialized backend through jax.config, exactly like tests/conftest.py
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import numpy as np

    from pointcloud_rl_tpu.parallel.distributed import (
        DistVar, allreduce_stats, init_distributed, is_lead_process)

    rank = int(os.environ["RANK"])
    joined = init_distributed()  # from env, as run_rl does
    assert joined, "init_distributed must join with WORLD_SIZE=2 in env"
    assert jax.process_count() == 2 and jax.process_index() == rank
    assert jax.device_count() == 4 and len(jax.local_devices()) == 2
    assert is_lead_process() == (rank == 0)

    # host-stats plane: cross-process allgather reductions
    stats = allreduce_stats({"r": float(rank), "n": 1.0}, op="sum")
    assert stats == {"n": 2.0, "r": 1.0}, stats
    assert allreduce_stats({"r": float(rank)}, op="max")["r"] == 1.0

    # control plane: one-sided counters over the coordination service
    # (the DD-PPO vote path; only rank 0 votes, rank 1 polls)
    var = DistVar("pod_test")
    if rank == 0:
        var.add(3)
    import time

    deadline = time.monotonic() + 30
    while var.get() < 3:
        assert time.monotonic() < deadline, "DistVar increment never observed"
        time.sleep(0.05)

    # gradient plane: a psum over the GLOBAL 4-device mesh (2 per process)
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
    local = np.arange(2, dtype=np.float32) + 10 * rank + 1  # proc0: [1,2] proc1: [11,12]
    garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))

    from jax.experimental.shard_map import shard_map

    summed = jax.jit(
        shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                  in_specs=P("data"), out_specs=P())
    )(garr)
    total = float(np.asarray(jax.device_get(summed.addressable_data(0))).reshape(-1)[0])
    assert total == 1 + 2 + 11 + 12, total

    with open(os.environ["PCRL_MULTIHOST_OUT"], "w") as f:
        json.dump({"rank": rank, "ok": True, "psum": total}, f)


if __name__ == "__main__":
    main()

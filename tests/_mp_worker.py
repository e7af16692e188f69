"""Two-process ``jax.distributed`` worker (tests/test_multiprocess.py).

Each process exposes 2 XLA CPU devices; together they form the 4-device
global dp×tp mesh. This is the cross-process path the reference bootstraps
with MPI rank/host/port exchange + DDP process groups
(/root/reference/Backend/diff2lip/guided_diffusion/dist_util.py:20-42,
train_greek.sh:24 gloo) — here it is ``jax.distributed.initialize`` wired
through the documented ``EST_MESH__*`` envs (core/config.MeshConfig →
parallel/mesh.maybe_initialize_distributed), with XLA inserting the gradient
psum across processes.

Usage: python tests/_mp_worker.py <coordinator_port> <process_id>
Prints one JSON line with the post-step loss and topology facts.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    port, rank = int(sys.argv[1]), int(sys.argv[2])
    os.environ["EST_MESH__COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["EST_MESH__NUM_PROCESSES"] = "2"
    os.environ["EST_MESH__PROCESS_ID"] = str(rank)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from expressive_speech_translation_tpu.core.config import load_config
    from expressive_speech_translation_tpu.parallel.mesh import (
        maybe_initialize_distributed,
    )

    cfg = load_config()
    maybe_initialize_distributed(cfg.mesh)  # must precede first device use

    import jax.numpy as jnp
    import numpy as np

    from expressive_speech_translation_tpu.parallel.mesh import (
        DP_AXIS, MeshSpec, make_mesh,
    )
    from tests._mp_common import TINY_LM, make_batch, make_optimizer

    from expressive_speech_translation_tpu.train.sft import (
        SFTBatch, init_train_state, make_train_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 4

    mesh = make_mesh(MeshSpec(dp=2, tp=2))
    optimizer = make_optimizer()
    state = init_train_state(jax.random.PRNGKey(0), TINY_LM, optimizer)
    batch_host = make_batch()

    def put(x, spec):
        sharding = NamedSharding(mesh, spec)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    repl = P()
    state = jax.tree_util.tree_map(lambda x: put(x, repl), state)
    batch = SFTBatch(*(put(x, P(None, DP_AXIS)) for x in batch_host))

    step = make_train_step(TINY_LM, optimizer, mesh, accum_grad=2,
                           compute_dtype=jnp.float32)
    state, metrics = step(state, batch)
    loss = float(jax.device_get(metrics["loss"]))
    print(json.dumps({
        "rank": rank,
        "loss": loss,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "mesh_shape": dict(mesh.shape),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

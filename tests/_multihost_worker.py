"""Worker for tests/test_multihost.py: one process of a 2-process CPU
jax.distributed run of the smoke training loop.

Invoked as:  python _multihost_worker.py <coordinator> <nproc> <pid> \
                 <work_dir> <out_json>
Writes {final train loss, eval aggregates, process_index} to out_json.
"""
import dataclasses
import json
import os
import sys


def main():
    coordinator, nproc, pid, work_dir, out_json = sys.argv[1:6]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(nproc),
                               process_id=int(pid))
    assert jax.process_count() == int(nproc)
    if int(nproc) > 1:
        # align processes after the (slow, possibly skewed) interpreter
        # start-up: the coordination-service barrier takes a long timeout,
        # unlike gloo's fixed 30 s store handshake at the first collective
        from jax._src import distributed
        distributed.global_state.client.wait_at_barrier(
            "gedepth_boot", 600_000)
        # establish the gloo full mesh NOW, while the processes are
        # barrier-aligned: gloo's context init (fixed 30 s store
        # handshake) fires at the FIRST cross-process collective, which
        # without this warmup happens only after each process's
        # independent train-step compile — whose duration skew on a
        # loaded 1-core box chronically exceeded 30 s (r5). A scalar
        # allgather compiles in ~1 s symmetrically, so both processes
        # enter the handshake together; the 2-process clique context is
        # cached and reused by every later collective.
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        multihost_utils.process_allgather(jnp.zeros((1,), jnp.float32))

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.loop import train

    cfg = get_config("smoke_synthetic")
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, max_iters=4, global_batch=4,
                                  eval_interval=4, checkpoint_interval=4,
                                  log_interval=1))
    state, best = train(cfg, work_dir=work_dir)

    with open(out_json, "w") as f:
        json.dump({"process_index": jax.process_index(),
                   "best": {k: float(v) for k, v in best.items()
                            if isinstance(v, (int, float))},
                   "step": int(state.step)}, f)


if __name__ == "__main__":
    main()

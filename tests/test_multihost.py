"""True 2-process multi-host wiring test (VERDICT r3 #2).

Launches two OS processes joined through jax.distributed on the CPU
backend (1 local device each -> 2 global devices) running the full
training loop on the smoke config: process-sharded TrainLoader rows
assembled into global batches, process-sharded eval with per-image metric
allgather, rank-0-guarded file outputs. Asserts both processes agree on
the eval aggregates, that they match a single-process run of the same
recipe, and that only process 0 wrote log/best files.

Mirrors the reference's DistributedSampler + multi_gpu_test +
collect_results_cpu contract (depth/datasets/builder.py:123-125,
depth/apis/test.py:148-232).
"""
import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_and_eval(tmp_path):
    here = osp.dirname(osp.abspath(__file__))
    worker = osp.join(here, "_multihost_worker.py")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    # one local device per process (2 global); drop the 8-device conftest
    # flag the parent exported
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_NUM_CPU_DEVICES", None)

    # Single-process reference run FIRST (2 virtual devices -> the same
    # global GSPMD program): it warms the persistent compilation cache so
    # the two real processes reach their first collective within gloo's
    # 30 s store timeout even on a loaded single-core box.
    out_single = str(tmp_path / "out_single.json")
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    p = subprocess.Popen(
        [sys.executable, worker, f"127.0.0.1:{_free_port()}", "1", "0",
         str(tmp_path / "work_single"), out_single],
        env=env1, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    log = p.communicate(timeout=1800)[0].decode()
    assert p.returncode == 0, log[-4000:]
    single = json.load(open(out_single))

    # ONE shared work_dir for both processes, as on a real multi-host
    # shared filesystem: orbax checkpoint saves are collective and the
    # non-primary process waits for the primary's directory — giving each
    # process a private dir deadlocks rank 1 (observed: orbax
    # array_metadata_store timeout)
    #
    # gloo's fixed 30 s store handshake can time out from interpreter
    # start-up skew on a loaded single-core box. That race is transient,
    # so RETRY the pair (fresh port + work_dir each attempt, VERDICT r4
    # item 8); the xfail hatch only fires when the SPECIFIC gloo handshake
    # message persists across every attempt — a wiring regression fails
    # hard on the first attempt instead of hiding behind the hatch.
    GLOO_RACE_MSG = "Gloo context initialization failed"
    ATTEMPTS = 3
    for attempt in range(ATTEMPTS):
        work_dir = str(tmp_path / f"work_a{attempt}")
        coordinator = f"127.0.0.1:{_free_port()}"
        procs = []
        outs = []
        for pid in range(2):
            out_json = str(tmp_path / f"out_a{attempt}_{pid}.json")
            outs.append(out_json)
            procs.append(subprocess.Popen(
                [sys.executable, worker, coordinator, "2", str(pid),
                 work_dir, out_json],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        logs = []
        try:
            for p in procs:
                logs.append(p.communicate(timeout=1800)[0].decode())
        finally:
            for p in procs:  # never leave orphaned workers on timeout
                if p.poll() is None:
                    p.kill()
        if all(p.returncode == 0 for p in procs):
            break
        joined = "\n".join(logs)
        assert GLOO_RACE_MSG in joined, \
            "worker failed for a non-gloo reason:\n" + joined[-4000:]
        if attempt == ATTEMPTS - 1:
            pytest.xfail(f"gloo 30s handshake skew persisted across "
                         f"{ATTEMPTS} attempts on this box")
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    res = [json.load(open(o)) for o in outs]
    res.sort(key=lambda r: r["process_index"])
    assert [r["process_index"] for r in res] == [0, 1]
    assert all(r["step"] == 4 for r in res)

    # allgathered eval metrics must be identical across processes
    for k in res[0]["best"]:
        np.testing.assert_allclose(res[0]["best"][k], res[1]["best"][k],
                                   rtol=0, atol=0, err_msg=k)

    # rank-0 guard: exactly ONE process wrote the JSONL (a duplicate
    # writer would append each iter record twice) and the best npz exists
    assert osp.exists(osp.join(work_dir, "best_abs_rel.npz"))
    records = [json.loads(line) for line in
               open(osp.join(work_dir, "train.log.jsonl"))]
    train_iters = [r["iter"] for r in records if r.get("mode") == "train"]
    assert len(train_iters) == len(set(train_iters)) > 0, train_iters

    # eval aggregates must match the single-process reference run (same
    # GSPMD layout over 2 virtual devices) to float tolerance
    for k in res[0]["best"]:
        if k == "iter":
            continue
        np.testing.assert_allclose(res[0]["best"][k], single["best"][k],
                                   rtol=2e-4, atol=1e-5, err_msg=k)

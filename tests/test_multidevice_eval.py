"""Multi-device eval: batches sharded over the data mesh give identical
metrics to the single-device path (VERDICT r3 #9 — full-split eval should
use every chip)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gedepth_tpu.configs import get_config
from gedepth_tpu.train.loop import build_datasets
from gedepth_tpu.eval import Evaluator
from gedepth_tpu.parallel import create_mesh

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)


@pytest.fixture(scope="module")
def smoke_setup():
    cfg = get_config("smoke_synthetic")
    model = cfg.model.build()
    _, test_ds = build_datasets(cfg)
    h, w = cfg.data.eval_size
    img0 = jnp.zeros((1, h, w, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0,
                          jnp.ones((1,), jnp.float32))
    return cfg, model, test_ds, variables


def test_sharded_eval_matches_single_device(smoke_setup):
    cfg, model, test_ds, variables = smoke_setup
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    ev1 = Evaluator(model, test_ds, cfg.data, batch_size=1,
                    process_index=0, process_count=1)
    agg1, rows1 = ev1.run(params, stats)

    mesh = create_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.devices.size == 8
    ev8 = Evaluator(model, test_ds, cfg.data, batch_size=8, data_mesh=mesh,
                    process_index=0, process_count=1)
    agg8, rows8 = ev8.run(params, stats)

    assert len(rows1) == len(rows8) == len(test_ds)
    for k in agg1:
        np.testing.assert_allclose(agg8[k], agg1[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)


def test_eval_loader_process_shards_partition_dataset(smoke_setup):
    """The strided process shards cover each dataset index exactly once."""
    from gedepth_tpu.data import EvalLoader
    from gedepth_tpu.eval.evaluator import build_test_pipeline

    cfg, _, test_ds, _ = smoke_setup
    pipe = build_test_pipeline(cfg.data)
    seen = []
    for p in range(3):
        loader = EvalLoader(test_ds, pipe, batch_size=2,
                            shard_index=p, shard_count=3, prefetch=0)
        for batch, valid in loader:
            seen.extend(int(i) for i, v in zip(batch["index"], valid) if v)
    assert sorted(seen) == list(range(len(test_ds)))

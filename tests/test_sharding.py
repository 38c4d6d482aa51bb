"""Multi-device sharding tests, run in a subprocess with a virtual 8-device
CPU mesh (the flag slows all compiles, so it stays out of the main process)."""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"  # plus config override below
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from recbole_cdr_tpu.parallel import make_mesh, make_sharded_train_step, shard_params

assert len(jax.devices()) == 8, jax.devices()

# toy CMF-like model over a 512-row table (above MIN_SHARD_ROWS)
N_USERS, N_ITEMS, D, B = 512, 384, 16, 64
rng = np.random.default_rng(0)
params = {
    "user_embedding": jnp.asarray(rng.normal(size=(N_USERS, D)), jnp.float32),
    "item_embedding": jnp.asarray(rng.normal(size=(N_ITEMS, D)), jnp.float32),
}
batch = {
    "uid": jnp.asarray(rng.integers(0, N_USERS, B)),
    "iid": jnp.asarray(rng.integers(0, N_ITEMS, B)),
    "label": jnp.asarray((rng.random(B) > 0.5).astype(np.float32)),
}

def loss_fn(p, b, rng=None):
    logits = jnp.sum(p["user_embedding"][b["uid"]] * p["item_embedding"][b["iid"]], axis=-1)
    per = jnp.maximum(logits, 0) - logits * b["label"] + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return per.mean()

tx = optax.adam(1e-2)

# single-device result
opt_state = tx.init(params)
loss, grads = jax.value_and_grad(lambda p: loss_fn(p, batch))(params)
updates, _ = tx.update(grads, opt_state, params)
ref_params = optax.apply_updates(params, updates)

# sharded result: dp=4 x tp=2
mesh = make_mesh({"data": 4, "model": 2})
with mesh:
    step, sharded_params, sharded_opt = make_sharded_train_step(loss_fn, tx, mesh, params)
    new_params, _, sharded_loss = step(sharded_params, sharded_opt, {k: np.asarray(v) for k, v in batch.items()}, None)

np.testing.assert_allclose(float(sharded_loss), float(loss), rtol=1e-5)
for k in ref_params:
    np.testing.assert_allclose(np.asarray(new_params[k]), np.asarray(ref_params[k]), rtol=1e-4, atol=1e-5)

# verify the tables actually got sharded over the model axis
sh = new_params["user_embedding"].sharding
assert "model" in str(sh.spec), sh
print("SHARDING_EQUIVALENCE_OK")
"""


def test_sharded_step_matches_single_device():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "SHARDING_EQUIVALENCE_OK" in result.stdout, result.stdout + result.stderr


_E2E_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

from recbole_cdr_tpu.quick_start import objective_function

# device-resident epoch loop under the mesh (the production SPMD hot path)
r = objective_function(config_dict={
    "model": "CMF", "state": "ERROR", "show_progress": False,
    "train_batch_size": 512, "eval_batch_size": 2048,
    "train_epochs": ["BOTH:1"],
    "mesh_shape": {"data": 4, "model": 2},
}, saved=False)
assert 0.0 <= r["test_result"]["recall@10"] <= 1.0

# host batching path under the same mesh (device_side_sampling off)
r2 = objective_function(config_dict={
    "model": "CMF", "state": "ERROR", "show_progress": False,
    "train_batch_size": 512, "eval_batch_size": 2048,
    "train_epochs": ["BOTH:1"], "steps_per_call": 4,
    "device_side_sampling": False,
    "mesh_shape": {"data": 4, "model": 2},
}, saved=False)
assert 0.0 <= r2["test_result"]["recall@10"] <= 1.0
print("MESH_E2E_OK", r["test_result"]["recall@10"], r2["test_result"]["recall@10"])
"""


def test_mesh_training_end_to_end():
    """Full pipeline trains under a dp=4 x tp=2 mesh (config mesh_shape),
    through both the device-resident epoch loop and the host batching path."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-c", _E2E_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "MESH_E2E_OK" in result.stdout, result.stdout + result.stderr


_DEVICE_LOOP_EQUIV_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.data.utils import data_preparation
from recbole_cdr_tpu.parallel import make_mesh
from recbole_cdr_tpu.parallel.mesh import pad_tables_for_sharding, shard_params
from recbole_cdr_tpu.trainer.device_loop import DeviceEpochLoop
from recbole_cdr_tpu.trainer.trainer import build_optimizer
from recbole_cdr_tpu.utils import get_model, init_seed
from recbole_cdr_tpu.utils.enums import TrainMode

config = CDRConfig(model="CMF", config_dict={
    "state": "ERROR", "show_progress": False,
    "train_batch_size": 256, "eval_batch_size": 1024,
    "train_epochs": ["BOTH:1"],
}, _cli_args=[])
init_seed(config["seed"], True)
dataset = CrossDomainDataset(config)
train_data, _, _ = data_preparation(config, dataset)
model = get_model("CMF")(config, dataset)
params = model.init_params(jax.random.PRNGKey(0))
loss_fn = model.loss_fn("BOTH")
tx = build_optimizer(config, lambda n: True)

def run(mesh):
    # fresh copy per run: the epoch program donates its params buffers
    p = jax.tree_util.tree_map(jnp.array, params)
    if mesh is not None:
        p = shard_params(pad_tables_for_sharding(p, mesh), mesh)
    loop = DeviceEpochLoop(
        TrainMode.BOTH, loss_fn, tx, train_data, config["MODEL_INPUT_TYPE"],
        neg_num=1, num_users=model.total_num_users,
        base_rng=jax.random.PRNGKey(1), mesh=mesh,
    )
    new_p, _, loss = loop.run_epoch(p, tx.init(p), 0)
    return {k: np.asarray(v) for k, v in new_p.items()}, float(loss)

ref_p, ref_loss = run(None)
mesh = make_mesh({"data": 4, "model": 2})
sh_p, sh_loss = run(mesh)

np.testing.assert_allclose(sh_loss, ref_loss, rtol=1e-4)
for k in ref_p:
    np.testing.assert_allclose(
        sh_p[k][: ref_p[k].shape[0]], ref_p[k], rtol=1e-3, atol=1e-5
    )
print("DEVICE_LOOP_MESH_EQUIV_OK", ref_loss, sh_loss)
"""


def test_device_loop_mesh_matches_single_device():
    """The device-resident epoch loop produces the same epoch (same RNG stream,
    same params after one epoch) on a dp=4 x tp=2 mesh as on one device."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-c", _DEVICE_LOOP_EQUIV_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "DEVICE_LOOP_MESH_EQUIV_OK" in result.stdout, result.stdout + result.stderr


_SHARDED_TOPK_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from recbole_cdr_tpu.ops.topk import (
    make_sharded_streaming_topk, streaming_topk_with_history,
)
from recbole_cdr_tpu.parallel import make_mesh

rng = np.random.default_rng(0)
B, D, I, K, H = 37, 16, 10007, 10, 23  # awkward sizes: uneven shards + pads
user_e = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
table = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
hist = np.sort(
    np.where(rng.random((B, H)) < 0.7, rng.integers(1, I, (B, H)), I), axis=1
)
hist = jnp.asarray(hist)

ref_s, ref_i = streaming_topk_with_history(user_e, table, hist, K)

for shape in ({"data": 4, "model": 2}, {"data": 2, "model": 4}, {"data": 1, "model": 8}):
    mesh = make_mesh(shape)
    fn = make_sharded_streaming_topk(mesh, K)
    s, i = fn(user_e, table, hist)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
print("SHARDED_TOPK_EQUIV_OK")
"""


def test_sharded_streaming_topk_matches_dense():
    """Item-axis-over-'model' + user-batch-over-'data' streaming top-k equals
    the single-device streaming path exactly, across mesh layouts."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-c", _SHARDED_TOPK_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "SHARDED_TOPK_EQUIV_OK" in result.stdout, result.stdout + result.stderr


_SHARDED_EVAL_E2E_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

from recbole_cdr_tpu.quick_start import objective_function

base = {
    "model": "CMF", "state": "ERROR", "show_progress": False,
    "train_batch_size": 512, "eval_batch_size": 2048,
    "train_epochs": ["BOTH:1"],
    "streaming_topk_threshold": 1,  # force the streaming eval path
}
r_single = objective_function(config_dict=base, saved=False)
r_mesh = objective_function(
    config_dict={**base, "mesh_shape": {"data": 2, "model": 4}}, saved=False
)
for k, v in r_single["test_result"].items():
    dv = r_mesh["test_result"][k]
    assert abs(v - dv) < 0.02, (k, v, dv)
print("SHARDED_EVAL_E2E_OK", r_single["test_result"]["recall@10"],
      r_mesh["test_result"]["recall@10"])
"""


def test_sharded_eval_end_to_end():
    """Full pipeline with the mesh-sharded streaming evaluator produces the
    same metrics as the single-device streaming path."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-c", _SHARDED_EVAL_E2E_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "SHARDED_EVAL_E2E_OK" in result.stdout, result.stdout + result.stderr

"""Worker process for tests/test_distributed.py (not a test module).

Runs as one of N processes of a multi-process JAX job on localhost CPU:
``python distributed_worker.py <process_id> <num_processes> <port>``.
Exercises ``parallel.init_distributed`` + both scale-out axes across the
process boundary (SURVEY.md §5.8; VERDICT r1 #7):

  * dp  — instances sharded over the 2-D (batch=processes, block=local)
          mesh, exactly the DCN x ICI layout ``make_mesh`` documents;
  * block — ONE problem's residual blocks psum-reduced ACROSS processes
          through ``sharded_optimize`` (the collective rides the
          inter-process Gloo backend here; ICI on a real pod).

Prints ``DIST_OK`` as the last line on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinyopt_tpu.parallel import (init_distributed, local_mesh,  # noqa: E402
                                  make_mesh, sharded_optimize)

init_distributed(coordinator_address=f"localhost:{port}",
                 num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

import tinyopt_tpu as to  # noqa: E402
from tinyopt_tpu.models.problems import (make_prior_batch,  # noqa: E402
                                         prior_residual)
from tinyopt_tpu.parallel.batched import batched_solver  # noqa: E402

assert jax.device_count() == 2 * nproc, jax.device_count()
assert jax.local_device_count() == 2

# ---- dp axis over the DCN x ICI mesh ----------------------------------
mesh = make_mesh(batch=nproc, block=2)
B = 8 * nproc
data, x0 = make_prior_batch(B, 6, dtype=jnp.float32, seed=1)
sh = NamedSharding(mesh, P(("batch", "block")))
as_global = lambda a: jax.make_array_from_callback(
    a.shape, sh, lambda idx, _a=np.asarray(a): _a[idx])
x0g = as_global(x0)
datag = jax.tree_util.tree_map(as_global, data)
opts = to.Options(max_iters=10, hessian=to.HessianOptions(save_last=False))
x_ex = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[0], x0)
d_ex = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[0], data)
solve = jax.jit(batched_solver(prior_residual, opts, "residuals",
                               x_ex, d_ex))
xg, out = solve(x0g, datag)
from jax.experimental import multihost_utils  # noqa: E402

x_full = multihost_utils.process_allgather(xg, tiled=True)
conv = multihost_utils.process_allgather(out.converged(), tiled=True)
assert float(np.max(np.abs(x_full - np.asarray(data.y)))) < 1e-4
assert np.all(conv)
print(f"[p{pid}] dp over {nproc} processes OK", flush=True)

# ---- block axis: psum across the process boundary ---------------------
flat = local_mesh("block")                       # 2*nproc devices
pdata, px0 = make_prior_batch(8 * nproc, 8, dtype=jnp.float32, seed=2)
x2, out2 = sharded_optimize(px0[0], prior_residual, pdata,
                            to.Options(max_iters=10), mesh=flat,
                            axis="block")
x2h = np.asarray(x2.addressable_data(0))
c2 = float(np.asarray(out2.final_cost.cost.addressable_data(0)))
# local dense reference (data is host-replicated on every process)
ref_fn = lambda x: ((x[None, :] - jnp.asarray(pdata.y))
                    * jnp.asarray(pdata.inv_std)).reshape(-1)
x_ref, out_ref = to.optimize(px0[0], ref_fn, to.Options(max_iters=10))
assert float(np.max(np.abs(x2h - np.asarray(x_ref)))) < 5e-4, (x2h, x_ref)
assert abs(c2 - float(out_ref.final_cost.cost)) <= 1e-3 * max(1.0, c2)
print(f"[p{pid}] block psum across processes OK (cost {c2:.4e})",
      flush=True)

# ---- schur_obs axis: sparse-obs BA sharded ACROSS processes -----------
# (multi-process global cam_idx is not fully addressable, so this also
# pins the planned-reduce SCATTER FALLBACK in a real multi-process job)
from tinyopt_tpu.parallel import sharded_schur_sparse_optimize  # noqa: E402
from tinyopt_tpu.ops.schur_obs import grid_to_obs  # noqa: E402

rng = np.random.default_rng(3)
n_a, n_b = 4, 8 * nproc


def pair_fn(a_i, b_j, d_ij):
    return jnp.stack([a_i[0] + b_j[0] - d_ij,
                      0.3 * a_i[0], 0.3 * b_j[0]])


d_grid = jnp.asarray(rng.normal(size=(n_a, n_b)), jnp.float32)
maskg = jnp.asarray((rng.uniform(size=(n_a, n_b)) > 0.3)
                    .astype(np.float32))
obs3, cam3, smask3 = grid_to_obs(d_grid, maskg)
sh_b = NamedSharding(flat, P("block"))
as_global_b = lambda a: jax.make_array_from_callback(
    a.shape, sh_b, lambda idx, _a=np.asarray(a): _a[idx])
obs3g = jax.tree_util.tree_map(as_global_b, obs3)
cam3g = as_global_b(np.asarray(cam3))
smask3g = as_global_b(np.asarray(smask3, np.float32))
x0s = (jnp.zeros((n_a, 1), jnp.float32),
       jnp.zeros((n_b, 1), jnp.float32))
x3, out3 = sharded_schur_sparse_optimize(
    x0s, pair_fn, obs3g, cam3g, smask3g,
    to.Options(max_iters=10, max_consec_failures=0).for_dtype(
        jnp.float32), mesh=flat, axis="block")
c3 = float(np.asarray(out3.final_cost.cost.addressable_data(0)))
# single-process reference on the same instance
x3r, out3r = to.schur_sparse_optimize(
    x0s, pair_fn, obs3, cam3, smask3,
    to.Options(max_iters=10, max_consec_failures=0).for_dtype(
        jnp.float32))
assert abs(c3 - float(out3r.final_cost.cost)) <= 1e-3 * max(1.0, c3), (
    c3, float(out3r.final_cost.cost))
print(f"[p{pid}] schur_obs across processes OK (cost {c3:.4e})",
      flush=True)
print("DIST_OK", flush=True)

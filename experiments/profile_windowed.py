"""Piecewise timing of the windowed hybrid on the real proxy graph:
dense-only vs residue-only vs full call, to find where time goes."""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR
from flex_tpu.ops.window_spmm import prepare_windowed
from flex_tpu.ops.ell_spmm import EllPlan
from flex_tpu.bench.harness import _time_device
from flex_tpu.io import make_features

d = np.load(sys.argv[1] if len(sys.argv) > 1 else
            "/tmp/reddit_posts_rbdeg.npz")
g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"], name="rp")
k = 128
mc = int(sys.argv[2]) if len(sys.argv) > 2 else 128

dev = DeviceCSR.from_graph(g)
t0 = time.time()
plan = prepare_windowed(g, dev=dev, tm=256, W=128, min_count=mc)
print(f"prepare: {time.time()-t0:.1f}s stats={plan.stats}", flush=True)
B = jnp.asarray(make_features(g, k))

empty_ell = EllPlan(m=g.m, buckets=(), chunk_row=jnp.zeros((0,), jnp.int32),
                    padded_nnz=0, nnz=0)
dense_only = dataclasses.replace(plan, ell=empty_ell)

t_full = _time_device(plan, B, iters=10)
t_dense = _time_device(dense_only, B, iters=10)
t_res = _time_device(plan.ell, B, iters=10)
S = plan.stats["n_steps"]
print(f"mc={mc} cov={plan.coverage:.3f} S={S} res_nnz={plan.ell.nnz} "
      f"res_pad={plan.ell.padded_nnz}", flush=True)
print(f"full={t_full*1e3:.1f}ms dense={t_dense*1e3:.1f}ms "
      f"({t_dense/S*1e6:.2f}us/step) res={t_res*1e3:.1f}ms "
      f"sum={1e3*(t_dense+t_res):.1f}ms "
      f"-> {2*g.nnz*k/t_full/1e9:.1f} GF/s", flush=True)

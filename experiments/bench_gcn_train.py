"""Reddit-scale GCN training throughput on the windowed plan vs ELL.

2-layer GCN (d=128 -> 128 -> 41 classes like real Reddit), full-graph
steps on the reddit_posts proxy; forward SpMM is the windowed Pallas
kernel (custom VJP) or ELL.
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from flex_tpu.utils import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp

_T0 = time.time()


def log(msg):
    print(f"[{time.time()-_T0:6.0f}s] {msg}", flush=True)
import optax

from flex_tpu.bench.harness import _time_device
from flex_tpu.io import make_features
from flex_tpu.models import GCN, make_train_step
from flex_tpu.ops.ell_spmm import prepare_ell
from flex_tpu.ops.window_spmm import prepare_windowed
from flex_tpu.sparse.csr import CSRGraph
from flex_tpu.sparse.device import DeviceCSR

d = np.load("/tmp/reddit_posts_rbdeg_v3.npz")
g = CSRGraph.from_arrays(d["row_ptr"], d["col"], d["vals"],
                         name="reddit_posts", order="RBD")
log(f"graph ready: {g}; uploading CSR...")
dev = DeviceCSR.from_graph(g)
np.asarray(dev.vals[:1])  # sync the upload
log("CSR uploaded")
rng = np.random.default_rng(0)
model = GCN(d_in=128, d_hidden=128, n_classes=41, nnz=g.nnz)
X = jnp.asarray(make_features(g, 128))
y = jnp.asarray(rng.integers(0, 41, g.m).astype(np.int32))
mask = jnp.ones((g.m,), jnp.float32)
opt = optax.adam(1e-2)

from flex_tpu.ops.window_spmm import with_training_bwd

# On-chip gradient parity for the transposed-residue backward (CLAUDE.md:
# any kernel-path change needs on-chip validation — CPU tests can't see
# TPU-lowering bugs): grad wrt B of sum(plan(B)*co) through both paths.
base = prepare_windowed(g, dev=dev, tm=256, W=128, min_count=64)
tb = with_training_bwd(base)
co = jnp.asarray(rng.random((g.m, 128)).astype(np.float32))


@jax.jit
def _gb(p, b, c):  # c as an ARGUMENT: closing over the 119 MB cotangent
    return jax.grad(lambda bb: (p(bb) * c).sum())(b)  # would bake it in


log("compiling grad executables for the parity check...")
g1 = np.asarray(_gb(base, X, co))
log("base grad done")
g2 = np.asarray(_gb(tb, X, co))
log("tbwd grad done")
den = np.maximum(np.abs(g1), 1e-3)
log("parity computed")
print(f"grad parity windowed vs +tbwd: max_rel="
      f"{(np.abs(g1 - g2) / den).max():.2e}", flush=True)
del base, tb, g1, g2

for name, prep in (("windowed", lambda: prepare_windowed(
                        g, dev=dev, tm=256, W=128, min_count=64)),
                   ("windowed+tbwd", lambda: with_training_bwd(
                        prepare_windowed(g, dev=dev, tm=256, W=128,
                                         min_count=64))),
                   ("ell", lambda: prepare_ell(g, dev=dev))):
    log(f"preparing {name}...")
    plan = prep()
    params = model.init(jax.random.PRNGKey(0))
    state = opt.init(params)
    step = make_train_step(model, plan, opt)

    def one(params, state):
        p2, s2, loss = step(params, state, X, y, mask)
        return loss

    t = _time_device(one, params, state, iters=5, warmup=2)
    # SpMM work per step: 2 layers x (fwd + grad wrt features) = 4 SpMMs
    print(f"{name}: {t*1e3:.1f} ms/step "
          f"({4*2*g.nnz*128/t/1e9:.0f} GF/s SpMM-equiv)", flush=True)
    del plan, step

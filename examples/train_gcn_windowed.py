"""Train a GCN on a community graph through the windowed MXU kernel.

Exercises the headline path end-to-end: community generator → rbdeg
clustering ordering → windowed-hybrid format (dense MXU windows + ELL
residue) → GCN training via the kernel's custom VJP.  Measured at reddit
scale: 509 ms/step vs 1198 ms/step on the ELL plan (docs/measurements.md).

Run: python examples/train_gcn_windowed.py [steps] [m] [nnz]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(steps: int = 20, m: int = 20_000, nnz: int = 2_000_000) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
    from flex_tpu.io import make_features
    from flex_tpu.io.synth import community_graph
    from flex_tpu.models import GCN, gcn_loss, make_train_step
    from flex_tpu.ops.window_spmm import prepare_windowed
    from flex_tpu.reorder import reorder

    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.time()
    g = reorder(community_graph(m, nnz, n_comm=8, seed=0), "rbdeg",
                check=False)
    plan = prepare_windowed(g, tm=256, W=128, min_count=64)
    print(f"graph {g.m}x{g.m} nnz={g.nnz}; windowed coverage="
          f"{plan.coverage:.2f} ({time.time()-t0:.0f}s)", flush=True)

    n_classes = 8
    model = GCN(d_in=64, d_hidden=64, n_classes=n_classes, nnz=g.nnz)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    X = jnp.asarray(make_features(g, 64))
    y = jnp.asarray(rng.integers(0, n_classes, g.m).astype(np.int32))
    mask = jnp.asarray((rng.random(g.m) < 0.3).astype(np.float32))

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = make_train_step(model, plan, opt)
    print(f"initial loss {float(gcn_loss(model, params, plan, X, y, mask)):.4f}",
          flush=True)
    t0 = time.time()
    for i in range(steps):
        params, state, loss = step(params, state, X, y, mask)
        if (i + 1) % 5 == 0:
            print(f"step {i+1:4d}  loss {float(loss):.4f}  "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)

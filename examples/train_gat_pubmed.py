"""End-to-end demo: train a 2-layer multi-head GAT on pubmed.

Exercises the attention path: load → self-loops → dynamic-value SpMM plan
(ops/dyn_ell) → per-head edge scores + segment softmax → optax training.

Run: python examples/train_gat_pubmed.py [steps]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(steps: int = 30) -> None:
    import jax
    import jax.numpy as jnp
    import optax
    import scipy.sparse as sp

    jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
    from flex_tpu.io import load_csv, make_features
    from flex_tpu.models import GAT, gat_loss, make_gat_train_step
    from flex_tpu.models.gat import prepare_attention
    from flex_tpu.sparse.csr import CSRGraph

    print(f"devices: {jax.devices()}", flush=True)
    g0 = load_csv("/root/reference/data/pubmed.csv")
    # GAT attends over N(i) ∪ {i}
    A = (g0.to_scipy() + sp.eye(g0.m, format="csr")).tocsr()
    A.sort_indices()
    g = CSRGraph.from_arrays(A.indptr.astype(np.int64),
                             A.indices.astype(np.int64),
                             A.data.astype(np.float32), name="pubmed+sl")
    ag = prepare_attention(g)

    d_in, d_hidden, c = 128, 16, g0.label_width
    model = GAT(d_in=d_in, d_hidden=d_hidden, n_classes=c, n_heads=4)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    X = jnp.asarray(make_features(g, d_in))
    y = jnp.asarray(rng.integers(0, c, g.m).astype(np.int32))
    mask = jnp.asarray((rng.random(g.m) < 0.1).astype(np.float32))

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = make_gat_train_step(model, ag, opt)

    t0 = time.time()
    loss0 = float(gat_loss(model, params, ag, X, y, mask))
    loss = loss0
    for i in range(steps):
        params, state, loss = step(params, state, X, y, mask)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:4d} loss {float(loss):.4f} "
                  f"({time.time()-t0:.1f}s)", flush=True)
    print(f"loss {loss0:.4f} -> {float(loss):.4f} "
          f"({'improved' if float(loss) < loss0 else 'NO IMPROVEMENT'})",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)

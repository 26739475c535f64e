"""End-to-end demo: train a 2-layer GCN on pubmed on the TPU.

Exercises the full framework path: load → reorder → device format build →
fused GCN layers → optax training with checkpoint/resume → autotuned SpMM.

Run: python examples/train_gcn_pubmed.py [steps]
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/flex_tpu_jax_cache")
    from flex_tpu.bench.autotune import suggest
    from flex_tpu.bench.harness import _resolve_prepare
    from flex_tpu.io import load_csv, make_features
    from flex_tpu.models import GCN, gcn_loss, make_train_step
    from flex_tpu.models.checkpoint import restore_checkpoint, save_checkpoint
    from flex_tpu.reorder import reorder

    print(f"devices: {jax.devices()}", flush=True)
    g = reorder(load_csv("/root/reference/data/pubmed.csv"), "deg", check=False)
    sug = suggest(g, 128)
    print(f"autotuner: {sug.method} ({sug.reason})", flush=True)
    plan = _resolve_prepare(sug.method)(g, **sug.prep_kwargs)

    d_in, d_hidden, c = 128, 64, g.label_width
    model = GCN(d_in=d_in, d_hidden=d_hidden, n_classes=c, nnz=g.nnz)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    X = jnp.asarray(make_features(g, d_in))
    y = jnp.asarray(rng.integers(0, c, g.m).astype(np.int32))
    mask = jnp.asarray((rng.random(g.m) < 0.3).astype(np.float32))

    opt = optax.adam(5e-3)
    state = opt.init(params)
    step = make_train_step(model, plan, opt)

    t0 = time.time()
    loss0 = float(gcn_loss(model, params, plan, X, y, mask))
    for i in range(steps):
        params, state, loss = step(params, state, X, y, mask)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:4d} loss {float(loss):.4f} "
                  f"({time.time()-t0:.1f}s)", flush=True)

    save_checkpoint("/tmp/flex_tpu_gcn_ck", params, step=steps)
    got = restore_checkpoint("/tmp/flex_tpu_gcn_ck")
    print(f"checkpoint round-trip: step={got['step']}", flush=True)
    print(f"loss {loss0:.4f} -> {float(loss):.4f} "
          f"({'improved' if float(loss) < loss0 else 'NO IMPROVEMENT'})",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)

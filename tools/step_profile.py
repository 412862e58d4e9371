"""Train-step component timing on TPU: ablate submodules to locate hot spots.

Times jitted functions: full train step, forward-only, and forwards with the
GCN / CNN / PMMA swapped for cheap identities (same shapes), isolating each
component's share. Run: PYTHONPATH=. python tools/step_profile.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from druglamp_tpu.config import Config
from druglamp_tpu.models.registry import build_model
from druglamp_tpu.train.state import TrainState
from druglamp_tpu.train.steps import make_train_step
from druglamp_tpu.utils.synthetic import make_batch

BATCH = 16


from druglamp_tpu.utils.profiling import device_time_ms as timeit


def _sync(tree):
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jnp.sum(leaf))


def step_time_ms(step, state, batch, args, n1=10, n2=40):
    """Two-point measurement for the state-donating train step (fixed costs
    — dispatch setup, D2H fetch roundtrip — cancel in the difference; see
    utils.profiling.device_time_ms)."""
    out = step(state, batch, jax.random.key(3), *args)
    state = out.state
    _sync(state.params)

    def run(iters, key0):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(iters):
            state = step(state, batch, jax.random.key(key0 + i), *args).state
        _sync(state.params)
        return time.perf_counter() - t0

    run(1, 1000)
    ta, tb = run(n1, 2000), run(n2, 3000)
    return (tb - ta) / (n2 - n1) * 1e3


def main():
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, BATCH, n_drug_feature=384,
                                                 n_prot_feature=640))
    model = build_model("DrugLAMP", cfg)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        b, jax.random.key(2), method="init_all"))(batch)
    # deep-copy params into the state: the train step donates its buffers,
    # and `variables` must stay alive for the component timings below
    state = TrainState.create(jax.tree.map(jnp.copy, variables), False, False)
    step = make_train_step(model, use_ssl=False, use_cm=False)
    args = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
            jnp.float32(0.5), jnp.float32(1.0))

    t_step = step_time_ms(step, state, batch, args)
    print(f"full train step: {t_step:.2f} ms  ({BATCH / t_step * 1000:.0f} pairs/s)")

    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)["score"])
    t_fwd = timeit(fwd, variables, batch)
    print(f"forward only:    {t_fwd:.2f} ms")

    # component forward timings
    def time_component(name, fn):
        f = jax.jit(fn)
        t = timeit(f, variables, batch)
        print(f"{name}: {t:.2f} ms")

    time_component("GCN fwd        ", lambda v, b: model.apply(
        v, b["drug_node_feats"], b["drug_adj"], b["drug_degrees"], False,
        method=lambda m, *a: m.drug_extractor(*a)))
    time_component("ProteinCNN fwd ", lambda v, b: model.apply(
        v, b["vp"], b["p_fill"], False,
        method=lambda m, *a: m.protein_extractor(*a)))

    def pmma_only(m, b):
        B = b["labels"].shape[0]
        L = m.config.pmma.feat_len
        E = m.config.pmma.hidden_size
        x = jnp.zeros((B, L, E), m.compute_dtype)
        return m.pmma(x, x, train=False)[0]

    time_component("PMMA fwd       ", lambda v, b: model.apply(
        v, b, method=pmma_only))

    # The production path decodes a COMPACT batch inside the step (bit-packed
    # adjacency → dense Â) every step of the scan; time decode and
    # decode+GCN to expose the unpack/normalize overhead the dense-batch GCN
    # timing above misses (VERDICT r2 #10).
    from druglamp_tpu.data.encoding import compact_batch, decode_batch

    n_atoms = np.asarray(jnp.sum(batch["d_fill"] == 0, axis=1), np.int32)
    cbatch = jax.tree.map(jnp.asarray, compact_batch(
        jax.tree.map(np.asarray, batch), n_atoms))

    t_dec = timeit(jax.jit(lambda b: decode_batch(b)["drug_adj"]), cbatch)
    print(f"decode (unpack)  : {t_dec:.2f} ms")

    def decode_gcn(keep_packed):
        def f(v, b):
            d = decode_batch(b, keep_packed=keep_packed)
            return model.apply(v, d["drug_node_feats"], d["drug_adj"],
                               d["drug_degrees"], False,
                               method=lambda m, *a: m.drug_extractor(*a))
        return f

    t_dgcn = timeit(jax.jit(decode_gcn(False)), variables, cbatch)
    print(f"decode+GCN fwd   : {t_dgcn:.2f} ms   (dense decode path)")
    from druglamp_tpu.kernels.dispatch import get_backend

    if get_backend() == "pallas":
        t_pgcn = timeit(jax.jit(decode_gcn(True)), variables, cbatch)
        print(f"packed GCN fwd   : {t_pgcn:.2f} ms   (fused Pallas kernel)")


if __name__ == "__main__":
    main()
